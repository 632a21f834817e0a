import os

import numpy as np

from rbslam_tpu.viz import (
    apply_homography,
    estimate_homography,
    plot_degeneracy,
    plot_dense_map,
    plot_landmark_map,
    plot_trajectories,
)


def test_homography_roundtrip():
    rng = np.random.default_rng(0)
    A_true = np.array([[120.0, -30.0, 900.0], [10.0, 140.0, 300.0]])
    c_true = np.array([0.02, 0.01, 1.0])
    src = rng.uniform(-3, 3, (12, 2))
    X = np.concatenate([src, np.ones((12, 1))], axis=1)
    dst = (X @ A_true.T) / (X @ c_true)[:, None]
    A, c = estimate_homography(src, dst)
    np.testing.assert_allclose(apply_homography(A, c, src), dst, atol=1e-5)


def test_plot_functions_write_pngs(tmp_path):
    rng = np.random.default_rng(1)
    x1t = np.linspace(-2, 2, 20)
    x2t = np.linspace(-2, 2, 25)
    field = rng.normal(size=20 * 25)
    traj = rng.normal(size=(30, 2))
    p1 = plot_dense_map(str(tmp_path / "map.png"), x1t, x2t, field,
                        traj=traj, uncertainty=np.abs(field))
    p2 = plot_trajectories(
        str(tmp_path / "traj.png"), truth=traj,
        estimates=[traj + 0.1], labels=["est"],
    )
    p3 = plot_landmark_map(
        str(tmp_path / "lm.png"), rng.normal(size=(8, 2)),
        rng.normal(size=(8, 2)), traj,
    )
    p4 = plot_degeneracy(
        str(tmp_path / "degen.png"),
        rng.normal(size=(30, 10, 2)),
        rng.normal(size=(4, 30, 2)),
        truth=traj,
    )
    for p in (p1, p2, p3, p4):
        assert os.path.exists(p) and os.path.getsize(p) > 1000


def test_animate_particle_cloud(tmp_path):
    """GIF animation writes frames from a per-step cloud (offline analog
    of the reference's makePlots-in-the-loop videos)."""
    from rbslam_tpu.viz.animation import animate_particle_cloud

    rng = np.random.default_rng(0)
    T, n_p = 6, 30
    xn_hist = rng.normal(size=(T, n_p, 3)).cumsum(axis=0)
    traj = xn_hist.mean(axis=1)
    out = tmp_path / "cloud.gif"
    n = animate_particle_cloud(
        str(out), xn_hist, traj_mean=traj[:, :2], truth=traj[:, :2],
        landmarks_true=rng.normal(size=(4, 2)),
        landmarks_est=rng.normal(size=(4, 2)),
        background=((-3, 3, -3, 3), rng.random((16, 16))),
        fps=5,
    )
    assert n == T
    assert out.exists() and out.stat().st_size > 1000


def test_sparse_visual_video_smoke(tmp_path):
    """--video wiring: the sparse-visual workload writes a PF progress
    GIF (loop-pf.mp4 analog) without blocking the scan."""
    from rbslam_tpu.workloads.sparse_visual import SparseVisualConfig, run

    out = tmp_path / "pf.gif"
    r = run(
        SparseVisualConfig(n_particles_pf=8, run_smoother=False),
        video=str(out),
    )
    assert r["pf"]["video"]["frames"] == r["n_steps"]
    assert out.exists() and out.stat().st_size > 1000
