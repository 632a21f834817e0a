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
