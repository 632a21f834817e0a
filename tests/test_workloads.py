"""End-to-end workload smoke gates (tiny configs, CPU)."""

import jax
import numpy as np
import pytest


def test_dense_radio_workload():
    from rbslam_tpu.workloads.dense_radio import DenseRadioConfig, run

    out = run(DenseRadioConfig(
        n_particles=15, n_sweeps=2, m_basis=24, m_sim=128, n_mc=2,
    ))
    assert out["workload"] == "slam-dense-radio"
    rf = np.asarray(out["rmse_filter_all"])
    assert rf.shape == (2, 2) and np.all(np.isfinite(rf))
    assert np.all(rf < 1.0), rf
    assert np.isfinite(out["rmse_smoother_final"])


def test_sparse_visual_workload():
    from rbslam_tpu.workloads.sparse_visual import SparseVisualConfig, run

    out = run(SparseVisualConfig(
        n_particles_pf=15, n_particles_ps=5, n_sweeps=2,
    ))
    assert np.isfinite(out["pf"]["rmse_path"])
    assert out["pf"]["rmse_map"] < 2.0
    assert np.isfinite(out["ps"]["rmse_map"])


def test_dense_mag_workload():
    from rbslam_tpu.workloads.dense_mag import DenseMagConfig, run

    out = run(DenseMagConfig(
        n_particles=8, n_sweeps=1, m_basis=48, m_sim=128, n_laps=1,
        n_per_lap=48,
    ))
    assert np.all(np.isfinite(out["rmse_filter_pos"]))
    assert np.isfinite(out["rmse_ekf_pos"])
    assert np.all(np.isfinite(out["rmse_smoother_pos"]))


def test_mag_localization_workload():
    from rbslam_tpu.workloads.mag_localization import (
        MagLocalizationConfig, run,
    )

    out = run(MagLocalizationConfig(
        n_particles=300, m_basis=128, m_sim=256, n_test_steps=80,
        optimize_hyperparams=False,
    ))
    assert out["data"] == "synthetic"
    # map reaches (near) the noise floor and the PF localizes
    assert out["gp"]["test_rmse"] < 4.0
    assert out["pf"]["final_err"] < 1.5, out["pf"]


def test_mag_localization_real_data_layout(tmp_path):
    """Schema round-trip for the AaltoML magnetic-data path: a tiny .mat
    in the reference layout (x [n,2], y [n,3], s [n] segment ids;
    run_localization.m:43-62) drives the FULL --data pipeline — segment
    split, GP fit with the real-data hyperparameters, and PF
    localization on the held-out segment."""
    import scipy.io as sio

    from rbslam_tpu.workloads.mag_localization import (
        MagLocalizationConfig, run,
    )

    # mapping segments (s in {1, 2, 4}) on a lawnmower, test segment
    # s == 3 on a loop — mimicking the robot dataset's session structure
    xs_lines = []
    for i, xv in enumerate(np.linspace(-2.0, 2.0, 6)):
        ys = np.linspace(-2.0, 2.0, 90)
        if i % 2:
            ys = ys[::-1]
        xs_lines.append(np.stack([np.full_like(ys, xv), ys], -1))
    x_train = np.concatenate(xs_lines)                      # [540, 2]
    th = np.linspace(0, 2 * np.pi, 320)
    x_test = 1.3 * np.stack([np.cos(th), np.sin(th)], -1)   # [320, 2]
    x_all = np.concatenate([x_train, x_test])
    s = np.concatenate([
        np.ones(180), 2 * np.ones(180), 4 * np.ones(180),
        3 * np.ones(320),
    ])
    # smooth synthetic field in the x-y plane (3 components)
    def field(x):
        return np.stack([
            10.0 * np.sin(0.9 * x[:, 0]) + 30.0,
            8.0 * np.cos(0.7 * x[:, 1]),
            6.0 * np.sin(0.5 * (x[:, 0] + x[:, 1])) - 40.0,
        ], -1)

    rng = np.random.default_rng(0)
    y_all = field(x_all) + 0.5 * rng.normal(size=(len(x_all), 3))
    path = tmp_path / "tiny_aaltoml.mat"
    sio.savemat(path, {"x": x_all, "y": y_all, "s": s})

    out = run(MagLocalizationConfig(
        n_particles=64, m_basis=64, data_path=str(path),
        optimize_hyperparams=False,
    ))
    assert out["data"] == "aaltoml-magnetic-data"
    assert np.isfinite(out["gp"]["nll"])
    assert np.isfinite(out["gp"]["test_rmse"])
    assert np.isfinite(out["pf"]["mean_err_after_burnin"])
    assert out["pf"]["ess_min"] > 0


def test_mag_localization_vendored_csv_fixture():
    """The vendored fixture in the AaltoML REPOSITORY layout
    (data/invensense/{i}-{loc,mag,time}.csv, main.m:27-60) drives the
    full --data pipeline end-to-end, including the reference-default
    ML-II hyperparameter optimization (main.m:117)."""
    import os

    from rbslam_tpu.workloads.mag_localization import (
        MagLocalizationConfig, run,
    )

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "rbslam_tpu", "data", "assets", "aaltoml_fixture",
    )
    out = run(MagLocalizationConfig(
        n_particles=64, m_basis=48, data_path=root,
        # fixture drawn at length scale 1.0; start ML-II from the
        # real-data theta and let it adapt (the default pipeline)
        optimize_hyperparams=True,
    ))
    assert out["data"] == "aaltoml-magnetic-data"
    assert np.isfinite(out["gp"]["nll"])
    assert np.isfinite(out["gp"]["test_rmse"])
    assert np.all(np.isfinite(np.asarray(out["gp"]["theta"])))
    assert np.isfinite(out["pf"]["mean_err_after_burnin"])
