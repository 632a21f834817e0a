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
    ))
    assert out["data"] == "synthetic"
    # map reaches (near) the noise floor and the PF localizes
    assert out["gp"]["test_rmse"] < 4.0
    assert out["pf"]["final_err"] < 1.5, out["pf"]
