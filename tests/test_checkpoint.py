"""Checkpoint/resume: interrupted smoother resumes to identical results."""

import jax
import jax.numpy as jnp
import numpy as np

from rbslam_tpu.engines import RBPSConfig, run_rbps
from rbslam_tpu.utils import latest_step, load_checkpoint, save_checkpoint

from test_rbpf import _radio_setup, THETA


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6).reshape(2, 3), "b": {"c": jnp.ones(4)}}
    save_checkpoint(str(tmp_path), 3, tree)
    assert latest_step(str(tmp_path)) == 3
    back = load_checkpoint(str(tmp_path), 3, tree)
    np.testing.assert_array_equal(back["a"], tree["a"])
    np.testing.assert_array_equal(back["b"]["c"], tree["b"]["c"])


def test_smoother_resume_identical(tmp_path):
    data, model, basis, center, k, Q = _radio_setup()
    args = (
        model, data.dx, data.y, data.init_state,
        jnp.zeros(basis.m), jnp.diag(k), Q,
        jnp.array([[THETA[2]]]), 1.0,
    )
    key = jax.random.PRNGKey(9)
    full_cfg = RBPSConfig(n_particles=10, n_sweeps=4)

    # uninterrupted run
    res_full = run_rbps(key, *args, full_cfg)

    # interrupted: 2 sweeps with checkpointing, then resume to 4
    ck = str(tmp_path / "ck")
    run_rbps(key, *args, RBPSConfig(n_particles=10, n_sweeps=2),
             checkpoint_dir=ck)
    assert latest_step(ck) == 2
    res_resumed = run_rbps(key, *args, full_cfg, checkpoint_dir=ck)

    np.testing.assert_allclose(
        np.asarray(res_full.XNK), np.asarray(res_resumed.XNK), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(res_full.XLK), np.asarray(res_resumed.XLK), atol=1e-6
    )


def test_sharded_smoother_resume_identical(tmp_path):
    """Multi-host restart recipe (SURVEY §5 failure detection / elastic
    recovery; VERDICT r4 #10): per-sweep checkpoints of a MESH-sharded
    info-form smoother are plain host npz (device->host gather at save),
    and reload re-shards deterministically through the engine's sharding
    constraints — kill after sweep 2 of 4, resume SHARDED, match the
    uninterrupted sharded run exactly."""
    from rbslam_tpu.engines import run_rbps_information_form
    from rbslam_tpu.parallel import make_mesh

    data, model, basis, center, k, Q = _radio_setup()
    args = (
        model, data.dx, data.y, data.init_state,
        jnp.zeros(basis.m), jnp.diag(k), Q,
        jnp.array([[THETA[2]]]), 1.0,
    )
    key = jax.random.PRNGKey(11)
    mesh = make_mesh(4, 2, devices=jax.devices()[:8])
    full_cfg = RBPSConfig(n_particles=16, n_sweeps=4)

    res_full = run_rbps_information_form(key, *args, full_cfg, mesh=mesh)

    ck = str(tmp_path / "ck_sharded")
    run_rbps_information_form(
        key, *args, RBPSConfig(n_particles=16, n_sweeps=2),
        checkpoint_dir=ck, mesh=mesh,
    )
    assert latest_step(ck) == 2
    res_resumed = run_rbps_information_form(
        key, *args, full_cfg, checkpoint_dir=ck, mesh=mesh,
    )
    np.testing.assert_allclose(
        np.asarray(res_full.XNK), np.asarray(res_resumed.XNK), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(res_full.XLK), np.asarray(res_resumed.XLK), atol=1e-6
    )
