"""Sharded AdaptReg (fused kernel over a mesh) tests on the CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.models.admf import init_admf
from tpu_mf.models.mf import rmse
from tpu_mf.ops.pallas_adreg import PallasAdRegRunner
from tpu_mf.parallel.adreg_sharded import ShardedAdRegRunner
from tpu_mf.parallel.mesh import make_mesh


def test_sharded_adreg_p1_matches_single_runner_sgd_part():
    """P=1, eta_reg=0: sharded epoch == single-chip fused runner (one segment)."""
    ds = synthetic_ratings(300, 200, 4000, rank=3, seed=0)
    valid = synthetic_ratings(300, 200, 200, rank=3, seed=1)
    state = init_admf(jax.random.PRNGKey(0), ds.nu, ds.nv, 8, lam=0.02, gb=3.0)
    mesh = make_mesh(1)
    eta = 0.05

    sharded = ShardedAdRegRunner(
        ds, valid, mesh, tile_u=128, tile_v=128, batch=256, seed=3,
        mxu="float32", interpret=True,
    )
    st = sharded.pad(state)
    st = sharded.epoch(st, eta, 0.0, jax.random.PRNGKey(7))
    out_sharded = sharded.trim(st)

    single = PallasAdRegRunner(
        ds, valid, tile_u=128, tile_v=128, batch=256, segments=1,
        seed=3 * 7919, mxu="float32", interpret=True,
    )
    tb = single.pad(state)
    tb = single.epoch(tb, eta, 0.0, jax.random.PRNGKey(7))
    out_single = single.trim(tb)

    np.testing.assert_allclose(
        np.asarray(out_sharded.theta), np.asarray(out_single.theta), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_sharded.phi), np.asarray(out_single.phi), atol=1e-5
    )


def test_sharded_adreg_4dev_lambdas_learn_and_converge():
    assert len(jax.devices()) >= 4
    ds = synthetic_ratings(400, 250, 16000, rank=3, noise=0.1, seed=4)
    train, test = ds.split(0.2, seed=5)
    valid = synthetic_ratings(400, 250, 300, rank=3, seed=6)
    state = init_admf(jax.random.PRNGKey(1), ds.nu, ds.nv, 8, lam=0.03,
                      gb=ds.mean_rating())
    mesh = make_mesh(4)
    runner = ShardedAdRegRunner(
        train, valid, mesh, tile_u=64, tile_v=64, batch=128, seed=7,
        mxu="float32", interpret=True,
    )
    st = runner.pad(state)
    lam0 = np.asarray(runner.lams).copy()
    for it in range(1, 11):
        st = runner.epoch(st, 0.08 / it**0.3, 1e-3, jax.random.PRNGKey(it))
    out = runner.state(st, state)
    assert not np.allclose(np.asarray(runner.lams), lam0)
    assert (np.asarray(runner.lams) >= 0).all()
    final = rmse(out.params, test)
    assert final < 0.55, f"sharded adreg failed to converge: {final}"


def test_train_admf_mesh_dim128_runs():
    """--mesh admf at the reference default dim=128 (BASELINE config #5
    shape): the 256-lane sharded kernel builds and runs under the new
    eligibility guard (round 2 left this path unguarded and untested)."""
    import numpy as np
    from tpu_mf.config import TrainConfig
    from tpu_mf.models.mf import rmse
    from tpu_mf.train.loop import train_admf

    ds = synthetic_ratings(120, 80, 1500, rank=3, seed=11)
    train, rest = ds.split(0.3, seed=12)
    valid, test = rest.split(0.5, seed=13)
    cfg = TrainConfig(
        alg="admf", dim=128, iters=1, eta=0.02, eta_reg=1e-3, mesh=2,
        batch_size=128, gb=float(ds.mean_rating()),
    )
    state = train_admf(cfg, train, valid, test_ds=test, log=lambda s: None)
    assert np.isfinite(float(rmse(state.params, test)))


def test_train_admf_mesh_overlarge_dim_falls_back():
    """dim > MAX_DIM on the mesh path must fall back to XLA, not crash."""
    import numpy as np
    from tpu_mf.config import TrainConfig
    from tpu_mf.models.mf import rmse
    from tpu_mf.train.loop import train_admf

    ds = synthetic_ratings(80, 60, 800, rank=3, seed=14)
    train, rest = ds.split(0.3, seed=15)
    valid, test = rest.split(0.5, seed=16)
    logs = []
    cfg = TrainConfig(
        alg="admf", dim=260, iters=1, eta=0.02, eta_reg=1e-3, mesh=2,
        batch_size=128, gb=float(ds.mean_rating()),
    )
    state = train_admf(cfg, train, valid, test_ds=test, log=logs.append)
    assert any("falling back" in line for line in logs)
    assert np.isfinite(float(rmse(state.params, test)))
