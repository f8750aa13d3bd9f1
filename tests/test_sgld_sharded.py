"""Sharded DP-SGLD (fused kernel over a mesh) tests on the CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.models.dpmf import init_dpmf
from tpu_mf.models.mf import rmse
from tpu_mf.ops.pallas_sgld import PallasSgldRunner
from tpu_mf.parallel.mesh import make_mesh
from tpu_mf.parallel.sgld_sharded import ShardedSgldRunner


def test_sharded_sgld_p1_matches_single_runner_temp0():
    """P=1, temp=0: sharded round == single-chip fused runner round."""
    ds = synthetic_ratings(300, 200, 4000, rank=3, seed=0)
    state = init_dpmf(jax.random.PRNGKey(0), ds, 8)
    eta, temp, bound = 1e-5, 0.0, 1.0
    scal = eta * len(ds) * bound * float(state.lambda_r)
    hyper = (eta, temp, bound, scal, float(state.params.gb))
    mesh = make_mesh(1)

    sharded = ShardedSgldRunner(
        ds, mesh, tile_u=128, tile_v=128, batch=256, seed=3,
        mxu="float32", interpret=True,
    )
    st = sharded.pad(state)
    st = sharded.epoch(st, 0, hyper, noise_seed=11)
    out_sharded = sharded.unpack(state, st)

    single = PallasSgldRunner(
        ds, tile_u=128, tile_v=128, batch=256, seed=3 * 7919,
        mxu="float32", interpret=True,
    )
    tb = single.pad(init_dpmf(jax.random.PRNGKey(0), ds, 8))
    tb = single.epoch(tb, 0, hyper, noise_seed=99)  # temp=0: seed irrelevant
    out_single = single.unpack(state, tb)

    np.testing.assert_allclose(
        np.asarray(out_sharded.params.theta),
        np.asarray(out_single.params.theta), atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_sharded.params.phi),
        np.asarray(out_single.params.phi), atol=2e-5,
    )
    # counters agree exactly at P=1 (identical plan and clock)
    np.testing.assert_array_equal(
        np.asarray(out_sharded.gcountu[:-1]),
        np.asarray(out_single.gcountu[:-1]),
    )
    assert int(out_sharded.gcount) == len(ds)


def test_train_dpmf_mesh2_smoke():
    """train_dpmf with --mesh 2 runs end-to-end (regression: epoch_idx was
    passed to ShardedSgldRunner.epoch, which had no such parameter)."""
    from tpu_mf.config import TrainConfig
    from tpu_mf.train.loop import train_dpmf

    ds = synthetic_ratings(200, 150, 3000, rank=3, seed=2)
    train, test = ds.split(0.2, seed=3)
    cfg = TrainConfig(
        alg="dpmf", dim=8, iters=2, eta=5e-6, temp=1e-8, mesh=2,
        batch_size=256, hyperb=2000.0, gb=float(ds.mean_rating()),
    )
    state = train_dpmf(cfg, train, test_ds=test, log=lambda s: None)
    assert np.isfinite(float(rmse(state.params, test)))


def test_sharded_sgld_4dev_converges_with_gibbs():
    assert len(jax.devices()) >= 4
    ds = synthetic_ratings(400, 250, 20000, rank=3, noise=0.1, seed=4)
    train, test = ds.split(0.2, seed=5)
    mesh = make_mesh(4)
    state = init_dpmf(jax.random.PRNGKey(1), train, 8, gb=ds.mean_rating())
    runner = ShardedSgldRunner(
        train, mesh, tile_u=64, tile_v=64, batch=128, seed=7,
        mxu="float32", interpret=True,
    )
    from tpu_mf.ops.gibbs import sample_hyper
    from tpu_mf.ops.sgld import finish_noise
    from tpu_mf.models.mf import calc_mse

    ntrain = len(train)
    eta0, temp, bound = 5e-6, 1e-8, 1.0
    for rnd in range(1, 7):
        eta = eta0 / rnd**0.2
        scal = eta * ntrain * bound * float(state.lambda_r)
        runner.set_lambdas(state)
        tables = runner.pad(state)
        tables = runner.epoch(
            tables, int(state.gcount), (eta, temp, bound, scal, float(state.params.gb)),
            noise_seed=rnd * 100_000,
        )
        state = runner.unpack(state, tables)
        state = finish_noise(
            state, jnp.float32(eta), jnp.float32(temp), jax.random.PRNGKey(rnd)
        )
        mse = calc_mse(state.params, train.u, train.v, train.r)
        state = sample_hyper(
            state, jnp.float32(mse * ntrain), jnp.float32(ntrain),
            jnp.float32(1.0), jnp.float32(2000.0), jax.random.PRNGKey(rnd + 50),
        )
    final = rmse(state.params, test)
    assert np.isfinite(final) and final < 0.8, f"sharded SGLD diverged: {final}"
