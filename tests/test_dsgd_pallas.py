"""Multi-chip DSGD with the fused Pallas kernel (interpret mode, CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.models.mf import init_mf, rmse
from tpu_mf.ops.pallas_sgd import PallasEpochRunner
from tpu_mf.parallel.dsgd_pallas import ShardedPallasRunner
from tpu_mf.parallel.mesh import make_mesh


def test_sharded_matches_single_device_runner():
    """P=1 sharded fused epoch == the single-chip fused runner."""
    ds = synthetic_ratings(300, 200, 4000, rank=3, seed=0)
    params = init_mf(jax.random.PRNGKey(0), ds.nu, ds.nv, 8, gb=3.0)
    eta, lam = 0.05, 0.01
    mesh = make_mesh(1)

    sharded = ShardedPallasRunner(
        ds, mesh, tile_u=128, tile_v=128, batch=256, seed=3,
        mxu="float32", interpret=True,
    )
    st = sharded.pad(params)
    st = sharded.epoch(st, eta, lam)
    out_sharded = sharded.trim(st)

    # identical plan: partition_pallas(seed) -> prepare_cells(seed*7919)
    single = PallasEpochRunner(
        ds, tile_u=128, tile_v=128, batch=256, seed=3 * 7919,
        mxu="float32", interpret=True,
    )
    tb = single.pad(params)
    tb = single.epoch(tb, eta, lam, 3.0)
    out_single = single.trim(tb)

    np.testing.assert_allclose(
        np.asarray(out_sharded.theta), np.asarray(out_single.theta), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_sharded.phi), np.asarray(out_single.phi), atol=1e-5
    )


def test_sharded_8dev_converges_and_deterministic():
    assert len(jax.devices()) >= 8
    ds = synthetic_ratings(600, 300, 20000, rank=3, noise=0.1, seed=4)
    train, test = ds.split(0.2, seed=5)
    mesh = make_mesh(8)

    def run():
        params = init_mf(
            jax.random.PRNGKey(1), ds.nu, ds.nv, 8, gb=ds.mean_rating()
        )
        r = ShardedPallasRunner(
            train, mesh, tile_u=64, tile_v=32, batch=128, seed=6,
            mxu="float32", interpret=True,
        )
        st = r.pad(params)
        for it in range(1, 17):
            st = r.epoch(st, 0.08 / it**0.3, 0.01)
        return r.trim(st)

    out1 = run()
    out2 = run()
    np.testing.assert_array_equal(np.asarray(out1.theta), np.asarray(out2.theta))
    final = rmse(out1, test)
    assert final < 0.5, f"8-dev fused DSGD failed to converge: {final}"
