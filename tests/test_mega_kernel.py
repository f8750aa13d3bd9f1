"""The mega-resident kernel must reproduce the packed/base fused kernels.

Same plan seed + identical per-column math => identical results (up to fp
reassociation-free equality; we assert tight allclose). Runs in interpret
mode on the CPU mesh like the other kernel tests."""

import jax
import numpy as np
import pytest

from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.models.mf import init_mf, rmse
from tpu_mf.ops.pallas_sgd import PallasEpochRunner
from tpu_mf.ops.pallas_sgd_packed import PackedEpochRunner
from tpu_mf.ops.pallas_sgd_mega import (
    MegaEpochRunner,
    mega_eligible,
    mega_packing_factor,
)


def _params_close(a, b, tol=1e-6):
    np.testing.assert_allclose(a.theta, b.theta, atol=tol, rtol=0)
    np.testing.assert_allclose(a.phi, b.phi, atol=tol, rtol=0)
    np.testing.assert_allclose(a.bu, b.bu, atol=tol, rtol=0)
    np.testing.assert_allclose(a.bv, b.bv, atol=tol, rtol=0)


@pytest.mark.parametrize("dim,mega", [(8, 4), (30, 2)])
def test_mega_matches_packed(dim, mega):
    ds = synthetic_ratings(700, 400, 20000, rank=4, seed=0, zipf=0.7)
    params = init_mf(jax.random.PRNGKey(0), ds.nu, ds.nv, dim,
                     gb=ds.mean_rating())
    pack = mega_packing_factor(dim)
    kw = dict(tile_u=16 * pack, tile_v=16 * pack, batch=64, seed=3,
              mxu="float32", interpret=True, theta_groups=8, phi_groups=8)
    pk = PackedEpochRunner(ds, dim=dim, **kw)
    mg = MegaEpochRunner(ds, dim=dim, mega=mega, **kw)
    tp = pk.pad(params)
    tm = mg.pad(params)
    for it in range(2):
        tp = pk.epoch(tp, 0.05, 0.02, float(params.gb), epoch_idx=it)
        tm = mg.epoch(tm, 0.05, 0.02, float(params.gb), epoch_idx=it)
    _params_close(pk.trim(tp), mg.trim(tm))


def test_mega_pack1_matches_base():
    ds = synthetic_ratings(900, 500, 30000, rank=4, seed=1, zipf=0.7)
    dim = 16  # any dim works at pack=1; small keeps interpret fast
    params = init_mf(jax.random.PRNGKey(1), ds.nu, ds.nv, dim,
                     gb=ds.mean_rating())
    kw = dict(tile_u=64, tile_v=64, batch=64, seed=5, mxu="float32",
              interpret=True, theta_groups=8, phi_groups=8)
    base = PallasEpochRunner(ds, **kw)
    mg = MegaEpochRunner(ds, dim=dim, pack=1, mega=4, **kw)
    tb = base.pad(params)
    tm = mg.pad(params)
    for it in range(2):
        tb = base.epoch(tb, 0.05, 0.02, float(params.gb), epoch_idx=it)
        tm = mg.epoch(tm, 0.05, 0.02, float(params.gb), epoch_idx=it)
    _params_close(base.trim(tb), mg.trim(tm))


def test_mega_deferred_phi_converges():
    """Adaptive groups + deferred apply + nb padding: epochs must converge."""
    ds = synthetic_ratings(600, 300, 15000, rank=3, seed=2, zipf=0.8)
    dim = 8
    params = init_mf(jax.random.PRNGKey(2), ds.nu, ds.nv, dim,
                     gb=ds.mean_rating())
    mg = MegaEpochRunner(
        ds, dim=dim, tile_u=64, tile_v=64, batch=64, seed=7, mxu="float32",
        interpret=True, n_plans=2,
    )
    t = mg.pad(params)
    before = float(rmse(params, ds))
    for it in range(3):
        t = mg.epoch(t, 0.04, 0.01, float(params.gb), epoch_idx=it)
    after = float(rmse(mg.trim(t), ds))
    # ~0.037 progress in 3 epochs at this tiny config (matches the packed
    # kernel on identical data); gate the same way as the slot kernel test.
    assert after < before - 0.03, (before, after)


def test_mega_eligibility():
    p = init_mf(jax.random.PRNGKey(0), 69878, 10677, 64, gb=3.0)
    assert mega_eligible(p)  # ML-10M rank 64: ~36 MB theta, fits
    big = init_mf(jax.random.PRNGKey(0), 480189, 126, 8, gb=3.0)
    assert mega_eligible(big)  # Netflix users at rank 8 packed: ~30 MB
    huge = init_mf(jax.random.PRNGKey(0), 2_000_000, 10, 100, gb=3.0)
    assert not mega_eligible(huge)  # 1 GB theta
    assert mega_packing_factor(127) == 0


def test_mega_scatter_dg_matches():
    """scatter-via-dot_general (no transposed one-hots) must be numerically
    identical to the transposed-one-hot scatter."""
    ds = synthetic_ratings(600, 400, 15000, rank=4, seed=6, zipf=0.7)
    dim = 16
    params = init_mf(jax.random.PRNGKey(3), ds.nu, ds.nv, dim,
                     gb=ds.mean_rating())
    kw = dict(tile_u=64, tile_v=64, batch=64, seed=7, mxu="float32",
              interpret=True, theta_groups=8, phi_groups=8, pack=1, mega=4)
    a = MegaEpochRunner(ds, dim=dim, **kw)
    b = MegaEpochRunner(ds, dim=dim, scatter_dg=True, **kw)
    ta, tb = a.pad(params), b.pad(params)
    for it in range(2):
        ta = a.epoch(ta, 0.05, 0.02, float(params.gb), epoch_idx=it)
        tb = b.epoch(tb, 0.05, 0.02, float(params.gb), epoch_idx=it)
    _params_close(a.trim(ta), b.trim(tb))
