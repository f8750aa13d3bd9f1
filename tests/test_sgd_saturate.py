"""SGD window-step saturation contract, per kernel generation.

Round-3 found the gen-1 production configs silently DIVERGING at the default
eta on calibrated zipf marginals (a head row's per-cell ratings land in one
apply window: eta * k >> 2), and per-row saturation — scale a window's
accumulated delta by min(1, cap/k), cap = 0.2/eta — became default-on in
every production SGD runner (train/loop.py). The contract tested here, for
each kernel generation (gen-1 already covered in test_pallas_sgd.py):

  1. NOOP when the cap clears: at an eta where cap >= every window duplicate
     count, saturate=True is bitwise-identical to saturate=False (the scale
     is exactly 1.0 for k <= cap).
  2. BOUNDED on heads: at a warm eta on zipfy marginals (inside the
     algorithm's own envelope — the sequential reference loop converges,
     src/mf.h:94-109 has no window) the unsaturated kernel diverges or ends
     strictly worse, while the saturated kernel stays finite and fits.
  3. The round-3 divergence SHAPE (calibrated Zipf-Mandelbrot marginals,
     eta0=0.02, production chooser+balance+saturate path) converges.
"""

import numpy as np
import jax
import pytest

from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.models.mf import init_mf, rmse
from tpu_mf.ops.pallas_sgd import PallasEpochRunner, pick_cell_geometry
from tpu_mf.ops.pallas_sgd_packed import PackedEpochRunner
from tpu_mf.ops.pallas_sgd_slot import SlotEpochRunner


def _zipf_ds(seed=6, n=30000):
    # pure-zipf marginals concentrate a head row's ratings into few windows
    return synthetic_ratings(300, 120, n, rank=3, noise=0.1, seed=seed,
                             zipf=1.4, zipf_u=1.2)


def _run(runner, params, eta, lam=0.01, epochs=2):
    tables = runner.pad(params)
    for it in range(epochs):
        tables = runner.epoch(tables, eta, lam, float(params.gb),
                              epoch_idx=it)
    return runner.trim(tables)


def _assert_bitwise(a, b):
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))


@pytest.mark.parametrize("kind", ["packed", "slot"])
def test_sgd_saturate_noop_when_cap_clears(kind):
    ds = synthetic_ratings(300, 200, 4000, rank=3, seed=0)
    params = init_mf(jax.random.PRNGKey(0), ds.nu, ds.nv, 8, gb=3.0)
    outs = []
    for saturate in (False, True):
        if kind == "packed":
            r = PackedEpochRunner(ds, tile_u=128, tile_v=128, batch=256,
                                  seed=1, mxu="float32", interpret=True,
                                  dim=8, saturate=saturate)
        else:
            r = SlotEpochRunner(ds, tile_u=64, tile_v=64, sub=16, seed=1,
                                mxu="float32", interpret=True, dim=8,
                                saturate=saturate)
        # eta=1e-3 -> cap = 200 >= any window duplicate count here
        outs.append(_run(r, params, eta=1e-3))
    _assert_bitwise(outs[0], outs[1])


@pytest.mark.parametrize("kind", ["packed", "slot"])
def test_sgd_saturate_bounds_head_rows(kind):
    ds = _zipf_ds()
    finals = {}
    for saturate in (False, True):
        params = init_mf(jax.random.PRNGKey(2), ds.nu, ds.nv, 8,
                         gb=ds.mean_rating())
        if kind == "packed":
            r = PackedEpochRunner(ds, tile_u=128, tile_v=128, batch=1024,
                                  seed=9, mxu="float32", interpret=True,
                                  dim=8, saturate=saturate,
                                  theta_groups=8, phi_groups=8)
        else:
            r = SlotEpochRunner(ds, tile_u=64, tile_v=64, sub=64, seed=9,
                                mxu="float32", interpret=True, dim=8,
                                saturate=saturate,
                                theta_groups=8, phi_groups=8)
        out = _run(r, params, eta=0.1, epochs=3)
        finals[saturate] = float(rmse(out, ds))
    assert np.isfinite(finals[True]) and finals[True] < 1.5, finals
    assert (not np.isfinite(finals[False])) or finals[False] > finals[True], (
        finals
    )


def test_gen1_production_path_converges_at_round3_divergence_shape():
    """Calibrated Zipf-Mandelbrot marginals (the ML-10M stand-in's shape,
    CLAUDE.md calibration) at eta0=0.02 through the production gen-1 stack:
    geometry chooser + balance + saturation. Round 3 found this exact
    combination nan'ing without saturation; the production path must train.
    Scaled down for the 1-core CI host; marginal shape and eta match."""
    ds = synthetic_ratings(2000, 600, 60000, rank=8, noise=0.76,
                           signal=1.25, bias_std=0.38, seed=41,
                           zipf=1.0, zipf_q=8.0, zipf_u=1.0, zipf_uq=40.0)
    params = init_mf(jax.random.PRNGKey(3), ds.nu, ds.nv, 16,
                     gb=ds.mean_rating())
    tu, tv, b = pick_cell_geometry(ds, tile_u=256)
    # cap the batch for interpret-mode runtime; geometry ratios preserved
    runner = PallasEpochRunner(ds, tile_u=tu, tile_v=tv, batch=min(b, 2048),
                               seed=7, mxu="float32", interpret=True,
                               balance=True, saturate=True)
    tables = runner.pad(params)
    start = float(rmse(params, ds))
    for it in range(1, 4):
        tables = runner.epoch(tables, 0.02 / it, 5e-3, float(params.gb),
                              epoch_idx=it)
    final = float(rmse(runner.trim(tables), ds))
    assert np.isfinite(final) and final < start, (start, final)
