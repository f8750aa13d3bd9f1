"""Dense-cell fused SGD kernel (ops/pallas_sgd_dense.py): replay-exact
parity against a per-cell numpy oracle, duplicate-pair semantics, and
convergence. Runs in interpret mode on the CPU mesh (f32 MXU)."""

import numpy as np
import jax
import pytest

from tpu_mf.data.coo import RatingsCOO, synthetic_ratings
from tpu_mf.models.mf import init_mf, rmse
from tpu_mf.ops.pallas_sgd_dense import (
    DenseEpochRunner,
    dense_eligible,
    prepare_dense,
)


def dense_oracle(params, ds, tile_u, tile_v, k_cells, eta, lam, saturate):
    """Per-cell window replay mirroring the kernel's math in f64-ish numpy:
    visit cells in (user tile, item tile) order; within a cell every
    rating's gradient is computed at the cell-START tables (sum/count
    form), then geometric per-occurrence decay + the accumulated delta
    apply once (theta updated before the NEXT cell; phi per cell)."""
    theta = np.asarray(params.theta, np.float64).copy()
    phi = np.asarray(params.phi, np.float64).copy()
    bu = np.asarray(params.bu, np.float64).copy()
    bv = np.asarray(params.bv, np.float64).copy()
    gb = float(params.gb)
    n_gu = -(-ds.nu // tile_u)
    n_gv = -(-ds.nv // tile_v)
    n_gvp = -(-n_gv // k_cells) * k_cells
    cap = max(1.0, 0.2 / max(eta, 1e-9))
    for i in range(n_gu):
        for c in range(n_gvp):
            sel = (ds.u // tile_u == i) & (ds.v // tile_v == c)
            if not sel.any():
                continue
            uu, vv, rr = ds.u[sel], ds.v[sel], ds.r[sel]
            pred = (
                (theta[uu] * phi[vv]).sum(1) + bu[uu] + bv[vv] + gb
            )
            err = rr - pred
            d_th = np.zeros_like(theta)
            d_bu = np.zeros_like(bu)
            d_ph = np.zeros_like(phi)
            d_bv = np.zeros_like(bv)
            np.add.at(d_th, uu, err[:, None] * phi[vv])
            np.add.at(d_bu, uu, err)
            np.add.at(d_ph, vv, err[:, None] * theta[uu])
            np.add.at(d_bv, vv, err)
            ku = np.bincount(uu, minlength=ds.nu).astype(np.float64)
            kv = np.bincount(vv, minlength=ds.nv).astype(np.float64)
            su = eta * np.ones_like(ku)
            sv = eta * np.ones_like(kv)
            if saturate:
                su *= np.minimum(1.0, cap / np.maximum(ku, 1.0))
                sv *= np.minimum(1.0, cap / np.maximum(kv, 1.0))
            dec_u = (1.0 - eta * lam) ** ku
            dec_v = (1.0 - eta * lam) ** kv
            theta = theta * dec_u[:, None] + d_th * su[:, None]
            bu = bu * dec_u + d_bu * su
            phi = phi * dec_v[:, None] + d_ph * sv[:, None]
            bv = bv * dec_v + d_bv * sv
    return theta, phi, bu, bv


def _mk_runner(ds, **kw):
    return DenseEpochRunner(
        ds, tile_u=kw.pop("tile_u", 16), tile_v=kw.pop("tile_v", 16),
        k_cells=kw.pop("k_cells", 4), mxu="float32", interpret=True, **kw,
    )


@pytest.mark.parametrize("saturate", [False, True])
def test_dense_matches_cell_oracle(saturate):
    ds = synthetic_ratings(60, 40, 1500, rank=3, noise=0.2, seed=0)
    params = init_mf(jax.random.PRNGKey(1), ds.nu, ds.nv, 8, gb=3.0)
    eta, lam = 0.03, 0.01
    r = _mk_runner(ds, saturate=saturate)
    tables = r.pad(params)
    tables = r.epoch(tables, eta, lam, 3.0)
    got = r.trim(tables)
    th, ph, bu, bv = dense_oracle(
        params, ds, 16, 16, 4, eta, lam, saturate)
    np.testing.assert_allclose(np.asarray(got.theta), th[: ds.nu], rtol=0,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.phi), ph[: ds.nv], rtol=0,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.bu), bu[: ds.nu], atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.bv), bv[: ds.nv], atol=2e-5)


def test_dense_duplicate_pairs_sum_exactly():
    """k duplicate (u, v) ratings in one cell = k sequential grads at one
    stale point: S - W*pred. Construct explicit duplicates and check
    against the oracle (which replays them rating-by-rating at the same
    stale point via np.add.at)."""
    u = np.array([0, 0, 0, 1, 2, 2], np.int32)
    v = np.array([1, 1, 1, 2, 0, 0], np.int32)
    r = np.array([4.0, 3.0, 5.0, 2.0, 1.0, 3.5], np.float32)
    ds = RatingsCOO(u=u, v=v, r=r, nu=8, nv=8)
    params = init_mf(jax.random.PRNGKey(0), 8, 8, 4, gb=2.0)
    runner = DenseEpochRunner(ds, tile_u=8, tile_v=8, k_cells=1,
                              mxu="float32", interpret=True, saturate=False)
    tables = runner.pad(params)
    tables = runner.epoch(tables, 0.05, 0.02, 2.0)
    got = runner.trim(tables)
    th, ph, bu, bv = dense_oracle(params, ds, 8, 8, 1, 0.05, 0.02, False)
    np.testing.assert_allclose(np.asarray(got.theta), th[:8], atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.phi), ph[:8], atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.bu), bu[:8], atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.bv), bv[:8], atol=1e-5)


def test_dense_converges():
    ds = synthetic_ratings(120, 90, 8000, rank=3, noise=0.1, seed=2)
    tr, te = ds.split(0.2, seed=3)
    params = init_mf(jax.random.PRNGKey(2), ds.nu, ds.nv, 8,
                     gb=float(tr.mean_rating()))
    r = _mk_runner(tr, tile_u=32, tile_v=32, k_cells=2, saturate=True)
    tables = r.pad(params)
    first = last = None
    for it in range(1, 9):
        tables = r.epoch(tables, 0.05 / it ** 0.5, 0.01,
                         float(params.gb))
        val = float(rmse(r.trim(tables), te))
        first = first or val
        last = val
    assert np.isfinite(last) and last < first and last < 0.6, (first, last)


def test_dense_plan_stats_and_eligibility():
    ds = synthetic_ratings(100, 80, 4000, rank=2, seed=4)
    plan = prepare_dense(ds, 32, 32, 2)
    s, w, st, wt = plan.host_matrices()
    # sums/counts account for every rating exactly
    assert w.sum() == len(ds)
    np.testing.assert_allclose(s.sum(), ds.r.sum(), rtol=1e-6)
    np.testing.assert_array_equal(np.swapaxes(s, 2, 3), st)
    np.testing.assert_array_equal(np.swapaxes(w, 2, 3), wt)
    assert plan.max_ku >= 1 and plan.max_kv >= 1
    # device build agrees with the host matrices
    r = DenseEpochRunner(ds, tile_u=32, tile_v=32, k_cells=2,
                         mxu="float32", interpret=True)
    np.testing.assert_allclose(np.asarray(r.dev[0]), s, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r.dev[3]), wt, atol=1e-6)
    params = init_mf(jax.random.PRNGKey(0), ds.nu, ds.nv, 8, gb=0.0)
    assert dense_eligible(params, ds)
    # a Netflix-scale shape must be refused (34 GB of dense matrices)
    big = RatingsCOO(u=np.zeros(1, np.int32), v=np.zeros(1, np.int32),
                     r=np.ones(1, np.float32), nu=480_189, nv=17_770)
    assert not dense_eligible(params, big)


def test_dense_schedule_engagement():
    """_mf_runner_schedule must end on the dense-cell runner for
    dense-eligible shapes, engaging at the A/B-calibrated window bound
    (epoch 1 at dim >= 16; first eta*max_k <= 1.8 epoch at dim 8), and
    --no-dense must restore the one-hot schedule."""
    from tpu_mf.config import TrainConfig
    from tpu_mf.ops.pallas_sgd_dense import dense_engage_epoch
    from tpu_mf.train.loop import _mf_runner_schedule

    from tpu_mf.ops.pallas_sgd_dense import pick_dense_tiles

    ds = synthetic_ratings(400, 250, 30000, rank=3, seed=8, zipf=1.2)
    tu, tv = pick_dense_tiles(ds.nu, ds.nv)
    plan = prepare_dense(ds, tu, tv)
    maxk = max(plan.max_ku, plan.max_kv)

    # dim 64, eta inside the dim>=16 bound (5.5): dense from epoch 1
    params64 = init_mf(jax.random.PRNGKey(0), ds.nu, ds.nv, 64, gb=3.0)
    cfg64 = TrainConfig(dim=64, iters=6, eta=5.0 / maxk, gam=1.0, seed=0)
    sched = _mf_runner_schedule(cfg64, ds, params64, lambda *_: None)
    assert type(sched[-1][1]).__name__ == "DenseEpochRunner"
    e = dense_engage_epoch(cfg64.eta_at, cfg64.iters, 64,
                           sched[-1][1].plan)
    assert sched[-1][0] == e == 1 and len(sched) == 1

    # dim 8 at the same eta engages later (bound 1.8); pre-dense epochs
    # get a one-hot phase
    params8 = init_mf(jax.random.PRNGKey(0), ds.nu, ds.nv, 8, gb=3.0)
    cfg8 = TrainConfig(dim=8, iters=6, eta=3.0 / maxk, gam=1.0, seed=0)
    sched8 = _mf_runner_schedule(cfg8, ds, params8, lambda *_: None)
    assert type(sched8[-1][1]).__name__ == "DenseEpochRunner"
    assert sched8[-1][0] == 2  # eta_at(2)*maxk = 1.5 <= 1.8 < eta0*maxk
    assert sched8[0][0] == 1
    assert type(sched8[0][1]).__name__ != "DenseEpochRunner"
    eps = [ep for ep, _ in sched8]
    assert eps == sorted(eps) and len(set(eps)) == len(eps)

    # kill switch
    cfg_off = TrainConfig(dim=64, iters=6, eta=2e-2, gam=1.0, seed=0,
                          use_dense=False)
    sched_off = _mf_runner_schedule(cfg_off, ds, params64, lambda *_: None)
    assert all(type(r).__name__ != "DenseEpochRunner" for _, r in sched_off)


def test_dense_wless_matches_oracle():
    """Unique (u, v) pairs + nonzero ratings select the W-less variant
    (counts derived on-chip from S != 0; no W/WT streams) — replay-exact
    against the same cell oracle; duplicate data must keep W streams."""
    rng = np.random.default_rng(7)
    pairs = rng.choice(60 * 40, size=1200, replace=False)
    u = (pairs // 40).astype(np.int32)
    v = (pairs % 40).astype(np.int32)
    r = rng.uniform(0.5, 5.0, size=1200).astype(np.float32)
    ds = RatingsCOO(u=u, v=v, r=r, nu=60, nv=40)
    params = init_mf(jax.random.PRNGKey(3), 60, 40, 8, gb=2.5)
    runner = _mk_runner(ds, saturate=True, wless=True)
    assert runner.plan.wless
    assert runner.dev[1] is None and runner.dev[3] is None
    # default is streamed W (wless measured slower; kernel docstring)
    assert _mk_runner(ds).dev[1] is not None
    tables = runner.pad(params)
    tables = runner.epoch(tables, 0.03, 0.01, 2.5)
    got = runner.trim(tables)
    th, ph, bu, bv = dense_oracle(params, ds, 16, 16, 4, 0.03, 0.01, True)
    np.testing.assert_allclose(np.asarray(got.theta), th[:60], atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.phi), ph[:40], atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.bu), bu[:60], atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.bv), bv[:40], atol=2e-5)

    # duplicates (or zero ratings) force the streamed-W variant
    dup = RatingsCOO(u=np.array([0, 0], np.int32),
                     v=np.array([1, 1], np.int32),
                     r=np.array([3.0, 4.0], np.float32), nu=8, nv=8)
    assert not prepare_dense(dup, 8, 8, 1).wless
    z = RatingsCOO(u=np.array([0, 1], np.int32),
                   v=np.array([1, 2], np.int32),
                   r=np.array([3.0, 0.0], np.float32), nu=8, nv=8)
    assert not prepare_dense(z, 8, 8, 1).wless
