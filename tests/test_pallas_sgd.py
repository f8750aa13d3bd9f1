"""Fused Pallas SGD kernel vs. the pure-JAX batched kernel (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.models.mf import MFParams, init_mf, rmse
from tpu_mf.ops.pallas_sgd import PallasEpochRunner, prepare_cells
from tpu_mf.ops.sgd import sgd_batch_update


def reference_epoch_on_plan(params, plan, eta, lam):
    """Run the pure-JAX batched kernel over the exact batches of a CellPlan
    (global indices reconstructed from tile-local ones)."""
    out = params
    for i in range(plan.u.shape[0]):
        # the fused kernel applies the 8 lane-columns as sequential
        # sub-batches; replay at the same granularity
        for k in range(8):
            w = plan.w[i][:, k]
            gu_off = plan.gu[i] * plan.tile_u
            gv_off = plan.gv[i, k] * plan.tile_v
            ul = np.where(w > 0, plan.u[i][:, k], 0)
            vl = np.where(w > 0, plan.v[i][:, k], 0)
            batch = (
                jnp.asarray((ul + gu_off * (w > 0)).astype(np.int32)),
                jnp.asarray((vl + gv_off * (w > 0)).astype(np.int32)),
                jnp.asarray(plan.r[i][:, k]),
                jnp.asarray(w),
            )
            out = sgd_batch_update(out, batch, jnp.float32(eta), jnp.float32(lam))
    return out


def test_cellplan_covers_all_ratings():
    ds = synthetic_ratings(300, 200, 5000, seed=0)
    plan = prepare_cells(ds, tile_u=128, tile_v=128, batch_size=256, seed=1)
    assert int(plan.w.sum()) == len(ds)
    # every batch's cell indices in range; sentinel only where w == 0
    assert (plan.u[plan.w > 0] < plan.tile_u).all()
    assert (plan.u[plan.w == 0] == plan.tile_u).all()
    # batches sorted by gu for consecutive theta-tile revisits
    assert (np.diff(plan.gu) >= 0).all()
    # real sub-batch columns are single-cell: all their gv entries valid
    assert (plan.gv >= 0).all() and (plan.gv < plan.n_gv).all()


def test_pallas_epoch_matches_jax_kernel_interpret():
    """Interpret-mode fused epoch == pure-JAX kernel over identical batches
    (fp32 MXU dtype so the comparison is tight)."""
    ds = synthetic_ratings(300, 200, 4000, rank=3, seed=2)
    params = init_mf(jax.random.PRNGKey(0), ds.nu, ds.nv, 8, gb=3.0)
    eta, lam = 0.05, 0.01

    runner = PallasEpochRunner(
        ds, tile_u=128, tile_v=128, batch=256, seed=3,
        mxu="float32", interpret=True,
        theta_groups=8, phi_groups=8,  # pin: replay is fully sequential
    )
    tables = runner.pad(params)
    tables = runner.epoch(tables, eta, lam, float(params.gb))
    out_pallas = runner.trim(tables)

    ref = reference_epoch_on_plan(params, runner.plan, eta, lam)
    np.testing.assert_allclose(
        np.asarray(out_pallas.theta), np.asarray(ref.theta), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_pallas.phi), np.asarray(ref.phi), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_pallas.bu), np.asarray(ref.bu), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_pallas.bv), np.asarray(ref.bv), atol=2e-5
    )


def test_pallas_multi_epoch_converges_interpret():
    ds = synthetic_ratings(200, 100, 8000, rank=3, noise=0.1, seed=4)
    train, test = ds.split(0.2, seed=5)
    params = init_mf(jax.random.PRNGKey(1), ds.nu, ds.nv, 8, gb=ds.mean_rating())
    runner = PallasEpochRunner(
        train, tile_u=128, tile_v=128, batch=512, seed=6,
        mxu="float32", interpret=True,
    )
    tables = runner.pad(params)
    for it in range(1, 8):
        tables = runner.epoch(tables, 0.05 / it**0.3, 0.01, float(ds.mean_rating()))
    out = runner.trim(tables)
    final = rmse(out, test)
    assert final < 0.6, f"fused kernel training failed to converge: {final}"


def test_adaptive_theta_groups_selection_and_convergence():
    """Low eta picks a parallel grouping; training still converges; tiny eta
    on flat data reaches the fully-parallel mode."""
    ds = synthetic_ratings(400, 200, 20000, rank=3, noise=0.1, seed=9)
    train, test = ds.split(0.2, seed=10)
    runner = PallasEpochRunner(
        train, tile_u=128, tile_v=128, batch=512, seed=11,
        mxu="float32", interpret=True,
    )
    gs = {eta: runner.pick_theta_groups(eta) for eta in (1e-4, 0.01, 0.5)}
    assert gs[1e-4] <= gs[0.01] <= gs[0.5]
    assert gs[1e-4] == 1  # flat data, tiny eta -> fully parallel

    params = init_mf(jax.random.PRNGKey(2), ds.nu, ds.nv, 8, gb=ds.mean_rating())
    tables = runner.pad(params)
    for it in range(1, 8):
        tables = runner.epoch(tables, 0.05 / it**0.3, 0.01, float(params.gb))
    out = runner.trim(tables)
    final = rmse(out, test)
    assert final < 0.55, f"adaptive-group training failed to converge: {final}"


def test_pallas_epoch_dim128_two_lane_groups():
    """The reference's default dim=128 (main.cc:98) runs FUSED via 256-lane
    rows; interpret-mode parity against the pure-JAX kernel."""
    ds = synthetic_ratings(200, 150, 1500, rank=3, seed=12)
    params = init_mf(jax.random.PRNGKey(5), ds.nu, ds.nv, 128, gb=3.0)
    eta, lam = 0.03, 0.01

    runner = PallasEpochRunner(
        ds, tile_u=128, tile_v=128, batch=256, seed=13,
        mxu="float32", interpret=True, theta_groups=8, phi_groups=8,
    )
    tables = runner.pad(params)
    assert tables[0].shape[1] == 256  # two lane groups
    tables = runner.epoch(tables, eta, lam, float(params.gb))
    out = runner.trim(tables)

    ref = reference_epoch_on_plan(params, runner.plan, eta, lam)
    np.testing.assert_allclose(np.asarray(out.theta), np.asarray(ref.theta),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.phi), np.asarray(ref.phi),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.bu), np.asarray(ref.bu),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.bv), np.asarray(ref.bv),
                               atol=2e-5)


def test_homog_one_lane_invariant():
    """The homogeneous one-lanes stay exactly 1 across epochs (they are
    reconstructed at every tile apply)."""
    ds = synthetic_ratings(200, 150, 3000, rank=3, seed=14)
    params = init_mf(jax.random.PRNGKey(6), ds.nu, ds.nv, 8, gb=3.0)
    runner = PallasEpochRunner(
        ds, tile_u=128, tile_v=128, batch=256, seed=15,
        mxu="float32", interpret=True,
    )
    tables = runner.pad(params)
    for it in range(3):
        tables = runner.epoch(tables, 0.05, 0.01, 3.0, epoch_idx=it)
    th, ph = np.asarray(tables[0]), np.asarray(tables[1])
    dim = 8
    np.testing.assert_array_equal(th[: ds.nu, dim + 1], 1.0)  # theta one-lane
    np.testing.assert_array_equal(ph[: ds.nv, dim], 1.0)      # phi one-lane
    np.testing.assert_array_equal(th[:, dim + 2], 0.0)        # cnt cleared


def test_scatter_dg_matches_transposed():
    """Gen-1 scatter-via-dot_general == transposed-one-hot scatter."""
    ds = synthetic_ratings(300, 200, 5000, rank=3, seed=16)
    params = init_mf(jax.random.PRNGKey(7), ds.nu, ds.nv, 8, gb=3.0)
    kw = dict(tile_u=128, tile_v=128, batch=256, seed=17,
              mxu="float32", interpret=True)
    a = PallasEpochRunner(ds, **kw)
    b = PallasEpochRunner(ds, scatter_dg=True, **kw)
    ta, tb = a.pad(params), b.pad(params)
    for it in range(2):
        ta = a.epoch(ta, 0.05, 0.01, 3.0, epoch_idx=it)
        tb = b.epoch(tb, 0.05, 0.01, 3.0, epoch_idx=it)
    oa, ob = a.trim(ta), b.trim(tb)
    np.testing.assert_allclose(np.asarray(oa.theta), np.asarray(ob.theta),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(oa.phi), np.asarray(ob.phi),
                               atol=1e-6)


def test_balance_roundtrip_and_training():
    """balance=True relabels ids (balance_cells) but training is exact:
    pad->trim inverts the maps, and per-rating updates hit the same rows.
    Verified against the unbalanced runner via the shared NumPy oracle
    ordering is NOT possible (plans differ), so this checks (a) pad/trim
    is an exact inverse, (b) a few epochs stay finite and reduce RMSE,
    (c) the relabeled plan's fill is no worse than the natural one on a
    zipfy dataset."""
    from tpu_mf.data.coo import synthetic_ratings
    from tpu_mf.models.mf import rmse

    ds = synthetic_ratings(600, 400, 30000, rank=3, noise=0.1, seed=21,
                           zipf=1.0, zipf_q=5.0, zipf_u=1.0, zipf_uq=10.0)
    params = init_mf(jax.random.PRNGKey(9), ds.nu, ds.nv, 8, gb=3.0)
    kw = dict(tile_u=128, tile_v=128, batch=256, seed=22,
              mxu="float32", interpret=True)
    bal = PallasEpochRunner(ds, balance=True, **kw)
    nat = PallasEpochRunner(ds, **kw)

    # (a) exact pad/trim roundtrip through the relabeled layout
    rt = bal.trim(bal.pad(params), dim=8)
    np.testing.assert_array_equal(np.asarray(rt.theta), np.asarray(params.theta))
    np.testing.assert_array_equal(np.asarray(rt.bu), np.asarray(params.bu))
    np.testing.assert_array_equal(np.asarray(rt.phi), np.asarray(params.phi))
    np.testing.assert_array_equal(np.asarray(rt.bv), np.asarray(params.bv))

    # (c) fill comparable-or-better on zipfy marginals (the big wins show
    # at scale — calibrated ML-10M t256: 0.64 -> ~0.74; at toy scale the
    # serpentine deal may round a near-full cell past a sub boundary)
    fill_bal = bal.plan.n_real / bal.plan.w.size
    fill_nat = nat.plan.n_real / nat.plan.w.size
    assert fill_bal >= fill_nat - 0.02, (fill_bal, fill_nat)

    # (b) training stays finite and converges
    tables = bal.pad(params)
    before = float(rmse(params, ds))
    for it in range(3):
        tables = bal.epoch(tables, 0.05, 0.01, 3.0, epoch_idx=it)
    out = bal.trim(tables)
    after = float(rmse(out, ds))
    assert np.isfinite(after) and after < before, (before, after)


def test_saturation_inactive_when_cap_clears_and_stabilizes_heads():
    """saturate=True is exact when eta * window-dups <= 0.2 (cap >= k), and
    keeps training finite at warm etas on zipfy heads where the plain
    kernel's k-fold stale accumulation blows up (the staleness-envelope
    divergence, CLAUDE.md)."""
    from tpu_mf.data.coo import synthetic_ratings
    from tpu_mf.models.mf import rmse

    # Small eta: cap = 0.2/0.01 = 20 >= any window dup here -> bit-exact.
    ds = synthetic_ratings(400, 300, 20000, rank=3, noise=0.1, seed=31)
    params = init_mf(jax.random.PRNGKey(11), ds.nu, ds.nv, 8, gb=3.0)
    kw = dict(tile_u=128, tile_v=128, batch=256, seed=32,
              mxu="float32", interpret=True)
    a = PallasEpochRunner(ds, **kw)
    b = PallasEpochRunner(ds, saturate=True, **kw)
    ta, tb = a.pad(params), b.pad(params)
    for it in range(2):
        ta = a.epoch(ta, 0.01, 0.01, 3.0, epoch_idx=it)
        tb = b.epoch(tb, 0.01, 0.01, 3.0, epoch_idx=it)
    np.testing.assert_array_equal(np.asarray(ta[0]), np.asarray(tb[0]))
    np.testing.assert_array_equal(np.asarray(ta[1]), np.asarray(tb[1]))

    # Warm eta on a pure-zipf head: saturated run stays finite and sane.
    zds = synthetic_ratings(400, 300, 40000, rank=3, noise=0.1, seed=33,
                            zipf=1.0, zipf_q=2.0, zipf_u=1.0, zipf_uq=2.0)
    zp = init_mf(jax.random.PRNGKey(12), zds.nu, zds.nv, 8, gb=3.0)
    s = PallasEpochRunner(zds, saturate=True, tile_u=128, tile_v=128,
                          batch=1024, seed=34, mxu="float32", interpret=True,
                          theta_groups=8, phi_groups=8)
    ts = s.pad(zp)
    for it in range(3):
        ts = s.epoch(ts, 0.1, 0.01, 3.0, epoch_idx=it)
    out = s.trim(ts)
    final = float(rmse(out, zds))
    assert np.isfinite(final) and final < 2.0, final


def test_pallas_epoch_dim300_multi_group_rows():
    """Multi-lane-group rows (dim > 253; round-5 row_lanes extension to the
    reference's full dim sweep, src/run.py:13): interpret-mode fused epoch
    at dim 300 (3 lane groups, mxu_pred auto-disabled) == the pure-JAX
    kernel over identical batches."""
    ds = synthetic_ratings(120, 90, 1500, rank=3, seed=7)
    params = init_mf(jax.random.PRNGKey(2), ds.nu, ds.nv, 300, gb=3.0)
    eta, lam = 0.02, 0.01

    runner = PallasEpochRunner(
        ds, tile_u=64, tile_v=64, batch=128, seed=8,
        mxu="float32", interpret=True,
        theta_groups=8, phi_groups=8,
    )
    tables = runner.pad(params)
    assert runner.mxu_pred is False  # lanes^2 pred auto-disabled
    tables = runner.epoch(tables, eta, lam, float(params.gb))
    out = runner.trim(tables)
    ref = reference_epoch_on_plan(params, runner.plan, eta, lam)
    np.testing.assert_allclose(
        np.asarray(out.theta), np.asarray(ref.theta), atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(out.phi), np.asarray(ref.phi), atol=3e-5)
    np.testing.assert_allclose(np.asarray(out.bu), np.asarray(ref.bu),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(out.bv), np.asarray(ref.bv),
                               atol=3e-5)
