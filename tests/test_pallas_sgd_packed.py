"""Lane-packed fused SGD kernel vs. the pure-JAX batched kernel (interpret)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.models.mf import init_mf, rmse
from tpu_mf.ops.pallas_sgd_packed import (
    PackedEpochRunner,
    pack_params,
    packing_factor,
    prepare_cells_packed,
    unpack_params,
)
from tpu_mf.ops.sgd import sgd_batch_update


def replay_plan(params, plan, eta, lam):
    """Pure-JAX kernel over the packed plan's exact sub-batch sequence."""
    out = params
    for i in range(plan.u.shape[0]):
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


def test_packing_factor():
    assert packing_factor(8) == 8 and packing_factor(14) == 8
    assert packing_factor(15) == 4 and packing_factor(30) == 4
    assert packing_factor(31) == 2 and packing_factor(62) == 2
    assert packing_factor(63) == 1 and packing_factor(128) == 1


def test_packed_plan_covers_all_ratings_and_deltas():
    ds = synthetic_ratings(300, 200, 5000, seed=0)
    plan = prepare_cells_packed(
        ds, tile_u=128, tile_v=128, batch_size=256, seed=1, pack=8
    )
    assert int(plan.w.sum()) == len(ds)
    assert (plan.u[plan.w > 0] < plan.tile_u).all()
    assert (plan.u[plan.w == 0] == plan.tile_u).all()
    assert (np.diff(plan.gu) >= 0).all()
    assert (plan.gd >= 0).all() and (plan.gd < 8).all()
    # every real slot's delta matches its column's declared delta
    for b in range(plan.u.shape[0]):
        for k in range(8):
            real = plan.w[b, :, k] > 0
            if real.any():
                d = (plan.v[b, real, k] - plan.u[b, real, k]) % 8
                # local ids: (v%tile - u%tile) % P == (v-u) % P for P | tile
                assert (d == plan.gd[b, k]).all()


def test_pack_unpack_roundtrip():
    ds = synthetic_ratings(300, 200, 1000, seed=3)
    plan = prepare_cells_packed(
        ds, tile_u=128, tile_v=128, batch_size=256, seed=1, pack=4
    )
    params = init_mf(jax.random.PRNGKey(0), ds.nu, ds.nv, 20, gb=3.0)
    t, p = pack_params(params, plan)
    back = unpack_params(t, p, ds.nu, ds.nv, 20, params.gb, 4)
    np.testing.assert_array_equal(np.asarray(back.theta), np.asarray(params.theta))
    np.testing.assert_array_equal(np.asarray(back.phi), np.asarray(params.phi))
    np.testing.assert_array_equal(np.asarray(back.bu), np.asarray(params.bu))
    np.testing.assert_array_equal(np.asarray(back.bv), np.asarray(params.bv))


@pytest.mark.parametrize("dim,pack", [(8, 8), (20, 4), (40, 2)])
def test_packed_epoch_matches_jax_kernel_interpret(dim, pack):
    """Interpret-mode packed epoch == pure-JAX kernel over identical batches
    (fp32 MXU dtype so the comparison is tight)."""
    ds = synthetic_ratings(300, 200, 4000, rank=3, seed=2)
    params = init_mf(jax.random.PRNGKey(0), ds.nu, ds.nv, dim, gb=3.0)
    eta, lam = 0.05, 0.01

    runner = PackedEpochRunner(
        ds, tile_u=16 * pack, tile_v=16 * pack, batch=256, seed=3,
        mxu="float32", interpret=True, theta_groups=8, phi_groups=8,
        pack=pack,  # both pinned sequential: replay is fully sequential
    )
    tables = runner.pad(params)
    tables = runner.epoch(tables, eta, lam, float(params.gb))
    out = runner.trim(tables)

    ref = replay_plan(params, runner.plan, eta, lam)
    np.testing.assert_allclose(
        np.asarray(out.theta), np.asarray(ref.theta), atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(out.phi), np.asarray(ref.phi), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.bu), np.asarray(ref.bu), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.bv), np.asarray(ref.bv), atol=2e-5)


def test_packed_multi_epoch_converges_interpret():
    ds = synthetic_ratings(200, 100, 8000, rank=3, noise=0.1, seed=4)
    train, test = ds.split(0.2, seed=5)
    params = init_mf(jax.random.PRNGKey(1), ds.nu, ds.nv, 8, gb=ds.mean_rating())
    runner = PackedEpochRunner(
        train, tile_u=128, tile_v=128, batch=512, seed=6,
        mxu="float32", interpret=True, dim=8,
    )
    tables = runner.pad(params)
    for it in range(1, 8):
        tables = runner.epoch(
            tables, 0.05 / it**0.3, 0.01, float(ds.mean_rating()), epoch_idx=it
        )
    out = runner.trim(tables)
    final = rmse(out, test)
    assert final < 0.6, f"packed kernel training failed to converge: {final}"


def test_packed_plan_delta_classes_columns():
    """Column k must only carry delta class k % P (static kernel rolls)."""
    ds = synthetic_ratings(300, 200, 6000, seed=7)
    for pack in (2, 4, 8):
        plan = prepare_cells_packed(
            ds, tile_u=16 * pack, tile_v=16 * pack, batch_size=256,
            seed=1, pack=pack,
        )
        for k in range(8):
            real = plan.w[:, :, k] > 0
            d = (plan.v[:, :, k][real] - plan.u[:, :, k][real]) % pack
            assert (d == k % pack).all(), (pack, k)


def test_apply_flags_last_touch():
    from tpu_mf.ops.pallas_sgd_packed import _apply_flags

    gv = np.array([[0, 1, 0, 2, 1, 1, 3, 0]], np.int32)
    # groups=1: one window of 8 columns; last touches: col7(0), col5(1),
    # col3(2), col6(3)
    f = _apply_flags(gv, 1)
    assert f.tolist() == [[0, 0, 0, 1, 0, 1, 1, 1]]
    # groups=4: windows [0,1] [2,3] [4,5] [6,7]; within each, only repeated
    # tiles defer
    f = _apply_flags(gv, 4)
    assert f.tolist() == [[1, 1, 1, 1, 0, 1, 1, 1]]
    # groups=8 trivially all ones
    assert (_apply_flags(gv, 8) == 1).all()


def test_deferred_apply_matches_sequential_at_tiny_eta():
    """phi_groups=1 (fully deferred) must track the sequential kernel tightly
    when the staleness term is negligible, and converge identically."""
    ds = synthetic_ratings(200, 150, 6000, rank=3, noise=0.1, seed=8)
    params = init_mf(jax.random.PRNGKey(1), ds.nu, ds.nv, 8, gb=ds.mean_rating())
    eta, lam = 1e-4, 0.01

    outs = {}
    for pg in (8, 1):
        runner = PackedEpochRunner(
            ds, tile_u=64, tile_v=64, batch=256, seed=9,
            mxu="float32", interpret=True, theta_groups=8, phi_groups=pg,
            dim=8,
        )
        tables = runner.pad(params)
        tables = runner.epoch(tables, eta, lam, float(params.gb))
        outs[pg] = runner.trim(tables)
    np.testing.assert_allclose(
        np.asarray(outs[1].phi), np.asarray(outs[8].phi), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(outs[1].theta), np.asarray(outs[8].theta), atol=5e-5
    )


def test_adaptive_phi_groups_convergence():
    """Adaptive phi_groups engages at small eta and training still converges."""
    ds = synthetic_ratings(200, 100, 8000, rank=3, noise=0.1, seed=4)
    train, test = ds.split(0.2, seed=5)
    runner = PackedEpochRunner(
        train, tile_u=128, tile_v=128, batch=512, seed=6,
        mxu="float32", interpret=True, dim=8,
    )
    assert runner.pick_phi_groups(1e-5) == 1   # SGLD-scale eta: parallel
    assert runner.pick_phi_groups(10.0) == 8   # absurd eta: sequential
    params = init_mf(jax.random.PRNGKey(1), ds.nu, ds.nv, 8, gb=ds.mean_rating())
    tables = runner.pad(params)
    for it in range(1, 8):
        tables = runner.epoch(
            tables, 0.05 / it**0.3, 0.01, float(ds.mean_rating()), epoch_idx=it
        )
    out = runner.trim(tables)
    final = rmse(out, test)
    assert final < 0.6, f"adaptive phi-group training failed to converge: {final}"


def test_packed_envelope_warns_instead_of_silent_nan():
    """When even the most sequential grouping (g=8) breaks the staleness
    envelope, pick_*_groups must WARN (the slot kernel always did; the
    packed/mega/blocked kernels used to NaN silently)."""
    ds = synthetic_ratings(300, 200, 20000, rank=3, seed=1, zipf=1.4)
    runner = PackedEpochRunner(ds, batch=8192, seed=2, dim=8)
    big_eta = 1.0  # guaranteed to exceed eta * dups <= 0.2 at g=8
    assert big_eta * runner._vdup_max[8] > 0.2
    with pytest.warns(UserWarning, match="staleness envelope exceeded"):
        runner.pick_phi_groups(big_eta)
    # once per runner per side: a second pick stays silent
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("error")
        runner.pick_phi_groups(big_eta)
