"""Free-column fused kernel (ops/pallas_sgd_free.py), interpret mode.

Correctness contract: with immediate applies (groups=8 both sides) an epoch
equals the pure-JAX batched kernel replayed column by column in plan order
(each lane column is one gather/apply window); with deferred windows
(groups=1) it equals the batched kernel over each batch's concatenated
columns. Both use global (relabeled) ids since every column carries its own
(user-tile, item-tile) pair."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_mf.data.coo import RatingsCOO, synthetic_ratings
from tpu_mf.models.mf import MFParams, init_mf, rmse
from tpu_mf.ops.pallas_sgd_free import (
    FreeEpochRunner,
    free_eligible,
    pick_free_geometry,
    prepare_cells_free,
)
from tpu_mf.ops.sgd import sgd_batch_update

ETA, LAM = 2e-2, 5e-3


def _relabel(params: MFParams, map_u, map_v, nu_pad, nv_pad) -> MFParams:
    dim = params.theta.shape[1]
    th = jnp.zeros((nu_pad, dim)).at[map_u].set(params.theta)
    ph = jnp.zeros((nv_pad, dim)).at[map_v].set(params.phi)
    bu = jnp.zeros((nu_pad,)).at[map_u].set(params.bu)
    bv = jnp.zeros((nv_pad,)).at[map_v].set(params.bv)
    return MFParams(theta=th, phi=ph, bu=bu, bv=bv, gb=params.gb)


def _col_batch(plan, i, c, groups_cols=1):
    """Global-id batch for columns [c, c+groups_cols) of plan batch i."""
    us, vs, rs, ws = [], [], [], []
    for k in range(c, c + groups_cols):
        w = plan.w[i][:, k]
        gu_off = plan.gu[i, k] * plan.tile_u
        gv_off = plan.gv[i, k] * plan.tile_v
        ul = np.where(w > 0, plan.u[i][:, k] + gu_off, 0)
        vl = np.where(w > 0, plan.v[i][:, k] + gv_off, 0)
        us.append(ul)
        vs.append(vl)
        rs.append(plan.r[i][:, k])
        ws.append(w)
    return (
        jnp.asarray(np.concatenate(us).astype(np.int32)),
        jnp.asarray(np.concatenate(vs).astype(np.int32)),
        jnp.asarray(np.concatenate(rs)),
        jnp.asarray(np.concatenate(ws)),
    )


def _replay(params_rel, runner, cols_per_window):
    out = params_rel
    plan = runner.plan
    for i in range(plan.u.shape[0]):
        for c in range(0, 8, cols_per_window):
            out = sgd_batch_update(
                out, _col_batch(plan, i, c, cols_per_window),
                jnp.float32(ETA), jnp.float32(LAM),
            )
    return out


@pytest.mark.parametrize("groups,cols", [(8, 1), (1, 8)])
def test_free_epoch_matches_replay(groups, cols):
    ds = synthetic_ratings(300, 200, 4000, seed=5)
    params = init_mf(jax.random.PRNGKey(1), ds.nu, ds.nv, 8, gb=2.0)
    r = FreeEpochRunner(
        ds, tile_u=128, tile_v=128, batch=256, seed=0, mxu="float32",
        interpret=True, balance=True, saturate=False,
        groups_u=groups, groups_v=groups, mxu_pred=False,
    )
    tables = r.epoch(r.pad(params), ETA, LAM, float(params.gb))
    got = r.trim(tables)

    nu_pad = r.plan.n_gu * r.plan.tile_u
    nv_pad = r.plan.n_gv * r.plan.tile_v
    ref = _replay(
        _relabel(params, r._map_u, r._map_v, nu_pad, nv_pad), r, cols
    )
    np.testing.assert_allclose(
        np.asarray(got.theta),
        np.asarray(ref.theta[np.asarray(r._map_u)][: ds.nu]),
        rtol=0, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got.phi),
        np.asarray(ref.phi[np.asarray(r._map_v)][: ds.nv]),
        rtol=0, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got.bu),
        np.asarray(ref.bu[np.asarray(r._map_u)][: ds.nu]),
        rtol=0, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got.bv),
        np.asarray(ref.bv[np.asarray(r._map_v)][: ds.nv]),
        rtol=0, atol=2e-5,
    )


def test_free_plan_covers_every_rating():
    ds = synthetic_ratings(500, 300, 6000, seed=2)
    plan = prepare_cells_free(ds, 128, 128, 512, seed=1)
    assert plan.n_real == 6000
    assert int(plan.w.sum()) == 6000
    # every real slot's global id pair appears exactly as in ds
    w = plan.w > 0
    gu = np.broadcast_to(plan.gu[:, None, :], plan.u.shape)
    gv = np.broadcast_to(plan.gv[:, None, :], plan.v.shape)
    got = np.stack(
        [
            (plan.u + gu * 128)[w],
            (plan.v + gv * 128)[w],
            plan.r[w],
        ],
        axis=1,
    )
    want = np.stack([ds.u, ds.v, ds.r], axis=1)
    got_sorted = got[np.lexsort(got.T[::-1])]
    want_sorted = want[np.lexsort(want.T[::-1])]
    np.testing.assert_array_equal(got_sorted, want_sorted)


def test_free_geometry_and_eligibility():
    ds = synthetic_ratings(2000, 1000, 50000, seed=0)
    tu, tv, b = pick_free_geometry(ds)
    assert tu == 128 and tv == 128 and b % 8 == 0
    assert free_eligible(69_878, 10_677, 64)      # ML-10M rank 64
    assert free_eligible(69_878, 10_677, 8)
    assert not free_eligible(480_189, 17_770, 64)  # Netflix: theta too big
    assert not free_eligible(69_878, 10_677, 300)  # beyond MAX_DIM


def test_free_convergence_small():
    ds = synthetic_ratings(400, 250, 12000, rank=4, seed=7, noise=0.1)
    params = init_mf(jax.random.PRNGKey(0), ds.nu, ds.nv, 8, gb=ds.mean_rating())
    r = FreeEpochRunner(
        ds, tile_u=128, tile_v=128, batch=512, seed=0, mxu="float32",
        interpret=True, balance=True, saturate=True,
    )
    tables = r.pad(params)
    gb = float(params.gb)
    before = float(rmse(params, ds))
    for ep in range(10):
        tables = r.epoch(tables, ETA, LAM, gb, epoch_idx=ep)
    after = float(rmse(r.trim(tables), ds))
    # the XLA path lands at 0.4901 from 0.5253 on this exact config;
    # require the same trajectory (finite + comparable progress)
    assert np.isfinite(after) and after < before - 0.03
