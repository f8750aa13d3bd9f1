"""Item-sharded fused epochs (ops/phi_shard.py), interpret mode.

The sharded runner exists so the reference's Yahoo-scale catalogs
(nv=624,961; reference src/run.py:6-9) run fused instead of silently
falling to the XLA path. Correctness contract: an epoch over K shards ==
the pure-JAX batched kernel replayed over each shard's cell plan in shard
order (theta chains through; item shards are disjoint)."""

import numpy as np
import jax
import jax.numpy as jnp

from tpu_mf.data.coo import RatingsCOO, synthetic_ratings
from tpu_mf.models.mf import MFParams, init_mf, rmse
from tpu_mf.ops.phi_shard import (
    PhiShardedRunner,
    phi_shard_tiles,
    pick_cell_geometry_large,
)
from tpu_mf.ops.pallas_sgd import pad_plan_nb, prepare_cells
from tpu_mf.ops.sgd import sgd_batch_update

# budget in bytes for a 128-lane fp32 row: 128 rows -> 2 tiles of 64
TINY_BUDGET = 128 * 128 * 4


def _relabel(params: MFParams, map_u, map_v, nu_pad, nv_pad) -> MFParams:
    dim = params.theta.shape[1]
    th = jnp.zeros((nu_pad, dim)).at[map_u].set(params.theta)
    ph = jnp.zeros((nv_pad, dim)).at[map_v].set(params.phi)
    bu = jnp.zeros((nu_pad,)).at[map_u].set(params.bu)
    bv = jnp.zeros((nv_pad,)).at[map_v].set(params.bv)
    return MFParams(theta=th, phi=ph, bu=bu, bv=bv, gb=params.gb)


def _replay_sharded(params_rel, runner, eta, lam):
    """Pure-JAX batched kernel over every shard's plan, in shard order,
    with global (relabeled) ids."""
    out = params_rel
    for k, inner in enumerate(runner.inners):
        plan = inner.plans[0]
        off_v_shard = k * runner.shard_rows
        for i in range(plan.u.shape[0]):
            for c in range(8):
                w = plan.w[i][:, c]
                gu_off = plan.gu[i] * plan.tile_u
                gv_off = off_v_shard + plan.gv[i, c] * plan.tile_v
                ul = np.where(w > 0, plan.u[i][:, c], 0)
                vl = np.where(w > 0, plan.v[i][:, c], 0)
                batch = (
                    jnp.asarray((ul + gu_off * (w > 0)).astype(np.int32)),
                    jnp.asarray((vl + gv_off * (w > 0)).astype(np.int32)),
                    jnp.asarray(plan.r[i][:, c]),
                    jnp.asarray(w),
                )
                out = sgd_batch_update(
                    out, batch, jnp.float32(eta), jnp.float32(lam)
                )
    return out


def test_phi_shard_tiles_budget():
    tiles_per, n_shards = phi_shard_tiles(
        nv_pad=1024, tile_v=64, dim=8, budget=TINY_BUDGET
    )
    assert tiles_per == 2 and n_shards == 8
    # even split preferred over max-sized shards with a runt
    tiles_per, n_shards = phi_shard_tiles(
        nv_pad=640, tile_v=64, dim=8, budget=3 * 64 * 128 * 4
    )
    assert tiles_per * n_shards >= 10 and tiles_per <= 3


def test_pick_cell_geometry_large_domain():
    ds = synthetic_ratings(5000, 4000, 100000, seed=0)
    tu, tv, b = pick_cell_geometry_large(ds)
    assert tv < 2048 and tu * 2048 + tv < (1 << 24)
    assert b % 8 == 0


def test_pad_plan_nb_sentinels():
    ds = synthetic_ratings(300, 200, 4000, seed=1)
    plan = prepare_cells(ds, tile_u=64, tile_v=64, batch_size=256, seed=1)
    nb0 = plan.u.shape[0]
    padded = pad_plan_nb(plan, nb0 + 5)
    assert padded.u.shape[0] == nb0 + 5
    assert (padded.w[nb0:] == 0).all()
    assert (padded.u[nb0:] == plan.tile_u).all()
    assert (padded.gu[nb0:] == plan.gu[-1]).all()  # never revisit a tile
    assert int(padded.w.sum()) == len(ds)


def test_phi_sharded_epoch_matches_replay():
    ds = synthetic_ratings(300, 260, 4000, rank=3, seed=2)
    params = init_mf(jax.random.PRNGKey(0), ds.nu, ds.nv, 8, gb=3.0)
    eta, lam = 0.02, 0.01
    runner = PhiShardedRunner(
        ds, dim=8, tile_u=64, tile_v=64, batch=256, seed=3,
        mxu="float32", interpret=True, budget=TINY_BUDGET,
        theta_groups=8, phi_groups=8, nb_round=4,
    )
    assert runner.n_shards >= 2
    # every rating lands in exactly one shard
    assert sum(len(i.plans[0].gu) > 0 for i in runner.inners) >= 2
    assert sum(int(i.plans[0].w.sum()) for i in runner.inners) == len(ds)

    tables = runner.pad(params)
    tables = runner.epoch(tables, eta, lam, float(params.gb))
    got = runner.trim(tables)

    params_rel = _relabel(
        params, runner._map_u, runner._map_v, runner.nu_pad, runner.nv_pad
    )
    ref_rel = _replay_sharded(params_rel, runner, eta, lam)
    ref = MFParams(
        theta=ref_rel.theta[runner._map_u],
        phi=ref_rel.phi[runner._map_v],
        bu=ref_rel.bu[runner._map_u],
        bv=ref_rel.bv[runner._map_v],
        gb=params.gb,
    )
    np.testing.assert_allclose(
        np.asarray(got.theta), np.asarray(ref.theta), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.phi), np.asarray(ref.phi), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.bu), np.asarray(ref.bu), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.bv), np.asarray(ref.bv), atol=2e-5
    )


def test_phi_sharded_converges():
    ds = synthetic_ratings(400, 300, 20000, rank=3, noise=0.1, seed=4,
                           zipf=0.8)
    train, test = ds.split(0.2, seed=5)
    params = init_mf(jax.random.PRNGKey(1), ds.nu, ds.nv, 8,
                     gb=ds.mean_rating())
    runner = PhiShardedRunner(
        train, dim=8, tile_u=64, tile_v=64, batch=512, seed=6,
        mxu="float32", interpret=True, budget=TINY_BUDGET, n_plans=2,
        nb_round=4,
    )
    tables = runner.pad(params)
    for it in range(1, 6):
        tables = runner.epoch(
            tables, 0.05 / it**0.3, 0.01, float(params.gb), epoch_idx=it
        )
    final = float(rmse(runner.trim(tables), test))
    assert np.isfinite(final) and final < 0.75, final
