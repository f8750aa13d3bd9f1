"""Sharded slot-major DSGD (parallel/dsgd_slot.py) on the CPU mesh."""

import numpy as np
import jax
import pytest

from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.models.mf import init_mf, rmse
from tpu_mf.ops.pallas_sgd_slot import SlotEpochRunner
from tpu_mf.parallel.dsgd_slot import ShardedSlotRunner, sharded_slot_eligible
from tpu_mf.parallel.mesh import make_mesh


def test_sharded_slot_p1_matches_single_runner():
    """P=1 sharded slot epoch == the single-chip slot runner (same plan)."""
    ds = synthetic_ratings(300, 200, 6000, rank=3, seed=0)
    params = init_mf(jax.random.PRNGKey(0), ds.nu, ds.nv, 8, gb=3.0)
    eta, lam = 0.02, 0.01
    mesh = make_mesh(1)

    sharded = ShardedSlotRunner(
        ds, mesh, dim=8, sub=32, seed=3, mxu="float32", interpret=True,
        theta_groups=8, phi_groups=8,
    )
    st = sharded.pad(params)
    st = sharded.epoch(st, eta, lam)
    out_sharded = sharded.trim(st)

    single = SlotEpochRunner(
        ds, sub=32, seed=3 * 7919, mxu="float32", interpret=True,
        theta_groups=8, phi_groups=8, dim=8,
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
    np.testing.assert_allclose(
        np.asarray(out_sharded.bu), np.asarray(out_single.bu), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_sharded.bv), np.asarray(out_single.bv), atol=1e-5
    )


@pytest.mark.parametrize("balance", [False, True])
def test_sharded_slot_4dev_tracks_single_chip(balance):
    """4-device sharded slot epochs land at the same quality as the
    single-chip slot runner on the same geometry (the diagonal schedule
    reorders updates but must not change the trajectory materially).
    balance=True additionally routes the LPT relabeling through the
    sharded pack/trim."""
    assert len(jax.devices()) >= 4
    ds = synthetic_ratings(500, 300, 20000, rank=3, noise=0.1, seed=4)
    train, test = ds.split(0.2, seed=5)
    mesh = make_mesh(4)
    params = init_mf(
        jax.random.PRNGKey(1), ds.nu, ds.nv, 8, gb=ds.mean_rating()
    )
    runner = ShardedSlotRunner(
        train, mesh, dim=8, sub=16, seed=7, mxu="float32", interpret=True,
        tile=32, balance=balance,
    )
    tables = runner.pad(params)
    for it in range(1, 4):
        tables = runner.epoch(tables, 0.04 / it**0.3, 0.01)
    after = float(rmse(runner.trim(tables), test))

    single = SlotEpochRunner(
        train, tile_u=32, tile_v=32, sub=16, seed=9, mxu="float32",
        interpret=True, dim=8,
    )
    ts = single.pad(params)
    for it in range(1, 4):
        ts = single.epoch(ts, 0.04 / it**0.3, 0.01, float(params.gb))
    want = float(rmse(single.trim(ts), test))
    assert np.isfinite(after) and abs(after - want) < 0.02, (after, want)


def test_sharded_slot_eligibility():
    p8 = init_mf(jax.random.PRNGKey(0), 480_189, 17_770, 8, gb=3.0)
    assert sharded_slot_eligible(p8, 8)
    p64 = init_mf(jax.random.PRNGKey(0), 1000, 1000, 64, gb=3.0)
    assert not sharded_slot_eligible(p64, 8)  # no slot packing at dim 64


def test_sharded_slot_p1_striped_matches_single_runner():
    """P=1 sharded STRIPED slot epoch == the single-chip striped runner
    (prepare_cells_stripe per diagonal block; same plan seeds)."""
    ds = synthetic_ratings(300, 200, 6000, rank=3, seed=0)
    params = init_mf(jax.random.PRNGKey(0), ds.nu, ds.nv, 8, gb=3.0)
    eta, lam = 0.02, 0.01
    mesh = make_mesh(1)

    sharded = ShardedSlotRunner(
        ds, mesh, dim=8, sub=32, seed=3, mxu="float32", interpret=True,
        theta_groups=8, phi_groups=8, striped=True,
    )
    st = sharded.pad(params)
    st = sharded.epoch(st, eta, lam)
    out_sharded = sharded.trim(st)

    single = SlotEpochRunner(
        ds, sub=32, seed=3 * 7919, mxu="float32", interpret=True,
        theta_groups=8, phi_groups=8, dim=8, striped=True,
    )
    tb = single.pad(params)
    tb = single.epoch(tb, eta, lam, 3.0)
    out_single = single.trim(tb)

    for f in ("theta", "phi", "bu", "bv"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_sharded, f)),
            np.asarray(getattr(out_single, f)), atol=1e-5,
        )
