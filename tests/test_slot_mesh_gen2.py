"""Gen-2 mesh runners for dpmf/admf (slot kernels under shard_map), CPU mesh.

Round-3 VERDICT #3: only MF had a slot kernel on the mesh; sharded SGLD and
AdaptReg were pinned to gen-1 runners. These tests mirror
tests/test_dsgd_slot.py: P=1 parity against the single-chip slot runner
(identical plans/seeds/clocks) and multi-device quality tracking."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.models.admf import init_admf
from tpu_mf.models.dpmf import init_dpmf
from tpu_mf.models.mf import calc_mse, init_mf, rmse
from tpu_mf.ops.pallas_adreg_slot import SlotAdRegRunner
from tpu_mf.ops.pallas_sgld_slot import SlotSgldRunner
from tpu_mf.parallel.adreg_slot_sharded import (
    ShardedSlotAdRegRunner,
    sharded_adreg_slot_eligible,
)
from tpu_mf.parallel.mesh import make_mesh
from tpu_mf.parallel.sgld_slot_sharded import (
    ShardedSlotSgldRunner,
    sharded_sgld_slot_eligible,
)


def test_sharded_slot_sgld_p1_matches_single_runner_temp0():
    """P=1 sharded slot SGLD round == the single-chip slot SGLD runner
    (same plan seed, same batch-START clocks, same noise seeds)."""
    ds = synthetic_ratings(300, 200, 6000, rank=3, seed=0)
    state = init_dpmf(jax.random.PRNGKey(0), ds, 8)
    eta, temp, bound = 1e-5, 0.0, 1.0
    scal = eta * len(ds) * bound * float(state.lambda_r)
    hyper = (eta, temp, bound, scal, float(state.params.gb))
    mesh = make_mesh(1)

    sharded = ShardedSlotSgldRunner(
        ds, mesh, dim=8, sub=32, seed=3, mxu="float32", interpret=True,
        tile=64, saturate=False, noise_every=1,
    )
    st = sharded.pad(state)
    st = sharded.epoch(st, 0, hyper, noise_seed=7)
    out_sharded = sharded.unpack(state, st)

    single = SlotSgldRunner(
        ds, sub=32, seed=3 * 7919, mxu="float32", interpret=True, dim=8,
        tile=64, saturate=False, noise_every=1,
    )
    tb = single.pad(state)
    tb = single.epoch(tb, 0, hyper, noise_seed=7)
    out_single = single.unpack(state, tb)

    for f in ("theta", "phi", "bu", "bv"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_sharded.params, f)),
            np.asarray(getattr(out_single.params, f)), atol=1e-6,
        )
    np.testing.assert_array_equal(
        np.asarray(out_sharded.gcountu), np.asarray(out_single.gcountu)
    )
    np.testing.assert_array_equal(
        np.asarray(out_sharded.gcountv), np.asarray(out_single.gcountv)
    )


def test_sharded_slot_sgld_4dev_converges_with_gibbs():
    assert len(jax.devices()) >= 4
    ds = synthetic_ratings(400, 250, 20000, rank=3, noise=0.1, seed=4)
    train, test = ds.split(0.2, seed=5)
    mesh = make_mesh(4)
    state = init_dpmf(jax.random.PRNGKey(1), train, 8, gb=ds.mean_rating())
    # noise_every=1: the test's per-substep batch counts are below the
    # default cadence of 8, which would legitimately skip every stamp
    runner = ShardedSlotSgldRunner(
        train, mesh, dim=8, sub=16, seed=7, mxu="float32", interpret=True,
        tile=32, balance=True, saturate=True, noise_every=1,
    )
    from tpu_mf.ops.gibbs import sample_hyper
    from tpu_mf.ops.sgld import finish_noise

    ntrain = len(train)
    eta0, temp, bound = 5e-6, 0.0, 1.0
    for rnd in range(1, 6):
        eta = eta0 / rnd**0.2
        scal = eta * ntrain * bound * float(state.lambda_r)
        assert runner.envelope_ok(scal)
        runner.set_lambdas(state)
        tables = runner.pad(state)
        tables = runner.epoch(
            tables, int(state.gcount),
            (eta, temp, bound, scal, float(state.params.gb)),
            noise_seed=rnd * runner.seed_stride,
        )
        state = runner.unpack(state, tables)
        # one dataset pass per round, stamps advanced (before finish_noise
        # flushes and resets the round-local counters, ops/sgld.py)
        assert int(state.gcount) == ntrain
        assert int(jnp.max(state.gcountu[: train.nu])) > 0
        state = finish_noise(
            state, jnp.float32(eta), jnp.float32(temp), jax.random.PRNGKey(rnd)
        )
        mse = calc_mse(state.params, train.u, train.v, train.r)
        state = sample_hyper(
            state, jnp.float32(mse * ntrain), jnp.float32(ntrain),
            jnp.float32(1.0), jnp.float32(2000.0), jax.random.PRNGKey(rnd + 50),
        )
    final = rmse(state.params, test)
    assert np.isfinite(final) and final < 0.8, f"diverged: {final}"


def test_sharded_slot_adreg_p1_matches_single_runner():
    """P=1 sharded slot AdaptReg epoch == single-chip SlotAdRegRunner at
    segments=1 (same plan seed, same validation sampling keys)."""
    ds = synthetic_ratings(300, 200, 6000, rank=3, seed=0)
    valid = synthetic_ratings(300, 200, 500, rank=3, seed=9)
    state = init_admf(jax.random.PRNGKey(0), ds.nu, ds.nv, 8, lam=0.01,
                      gb=3.0)
    eta, eta_reg = 0.02, 0.1
    key = jax.random.PRNGKey(5)
    mesh = make_mesh(1)

    sharded = ShardedSlotAdRegRunner(
        ds, valid, mesh, dim=8, sub=32, seed=3, mxu="float32",
        interpret=True, tile=64, theta_groups=8, phi_groups=8,
    )
    st = sharded.pad(state)
    st = sharded.epoch(st, eta, eta_reg, key)
    out_sharded = sharded.trim(st)
    lams_sharded = np.asarray(sharded.lams)

    single = SlotAdRegRunner(
        ds, valid, sub=32, segments=1, seed=3 * 7919, mxu="float32",
        interpret=True, dim=8, tile=64, theta_groups=8, phi_groups=8,
    )
    tb = single.pad(state)
    tb = single.epoch(tb, eta, eta_reg, key)
    out_single = single.trim(tb)

    for f in ("theta", "phi", "bu", "bv"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_sharded, f)),
            np.asarray(getattr(out_single, f)), atol=1e-5,
        )
    np.testing.assert_allclose(
        lams_sharded, np.asarray(single.lams), atol=1e-6
    )


def test_sharded_slot_adreg_4dev_lambdas_learn_and_converge():
    assert len(jax.devices()) >= 4
    ds = synthetic_ratings(500, 300, 24000, rank=3, noise=0.1, seed=4)
    train, test = ds.split(0.2, seed=5)
    valid, train2 = train.split(0.9, seed=6)
    mesh = make_mesh(4)
    state = init_admf(jax.random.PRNGKey(1), ds.nu, ds.nv, 8, lam=0.05,
                      gb=ds.mean_rating())
    runner = ShardedSlotAdRegRunner(
        train2, valid, mesh, dim=8, sub=16, seed=7, mxu="float32",
        interpret=True, tile=32, balance=True,
    )
    tables = runner.pad(state)
    for it in range(1, 4):
        tables = runner.epoch(
            tables, 0.04 / it**0.3, 0.05,
            jax.random.fold_in(jax.random.PRNGKey(8), it),
        )
    out = runner.state(tables, state)
    final = float(rmse(out.params, test))
    assert np.isfinite(final) and final < 0.8, final
    lams = np.asarray(
        [out.lam_u, out.lam_v, out.lam_bu, out.lam_bv], np.float32
    )
    assert (lams >= 0).all()
    assert not np.allclose(lams, 0.05)  # hypergradient moved the lambdas


def test_gen2_mesh_eligibility():
    s8 = init_dpmf(
        jax.random.PRNGKey(0), synthetic_ratings(500, 300, 2000, seed=0), 8
    )
    assert sharded_sgld_slot_eligible(s8, 8, 10_000_000)
    s64 = init_dpmf(
        jax.random.PRNGKey(0), synthetic_ratings(500, 300, 2000, seed=0), 64
    )
    assert not sharded_sgld_slot_eligible(s64, 8, 10_000_000)
    a8 = init_admf(jax.random.PRNGKey(0), 480_189, 17_770, 8, lam=0.01,
                   gb=3.0)
    assert sharded_adreg_slot_eligible(a8, 8)


def test_sharded_slot_sgld_p1_striped_matches_single_temp0():
    """P=1 sharded STRIPED slot SGLD == single-chip striped runner
    (striping reorganizes columns within a tile pair; clocks and stamps
    must be unmoved)."""
    ds = synthetic_ratings(300, 200, 6000, rank=3, seed=0)
    state = init_dpmf(jax.random.PRNGKey(0), ds, 8)
    eta, temp, bound = 1e-5, 0.0, 1.0
    scal = eta * len(ds) * bound * float(state.lambda_r)
    hyper = (eta, temp, bound, scal, float(state.params.gb))
    mesh = make_mesh(1)

    sharded = ShardedSlotSgldRunner(
        ds, mesh, dim=8, sub=32, seed=3, mxu="float32", interpret=True,
        tile=64, saturate=False, noise_every=1, striped=True,
    )
    st = sharded.pad(state)
    st = sharded.epoch(st, 0, hyper, noise_seed=7)
    out_sharded = sharded.unpack(state, st)

    single = SlotSgldRunner(
        ds, sub=32, seed=3 * 7919, mxu="float32", interpret=True, dim=8,
        tile=64, saturate=False, noise_every=1, striped=True,
    )
    tb = single.pad(state)
    tb = single.epoch(tb, 0, hyper, noise_seed=7)
    out_single = single.unpack(state, tb)

    for f in ("theta", "phi", "bu", "bv"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_sharded.params, f)),
            np.asarray(getattr(out_single.params, f)), atol=1e-6,
        )
    np.testing.assert_array_equal(
        np.asarray(out_sharded.gcountu), np.asarray(out_single.gcountu)
    )
    np.testing.assert_array_equal(
        np.asarray(out_sharded.gcountv), np.asarray(out_single.gcountv)
    )


def test_sharded_slot_adreg_p1_striped_matches_single():
    """P=1 sharded STRIPED slot AdaptReg == single-chip striped runner at
    segments=1 (same plan seed, same validation sampling keys)."""
    ds = synthetic_ratings(300, 200, 6000, rank=3, seed=0)
    valid = synthetic_ratings(300, 200, 500, rank=3, seed=9)
    state = init_admf(jax.random.PRNGKey(0), ds.nu, ds.nv, 8, lam=0.01,
                      gb=3.0)
    eta, eta_reg = 0.02, 0.1
    key = jax.random.PRNGKey(5)
    mesh = make_mesh(1)

    sharded = ShardedSlotAdRegRunner(
        ds, valid, mesh, dim=8, sub=32, seed=3, mxu="float32",
        interpret=True, tile=64, theta_groups=8, phi_groups=8, striped=True,
    )
    st = sharded.pad(state)
    st = sharded.epoch(st, eta, eta_reg, key)
    out_sharded = sharded.trim(st)
    lams_sharded = np.asarray(sharded.lams)

    single = SlotAdRegRunner(
        ds, valid, sub=32, segments=1, seed=3 * 7919, mxu="float32",
        interpret=True, dim=8, tile=64, theta_groups=8, phi_groups=8,
        striped=True,
    )
    tb = single.pad(state)
    tb = single.epoch(tb, eta, eta_reg, key)
    out_single = single.trim(tb)

    for f in ("theta", "phi", "bu", "bv"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_sharded, f)),
            np.asarray(getattr(out_single, f)), atol=1e-5,
        )
    np.testing.assert_allclose(
        lams_sharded, np.asarray(single.lams), atol=1e-6
    )
