"""Slot-major fused AdaptReg kernel (ops/pallas_adreg_slot.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.models.admf import init_admf
from tpu_mf.models.mf import init_mf, rmse
from tpu_mf.ops.pallas_adreg_slot import SlotAdRegRunner, adreg_slot_eligible
from tpu_mf.ops.pallas_sgd_slot import SlotEpochRunner


@pytest.mark.parametrize("balance", [False, True])
def test_slot_adreg_sgd_part_matches_slot_sgd(balance):
    """eta_reg=0 with all four lambdas equal reduces AdaptReg to plain SGD:
    the slot AdaptReg epoch must equal the slot SGD kernel on the SAME plan
    (same seed/geometry -> identical shuffles and batches)."""
    ds = synthetic_ratings(300, 200, 6000, rank=3, seed=0)
    valid = synthetic_ratings(300, 200, 300, rank=3, seed=1)
    lam, eta, dim = 0.02, 0.05, 8
    state = init_admf(jax.random.PRNGKey(0), ds.nu, ds.nv, dim, lam=lam,
                      gb=3.0)
    a = SlotAdRegRunner(
        ds, valid, sub=16, segments=3, seed=2, mxu="float32",
        interpret=True, dim=dim, tile=64,
        theta_groups=8, phi_groups=8, balance=balance,
    )
    ta = a.pad(state)
    ta = a.epoch(ta, eta, 0.0, jax.random.PRNGKey(5))
    out = a.trim(ta)

    s = SlotEpochRunner(
        ds, tile_u=64, tile_v=64, sub=16, seed=2, mxu="float32",
        interpret=True, dim=dim, theta_groups=8, phi_groups=8,
        balance=balance,
    )
    params = init_mf(jax.random.PRNGKey(0), ds.nu, ds.nv, dim, gb=3.0)
    params = params._replace(
        theta=state.params.theta, phi=state.params.phi,
        bu=state.params.bu, bv=state.params.bv,
    )
    ts = s.pad(params)
    ts = s.epoch(ts, eta, lam, 3.0)
    want = s.trim(ts)

    np.testing.assert_allclose(np.asarray(out.theta), np.asarray(want.theta),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(out.phi), np.asarray(want.phi),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(out.bu), np.asarray(want.bu),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(out.bv), np.asarray(want.bv),
                               atol=3e-5)


def test_slot_adreg_lambdas_learn_and_converge():
    ds = synthetic_ratings(400, 250, 15000, rank=3, noise=0.1, seed=3)
    train, rest = ds.split(0.3, seed=4)
    valid, test = rest.split(0.5, seed=5)
    state = init_admf(jax.random.PRNGKey(1), ds.nu, ds.nv, 8, lam=0.05,
                      gb=ds.mean_rating())
    runner = SlotAdRegRunner(
        train, valid, sub=16, segments=4, seed=6, mxu="float32",
        interpret=True, dim=8, tile=64, n_plans=2,
    )
    # stay inside the slot staleness envelope (eta * window dups <= 0.2)
    eta0 = 0.18 / max(runner._dup_max[8], runner._vdup_max[8])
    tables = runner.pad(state)
    lam0 = np.asarray(runner.lams)
    before = float(rmse(state.params, train))
    for it in range(1, 7):
        tables = runner.epoch(
            tables, eta0 / it**0.3, 2e-3,
            jax.random.fold_in(jax.random.PRNGKey(7), it), epoch_idx=it - 1,
        )
    out = runner.state(tables, state)
    # train-RMSE progress (the same gate the slot SGD convergence test
    # uses; held-out RMSE moves much slower on this noisy synthetic)
    after = float(rmse(out.params, train))
    assert np.isfinite(after) and after < before - 0.01, (before, after)
    assert np.isfinite(float(rmse(out.params, test)))
    assert not np.allclose(np.asarray(runner.lams), lam0), "lambdas frozen"
    assert (np.asarray(runner.lams) >= 0).all()


def test_slot_adreg_eligibility():
    s = init_admf(jax.random.PRNGKey(0), 69878, 10677, 8, lam=0.02, gb=3.0)
    assert adreg_slot_eligible(s)
    s64 = init_admf(jax.random.PRNGKey(0), 1000, 1000, 64, lam=0.02, gb=3.0)
    assert not adreg_slot_eligible(s64)


def test_stripe_adreg_sgd_part_matches_stripe_sgd():
    """Striped AdaptReg at eta_reg=0 with equal lambdas == striped slot SGD
    on the same striped plan (same seed/geometry -> identical batches)."""
    ds = synthetic_ratings(300, 200, 6000, rank=3, seed=0)
    valid = synthetic_ratings(300, 200, 300, rank=3, seed=1)
    lam, eta, dim = 0.02, 0.05, 8
    state = init_admf(jax.random.PRNGKey(0), ds.nu, ds.nv, dim, lam=lam,
                      gb=3.0)
    a = SlotAdRegRunner(
        ds, valid, sub=16, segments=3, seed=2, mxu="float32",
        interpret=True, dim=dim, tile=64,
        theta_groups=8, phi_groups=8, striped=True,
    )
    ta = a.pad(state)
    ta = a.epoch(ta, eta, 0.0, jax.random.PRNGKey(5))
    out = a.trim(ta)

    s = SlotEpochRunner(
        ds, tile_u=64, tile_v=64, sub=16, seed=2, mxu="float32",
        interpret=True, dim=dim, theta_groups=8, phi_groups=8,
        striped=True,
    )
    params = init_mf(jax.random.PRNGKey(0), ds.nu, ds.nv, dim, gb=3.0)
    params = params._replace(
        theta=state.params.theta, phi=state.params.phi,
        bu=state.params.bu, bv=state.params.bv,
    )
    ts = s.pad(params)
    ts = s.epoch(ts, eta, lam, 3.0)
    want = s.trim(ts)

    np.testing.assert_allclose(np.asarray(out.theta), np.asarray(want.theta),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(out.phi), np.asarray(want.phi),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(out.bu), np.asarray(want.bu),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(out.bv), np.asarray(want.bv),
                               atol=3e-5)
