"""Fused Pallas AdaptReg kernel vs. the XLA adreg op (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.models.admf import init_admf
from tpu_mf.models.mf import rmse
from tpu_mf.ops.adreg import AdRegHyper, adreg_batch_update
from tpu_mf.ops.pallas_adreg import PallasAdRegRunner, adreg_pallas_eligible


def setup(nu=300, nv=200, n=4000, dim=8, lam=0.02):
    ds = synthetic_ratings(nu, nv, n, rank=3, seed=0)
    valid = synthetic_ratings(nu, nv, 300, rank=3, seed=1)
    state = init_admf(jax.random.PRNGKey(0), nu, nv, dim, lam=lam, gb=3.0)
    return ds, valid, state


def test_adreg_pallas_sgd_part_matches_xla():
    """With eta_reg=0 the fused path is SGD with four fixed lambdas; it must
    match the XLA op replayed over the same sub-batches."""
    ds, valid, state = setup()
    eta = 0.05
    runner = PallasAdRegRunner(
        ds, valid, tile_u=128, tile_v=128, batch=256, segments=3, seed=2,
        mxu="float32", interpret=True,
    )
    tables = runner.pad(state)
    tables = runner.epoch(tables, eta, 0.0, jax.random.PRNGKey(5))
    out = runner.trim(tables)

    vtup = (jnp.asarray(valid.u), jnp.asarray(valid.v), jnp.asarray(valid.r))
    hyper = AdRegHyper(jnp.float32(eta), jnp.float32(0.0), 0)
    ref = init_admf(jax.random.PRNGKey(0), ds.nu, ds.nv, 8, lam=0.02, gb=3.0)
    plan = runner.plan
    nb = plan.u.shape[0]
    for i in range(nb):
        for k in range(8):
            w = plan.w[i][:, k]
            ul = np.where(w > 0, plan.u[i][:, k], 0) + plan.gu[i] * 128 * (w > 0)
            vl = np.where(w > 0, plan.v[i][:, k], 0) + plan.gv[i, k] * 128 * (w > 0)
            batch = (
                jnp.asarray(ul.astype(np.int32)),
                jnp.asarray(vl.astype(np.int32)),
                jnp.asarray(plan.r[i][:, k]),
                jnp.asarray(w),
            )
            ref = adreg_batch_update(
                ref, batch, vtup, hyper, jax.random.PRNGKey(0)
            )
    np.testing.assert_allclose(
        np.asarray(out.theta), np.asarray(ref.params.theta), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.phi), np.asarray(ref.params.phi), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.bu), np.asarray(ref.params.bu), atol=3e-5
    )


def test_adreg_pallas_lambdas_learn_and_converge():
    ds, valid, state = setup(n=8000)
    train, test = ds.split(0.2, seed=3)
    runner = PallasAdRegRunner(
        train, valid, tile_u=128, tile_v=128, batch=256, segments=4, seed=4,
        mxu="float32", interpret=True,
    )
    tables = runner.pad(state)
    lam0 = np.asarray(runner.lams).copy()
    for it in range(1, 7):
        tables = runner.epoch(
            tables, 0.05 / it**0.3, 1e-3, jax.random.PRNGKey(it)
        )
    out_state = runner.state(tables, state)
    assert not np.allclose(np.asarray(runner.lams), lam0), "lambdas never moved"
    assert (np.asarray(runner.lams) >= 0).all()
    final = rmse(out_state.params, test)
    assert final < 0.6, f"fused adreg failed to converge: {final}"


def test_adreg_eligibility():
    _, _, state = setup(dim=8)
    assert adreg_pallas_eligible(state, 1024)
    _, _, big = setup(dim=255)
    assert not adreg_pallas_eligible(big, 1024)


def test_adreg_plan_rotation():
    """n_plans=2 rotates independently-shuffled plans; both epochs train."""
    ds, valid, state = setup()
    runner = PallasAdRegRunner(
        ds, valid, tile_u=128, tile_v=128, batch=256, segments=2, seed=2,
        mxu="float32", interpret=True, n_plans=2,
    )
    tables = runner.pad(state)
    before = rmse(state.params, ds)
    tables = runner.epoch(tables, 0.05, 1e-4, jax.random.PRNGKey(5),
                          epoch_idx=0)
    tables = runner.epoch(tables, 0.04, 1e-4, jax.random.PRNGKey(6),
                          epoch_idx=1)
    out = runner.trim(tables)
    after = rmse(out, ds)
    assert np.isfinite(after) and after < before
    # the two plans are genuinely different shuffles
    assert not np.array_equal(runner.plans[0].u, runner.plans[1].u)
