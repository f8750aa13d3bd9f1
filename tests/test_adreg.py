"""Adaptive-regularization kernel tests: SGD math, lambda learning, training."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_mf.config import TrainConfig
from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.models.admf import init_admf
from tpu_mf.models.mf import rmse
from tpu_mf.ops.adreg import AdRegHyper, adreg_batch_update
from tpu_mf.train.loop import train_admf


def setup(nu=20, nv=10, dim=4, lam=0.05):
    ds = synthetic_ratings(nu, nv, 200, seed=0)
    state = init_admf(jax.random.PRNGKey(0), nu, nv, dim, lam=lam, gb=3.0)
    valid = synthetic_ratings(nu, nv, 50, seed=1)
    vtup = (jnp.asarray(valid.u), jnp.asarray(valid.v), jnp.asarray(valid.r))
    return ds, state, vtup


def test_single_rating_sgd_math():
    """One rating: update matches the reference formulas (admf.h:69-80)."""
    ds, state, vtup = setup()
    eta = 0.05
    hyper = AdRegHyper(jnp.float32(eta), jnp.float32(0.0), 0)  # eta_reg=0
    u0, v0, r0 = int(ds.u[0]), int(ds.v[0]), float(ds.r[0])
    batch = (
        jnp.asarray([u0]), jnp.asarray([v0]),
        jnp.asarray([r0]), jnp.ones(1, jnp.float32),
    )
    out = adreg_batch_update(state, batch, vtup, hyper, jax.random.PRNGKey(0))

    theta = np.asarray(state.params.theta, np.float64)
    phi = np.asarray(state.params.phi, np.float64)
    bu = np.asarray(state.params.bu, np.float64)
    bv = np.asarray(state.params.bv, np.float64)
    gb = float(state.params.gb)
    err = eta * (r0 - (theta[u0] @ phi[v0] + bu[u0] + bv[v0] + gb))
    lam = float(state.lam_u)
    exp_theta = (1 - eta * lam) * theta[u0] + err * phi[v0]
    exp_phi = (1 - eta * lam) * phi[v0] + err * theta[u0]
    np.testing.assert_allclose(np.asarray(out.params.theta)[u0], exp_theta, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.params.phi)[v0], exp_phi, rtol=1e-5)
    np.testing.assert_allclose(
        float(np.asarray(out.params.bu)[u0]), (1 - eta * lam) * bu[u0] + err, rtol=1e-5
    )
    # shadow tables hold the pre-update rows (admf.h:67-68)
    np.testing.assert_allclose(np.asarray(out.theta_old)[u0], theta[u0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.phi_old)[v0], phi[v0], rtol=1e-6)


def test_lambda_updates_and_clamp():
    """Lambdas move under hypergradient and clamp at zero (model.h:86-102)."""
    ds, state, vtup = setup(lam=0.05)
    hyper = AdRegHyper(jnp.float32(0.05), jnp.float32(0.5), 0)
    b = 32
    batch = (
        jnp.asarray(ds.u[:b]), jnp.asarray(ds.v[:b]),
        jnp.asarray(ds.r[:b]), jnp.ones(b, jnp.float32),
    )
    out = adreg_batch_update(state, batch, vtup, hyper, jax.random.PRNGKey(3))
    moved = [
        float(out.lam_u) != float(state.lam_u),
        float(out.lam_v) != float(state.lam_v),
        float(out.lam_bu) != float(state.lam_bu),
        float(out.lam_bv) != float(state.lam_bv),
    ]
    assert any(moved), "no lambda moved under hypergradient"
    assert all(
        float(x) >= 0.0 for x in (out.lam_u, out.lam_v, out.lam_bu, out.lam_bv)
    )

    # huge eta_reg drives lambdas into the clamp
    hyper_big = AdRegHyper(jnp.float32(0.05), jnp.float32(1e9), 0)
    out2 = adreg_batch_update(state, batch, vtup, hyper_big, jax.random.PRNGKey(3))
    vals = [float(out2.lam_u), float(out2.lam_v), float(out2.lam_bu), float(out2.lam_bv)]
    assert all(v >= 0.0 for v in vals)
    assert any(v == 0.0 for v in vals)


def test_logistic_loss_path():
    ds, state, vtup = setup()
    hyper = AdRegHyper(jnp.float32(0.05), jnp.float32(0.01), 1)
    b = 8
    batch = (
        jnp.asarray(ds.u[:b]), jnp.asarray(ds.v[:b]),
        jnp.asarray((ds.r[:b] > 3).astype(np.float32)),
        jnp.ones(b, jnp.float32),
    )
    out = adreg_batch_update(state, batch, vtup, hyper, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out.params.theta)).all()


def test_train_admf_converges():
    ds = synthetic_ratings(100, 60, 8000, rank=3, noise=0.1, seed=6)
    train, rest = ds.split(0.4, seed=7)
    valid, test = rest.split(0.5, seed=8)
    cfg = TrainConfig(
        alg="admf", dim=8, iters=6, eta=0.05, lam=0.02, eta_reg=1e-3,
        gam=0.3, gb=ds.mean_rating(), batch_size=512, seed=0,
    )
    logs = []
    state = train_admf(cfg, train, valid, test_ds=test, log=logs.append)
    assert len(logs) == 6
    final = rmse(state.params, test)
    assert final < 0.6, f"AdaptReg failed to converge: {final}"
    assert all(
        float(x) >= 0 for x in (state.lam_u, state.lam_v, state.lam_bu, state.lam_bv)
    )
