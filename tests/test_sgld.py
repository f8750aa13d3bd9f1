"""DP-SGLD kernel tests: noise accounting, DP bound, Gibbs sampler, training."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_mf.config import TrainConfig
from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.models.dpmf import DPMFState, dp_bound, init_dpmf
from tpu_mf.models.mf import rmse
from tpu_mf.ops.gibbs import gamma_posterior, sample_hyper
from tpu_mf.ops.sgld import SgldHyper, finish_noise, sgld_batch_update
from tpu_mf.train.loop import train_dpmf


def test_dp_bound():
    """bound = eps/(4*25*tau), tau defaulting to nv (reference model.cc:240-242)."""
    assert dp_bound(0.0, 10, 100) == 1.0
    assert dp_bound(1.0, 10, 100) == pytest.approx(1.0 / 1000.0)
    assert dp_bound(1.0, 0, 50) == pytest.approx(1.0 / (100.0 * 50))


def test_inverse_frequency_weights():
    ds = synthetic_ratings(20, 10, 500, seed=0)
    state = init_dpmf(jax.random.PRNGKey(0), ds, 4)
    uc, vc = ds.counts()
    np.testing.assert_allclose(
        np.asarray(state.ur), len(ds) / np.maximum(uc, 1), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(state.vr), len(ds) / np.maximum(vc, 1), rtol=1e-6
    )


def test_noise_counter_telescoping():
    """Counters advance by batch size; rows touched get stamped to gc_end."""
    ds = synthetic_ratings(20, 10, 100, seed=1)
    state = init_dpmf(jax.random.PRNGKey(0), ds, 4)
    hyper = SgldHyper(
        eta=jnp.float32(1e-3), temp=jnp.float32(0.0),  # temp=0: no noise
        bound=jnp.float32(1.0), ntrain=jnp.float32(len(ds)),
    )
    b = 8
    batch = (
        jnp.asarray(ds.u[:b]), jnp.asarray(ds.v[:b]),
        jnp.asarray(ds.r[:b]), jnp.ones(b, jnp.float32),
    )
    s1 = sgld_batch_update(state, batch, hyper, jax.random.PRNGKey(1))
    assert int(s1.gcount) == b
    touched = np.unique(ds.u[:b])
    gcountu = np.asarray(s1.gcountu)
    assert (gcountu[touched] == b).all()
    untouched = np.setdiff1d(np.arange(20), touched)
    assert (gcountu[untouched] == 0).all()
    # pad slot untouched by real rows
    s2 = sgld_batch_update(s1, batch, hyper, jax.random.PRNGKey(2))
    assert int(s2.gcount) == 2 * b
    assert (np.asarray(s2.gcountu)[touched] == 2 * b).all()


def test_temp_zero_matches_deterministic_sgld():
    """With temp=0 the SGLD step is a deterministic weighted SGD step."""
    ds = synthetic_ratings(20, 10, 50, seed=2)
    state = init_dpmf(jax.random.PRNGKey(0), ds, 4)
    hyper = SgldHyper(
        eta=jnp.float32(1e-4), temp=jnp.float32(0.0),
        bound=jnp.float32(1.0), ntrain=jnp.float32(len(ds)),
    )
    batch = (
        jnp.asarray(ds.u[:4]), jnp.asarray(ds.v[:4]),
        jnp.asarray(ds.r[:4]), jnp.ones(4, jnp.float32),
    )
    a = sgld_batch_update(state, batch, hyper, jax.random.PRNGKey(1))
    b = sgld_batch_update(state, batch, hyper, jax.random.PRNGKey(99))
    np.testing.assert_allclose(
        np.asarray(a.params.theta), np.asarray(b.params.theta), atol=0
    )

    # manual single-rating check of the gradient math (reference dpmf.h:72-88)
    u0, v0, r0 = int(ds.u[0]), int(ds.v[0]), float(ds.r[0])
    one = (
        jnp.asarray([u0]), jnp.asarray([v0]),
        jnp.asarray([r0]), jnp.ones(1, jnp.float32),
    )
    out = sgld_batch_update(state, one, hyper, jax.random.PRNGKey(1))
    theta = np.asarray(state.params.theta, np.float64)
    phi = np.asarray(state.params.phi, np.float64)
    bu = np.asarray(state.params.bu, np.float64)
    bv = np.asarray(state.params.bv, np.float64)
    gb = float(state.params.gb)
    eta, ntrain = 1e-4, float(len(ds))
    scal = eta * ntrain * 1.0 * float(state.lambda_r)
    err = scal * (r0 - theta[u0] @ phi[v0] - bu[u0] - bv[v0] - gb)
    lam_u = np.asarray(state.lambda_u, np.float64)
    ur = float(state.ur[u0])
    expect_theta = theta[u0] + err * phi[v0] - eta * ur * (lam_u * theta[u0])
    np.testing.assert_allclose(
        np.asarray(out.params.theta)[u0], expect_theta, rtol=1e-4
    )


def test_noise_variance_statistics():
    """Injected noise variance ~= temp*eta*count for a touched row."""
    nu, nv, dim = 4, 3, 256
    ds = synthetic_ratings(nu, nv, 10, seed=3)
    state = init_dpmf(jax.random.PRNGKey(0), ds, dim)
    temp, eta = 2.0, 1e-3
    # Zero the gradient influence: set eta... gradient uses same eta. Use
    # lambda_r=0 so scal=0 (no gradient), lambda_u=0, lambda_ub=0 (no decay).
    state = state._replace(
        lambda_r=jnp.float32(0.0),
        lambda_u=jnp.zeros(dim, jnp.float32),
        lambda_v=jnp.zeros(dim, jnp.float32),
        lambda_ub=jnp.float32(0.0),
        lambda_vb=jnp.float32(0.0),
    )
    hyper = SgldHyper(
        eta=jnp.float32(eta), temp=jnp.float32(temp),
        bound=jnp.float32(1.0), ntrain=jnp.float32(len(ds)),
    )
    b = 64
    batch = (
        jnp.zeros(b, jnp.int32),  # all touch user 0
        jnp.asarray(np.arange(b) % nv, jnp.int32),
        jnp.full(b, 3.0, jnp.float32),
        jnp.ones(b, jnp.float32),
    )
    before = np.asarray(state.params.theta)[0].copy()
    out = sgld_batch_update(state, batch, hyper, jax.random.PRNGKey(42))
    after = np.asarray(out.params.theta)[0]
    diff = after - before
    # user 0 first touch: count = b (gcount 0 -> b), var = temp*eta*b
    expected_var = temp * eta * b
    assert np.var(diff) == pytest.approx(expected_var, rel=0.35)


def test_finish_noise_flushes_and_resets():
    ds = synthetic_ratings(20, 10, 100, seed=4)
    state = init_dpmf(jax.random.PRNGKey(0), ds, 4)
    state = state._replace(gcount=jnp.int32(50))
    theta_before = np.asarray(state.params.theta).copy()  # state is donated below
    out = finish_noise(state, jnp.float32(1e-3), jnp.float32(1.0), jax.random.PRNGKey(0))
    assert int(out.gcount) == 0
    assert (np.asarray(out.gcountu) == 0).all()
    # rows actually moved (noise injected)
    assert not np.allclose(np.asarray(out.params.theta), theta_before)


def test_gamma_posterior_moments():
    """Gamma(a + n/2, b + s/2) draws have the right mean (util.h:146-154)."""
    key = jax.random.PRNGKey(0)
    a, b_, s, n = 1.0, 100.0, 500.0, 1000.0
    draws = jax.vmap(lambda k: gamma_posterior(k, a, b_, s, n))(
        jax.random.split(key, 4000)
    )
    expect_mean = (a + n / 2) / (b_ + s / 2)
    assert float(jnp.mean(draws)) == pytest.approx(expect_mean, rel=0.05)


def test_sample_hyper_shapes_and_positivity():
    ds = synthetic_ratings(20, 10, 100, seed=5)
    state = init_dpmf(jax.random.PRNGKey(0), ds, 6)
    out = sample_hyper(
        state, jnp.float32(50.0), jnp.float32(100.0),
        jnp.float32(1.0), jnp.float32(100.0), jax.random.PRNGKey(1),
    )
    assert out.lambda_u.shape == (6,)
    assert float(out.lambda_r) > 0
    assert (np.asarray(out.lambda_u) > 0).all()


def test_train_dpmf_converges():
    """End-to-end SGLD training reduces test RMSE (convergence-as-test)."""
    ds = synthetic_ratings(100, 60, 8000, rank=3, noise=0.1, seed=6)
    train, test = ds.split(0.2, seed=7)
    # eta must satisfy eta*ntrain*lambda_r << 1 for SGLD stability (the
    # effective step is scal = eta*ntrain*bound*lambda_r, dpmf.h:50); hyperb
    # damps the Gibbs-sampled lambda_r growth as the fit improves.
    cfg = TrainConfig(
        alg="dpmf", dim=8, iters=6, eta=1e-5, gam=0.2, temp=1e-6,
        gb=ds.mean_rating(), batch_size=512, mineta=1e-9, seed=0,
        hyperb=1000.0,
    )
    logs = []
    state = train_dpmf(cfg, train, test_ds=test, log=logs.append)
    assert len(logs) == 6
    final = rmse(state.params, test)
    assert final < 0.5, f"SGLD failed to converge: {final}"
