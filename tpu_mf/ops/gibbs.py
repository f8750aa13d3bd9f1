"""Gibbs hyperparameter sampling for DP-SGLD.

Reference: ``DPMF::sample_hyper`` (src/model.cc:335-348) draws precisions from
Gamma posteriors Gamma(a + n/2, b + ||.||^2 / 2) using a hand-rolled
Marsaglia-Tsang sampler (util.h:126-154). Here the draws use
``jax.random.gamma`` (shape-parameterized; divide by the rate), vectorized
over the per-dimension lambda_u / lambda_v vectors in one call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_mf.models.dpmf import DPMFState


def gamma_posterior(key, prior_a, prior_b, psum_sqr, psum_cnt):
    """Draw lambda ~ Gamma(a + cnt/2, rate = b + sqr/2) (reference: util.h:146-154).

    Shapes broadcast: passing vectors for psum_sqr/psum_cnt yields vector draws.
    """
    alpha = prior_a + 0.5 * psum_cnt
    beta = prior_b + 0.5 * psum_sqr
    return jax.random.gamma(key, alpha) / beta


@jax.jit
def sample_hyper(
    state: DPMFState,
    sse_train: jax.Array,
    ntrain: jax.Array,
    hyper_a: jax.Array,
    hyper_b: jax.Array,
    key: jax.Array,
) -> DPMFState:
    """Resample all precisions from their Gamma posteriors (model.cc:335-348).

    sse_train is the SUM of squared errors over the (sampled) training set —
    the reference passes calc_mse's raw sum, not the mean (model.cc:302,336).
    """
    theta, phi, bu, bv, _ = state.params
    nu = theta.shape[0]
    nv = phi.shape[0]
    kr, kub, kvb, ku, kv = jax.random.split(key, 5)

    lambda_r = gamma_posterior(kr, hyper_a, hyper_b, sse_train, ntrain)
    lambda_ub = gamma_posterior(
        kub, hyper_a, hyper_b, jnp.sum(bu.astype(jnp.float32) ** 2), nu
    )
    lambda_vb = gamma_posterior(
        kvb, hyper_a, hyper_b, jnp.sum(bv.astype(jnp.float32) ** 2), nv
    )
    # Column squared norms (reference: normsqr_col, util.h:156-161)
    normu = jnp.sum(theta.astype(jnp.float32) ** 2, axis=0)
    normv = jnp.sum(phi.astype(jnp.float32) ** 2, axis=0)
    lambda_u = gamma_posterior(ku, hyper_a, hyper_b, normu, float(nu))
    lambda_v = gamma_posterior(kv, hyper_a, hyper_b, normv, float(nv))

    return state._replace(
        lambda_r=lambda_r.astype(jnp.float32),
        lambda_ub=lambda_ub.astype(jnp.float32),
        lambda_vb=lambda_vb.astype(jnp.float32),
        lambda_u=lambda_u.astype(jnp.float32),
        lambda_v=lambda_v.astype(jnp.float32),
    )
