"""Slot-major fused SGLD kernel (ops/pallas_sgld_slot.py), interpret mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.models.dpmf import init_dpmf
from tpu_mf.models.mf import calc_mse, rmse
from tpu_mf.ops.pallas_sgld_slot import (
    SlotSgldRunner,
    pack_sgld_slot,
    sgld_slot_eligible,
    sgld_slot_pack,
    unpack_sgld_slot,
)
from tpu_mf.ops.sgld import SgldHyper, sgld_batch_update


def batch_ratings(plan, b):
    """Global (u, v, r) triples of one slot-plan batch."""
    P = plan.pack
    rows_u = plan.tile_u // P
    rows_v = plan.tile_v // P
    us, vs, rs = [], [], []
    for s in range(plan.u.shape[1]):
        for lane in range(8 * P):
            ul = plan.u[b, s, lane]
            if ul == rows_u:
                continue
            k, j = lane // P, lane % P
            d = k % P
            u = plan.gu[b] * plan.tile_u + j + P * ul
            v = (plan.gv[b, k] * plan.tile_v + ((j + d) % P)
                 + P * plan.v[b, s, lane])
            us.append(u)
            vs.append(v)
            rs.append(plan.r[b, s, lane])
    return (np.asarray(us, np.int32), np.asarray(vs, np.int32),
            np.asarray(rs, np.float32))


def test_slot_sgld_matches_xla_batchwise_temp0():
    """temp=0: the slot SGLD kernel's batch-granular semantics == the XLA
    sgld_batch_update replayed once per slot batch."""
    ds = synthetic_ratings(300, 200, 4000, rank=3, seed=0)
    state = init_dpmf(jax.random.PRNGKey(0), ds, 8)
    eta, temp, bound = 1e-5, 0.0, 1.0
    ntrain = float(len(ds))
    scal = eta * ntrain * bound * float(state.lambda_r)

    runner = SlotSgldRunner(
        ds, sub=16, seed=1, mxu="float32", interpret=True, dim=8, tile=64,
        noise_every=1,  # stamp-freshness assertions below need per-apply
    )
    tables = runner.pad(state)
    tables = runner.epoch(
        tables, 0, (eta, temp, bound, scal, float(state.params.gb)),
        noise_seed=7,
    )
    out = runner.unpack(state, tables)

    hyper = SgldHyper(
        eta=jnp.float32(eta), temp=jnp.float32(temp),
        bound=jnp.float32(bound), ntrain=jnp.float32(ntrain),
    )
    ref = init_dpmf(jax.random.PRNGKey(0), ds, 8)
    plan = runner.plan
    for b in range(plan.u.shape[0]):
        u, v, r = batch_ratings(plan, b)
        if len(u) == 0:
            continue
        batch = (
            jnp.asarray(u), jnp.asarray(v), jnp.asarray(r),
            jnp.ones(len(u), jnp.float32),
        )
        ref = sgld_batch_update(
            ref, batch, hyper, jax.random.fold_in(jax.random.PRNGKey(9), b)
        )

    np.testing.assert_allclose(
        np.asarray(out.params.theta), np.asarray(ref.params.theta), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.params.phi), np.asarray(ref.params.phi), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.params.bu), np.asarray(ref.params.bu), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.params.bv), np.asarray(ref.params.bv), atol=3e-5
    )
    # stamps are batch-granular on both sides; clock conventions differ by
    # less than one batch
    bsz = plan.u[0].size
    du = np.abs(np.asarray(out.gcountu[:-1]) - np.asarray(ref.gcountu[:-1]))
    assert du.max() <= bsz
    assert int(out.gcount) == int(ref.gcount) == len(ds)


def test_slot_sgld_counters_roundtrip():
    ds = synthetic_ratings(200, 150, 2500, rank=3, seed=2)
    state = init_dpmf(jax.random.PRNGKey(1), ds, 8)
    state = state._replace(
        gcountu=state.gcountu.at[:].set(12345),
        gcountv=state.gcountv.at[:].set(67),
    )
    runner = SlotSgldRunner(
        ds, sub=16, seed=3, mxu="float32", interpret=True, dim=8, tile=64,
    )
    t, p = pack_sgld_slot(state, runner.plan)
    back = unpack_sgld_slot(state, t, p, runner.plan, 0)
    np.testing.assert_array_equal(
        np.asarray(back.gcountu[: ds.nu]), 12345
    )
    np.testing.assert_array_equal(np.asarray(back.gcountv[: ds.nv]), 67)
    np.testing.assert_allclose(
        np.asarray(back.params.theta), np.asarray(state.params.theta),
        atol=0,
    )
    np.testing.assert_allclose(
        np.asarray(back.ur), np.asarray(state.ur), atol=0
    )


def test_slot_sgld_balance_roundtrip():
    """LPT-balanced relabeling: pad/unpack must invert the id maps for
    factors, biases, AND the split-lane noise counters."""
    ds = synthetic_ratings(200, 150, 2500, rank=3, seed=2, zipf=1.2)
    state = init_dpmf(jax.random.PRNGKey(1), ds, 8)
    rng = np.random.default_rng(0)
    state = state._replace(
        gcountu=jnp.asarray(rng.integers(0, 9999, ds.nu), jnp.int32),
        gcountv=jnp.asarray(rng.integers(0, 9999, ds.nv), jnp.int32),
    )
    runner = SlotSgldRunner(
        ds, sub=16, seed=3, mxu="float32", interpret=True, dim=8, tile=64,
        balance=True,
    )
    assert runner._map_u is not None
    tables = runner.pad(state)
    back = runner.unpack(state, tables)
    np.testing.assert_array_equal(
        np.asarray(back.gcountu[: ds.nu]), np.asarray(state.gcountu[: ds.nu])
    )
    np.testing.assert_array_equal(
        np.asarray(back.gcountv[: ds.nv]), np.asarray(state.gcountv[: ds.nv])
    )
    np.testing.assert_allclose(
        np.asarray(back.params.theta), np.asarray(state.params.theta), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(back.params.phi), np.asarray(state.params.phi), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(back.params.bu), np.asarray(state.params.bu), atol=0
    )


def test_slot_sgld_converges_with_gibbs():
    ds = synthetic_ratings(400, 250, 20000, rank=3, noise=0.1, seed=4)
    train, test = ds.split(0.2, seed=5)
    state = init_dpmf(jax.random.PRNGKey(1), train, 8, gb=ds.mean_rating())
    runner = SlotSgldRunner(
        train, sub=16, seed=7, mxu="float32", interpret=True, dim=8, tile=64,
    )
    from tpu_mf.ops.gibbs import sample_hyper
    from tpu_mf.ops.sgld import finish_noise

    ntrain = len(train)
    eta0, temp, bound = 5e-6, 0.0, 1.0
    for rnd in range(1, 7):
        eta = eta0 / rnd**0.2
        scal = eta * ntrain * bound * float(state.lambda_r)
        tables = runner.pad(state)
        tables = runner.epoch(
            tables, int(state.gcount),
            (eta, temp, bound, scal, float(state.params.gb)),
            noise_seed=rnd * 100_000, epoch_idx=rnd - 1,
        )
        state = runner.unpack(state, tables)
        state = finish_noise(
            state, jnp.float32(eta), jnp.float32(temp),
            jax.random.PRNGKey(rnd),
        )
        mse = calc_mse(state.params, train.u, train.v, train.r)
        state = sample_hyper(
            state, jnp.float32(mse * ntrain), jnp.float32(ntrain),
            jnp.float32(1.0), jnp.float32(2000.0),
            jax.random.PRNGKey(rnd + 50),
        )
    final = rmse(state.params, test)
    assert np.isfinite(final) and final < 0.8, f"slot SGLD diverged: {final}"


def _run_rounds(runner, state, eta, rounds=3, temp=0.0, bound=1.0):
    ntrain = runner.n_real
    for rnd in range(1, rounds + 1):
        scal = eta * ntrain * bound * float(state.lambda_r)
        tables = runner.pad(state)
        tables = runner.epoch(
            tables, int(state.gcount),
            (eta, temp, bound, scal, float(state.params.gb)),
            noise_seed=rnd * 1000, epoch_idx=rnd - 1,
        )
        state = runner.unpack(state, tables)
    return state


def test_slot_sgld_saturate_noop_when_cap_clears():
    """With eta small enough that cap = 0.2/scal exceeds every batch
    duplicate count, saturate=True must be bitwise-identical to off."""
    ds = synthetic_ratings(300, 200, 4000, rank=3, seed=0)
    outs = []
    for saturate in (False, True):
        state = init_dpmf(jax.random.PRNGKey(0), ds, 8)
        runner = SlotSgldRunner(
            ds, sub=16, seed=1, mxu="float32", interpret=True, dim=8,
            tile=64, saturate=saturate,
        )
        outs.append(_run_rounds(runner, state, eta=1e-6, rounds=2))
    np.testing.assert_array_equal(
        np.asarray(outs[0].params.theta), np.asarray(outs[1].params.theta)
    )
    np.testing.assert_array_equal(
        np.asarray(outs[0].params.phi), np.asarray(outs[1].params.phi)
    )


def test_slot_sgld_saturate_bounds_head_rows():
    """Zipfy marginals concentrate a head row's ratings into one batch
    (k >> cap); unsaturated batch application diverges at an eta where the
    saturated kernel must stay finite and fit."""
    ds = synthetic_ratings(300, 120, 30000, rank=3, noise=0.1, seed=6,
                           zipf=1.4)
    # scal = 0.1: inside the ALGORITHM's stability envelope (the sequential
    # reference loop converges; loop.py docstring says keep scal < ~0.1) but
    # far outside the batch window's (head rows take k ~ hundreds stale
    # gradients per batch, k*scal >> 1) — exactly what saturation bounds.
    eta = 0.1 / 30000
    finals = {}
    for saturate in (False, True):
        state = init_dpmf(jax.random.PRNGKey(2), ds, 8, gb=ds.mean_rating())
        runner = SlotSgldRunner(
            ds, sub=16, seed=9, mxu="float32", interpret=True, dim=8,
            tile=64, saturate=saturate,
        )
        assert runner.envelope_ok(eta * len(ds)) == saturate
        state = _run_rounds(runner, state, eta=eta, rounds=3)
        finals[saturate] = float(
            calc_mse(state.params, ds.u, ds.v, ds.r) ** 0.5
        )
    assert np.isfinite(finals[True]) and finals[True] < 1.0, finals
    assert (not np.isfinite(finals[False])) or finals[False] > finals[True]


def test_slot_sgld_noise_cadence_invariant_at_temp0():
    """noise_every only changes WHEN noise/stamps are injected; at temp=0
    the factors must be identical across cadences and stamps must lag by at
    most noise_every batches' worth of ratings."""
    ds = synthetic_ratings(300, 200, 4000, rank=3, seed=0)
    outs = []
    for ne in (1, 4):
        state = init_dpmf(jax.random.PRNGKey(0), ds, 8)
        runner = SlotSgldRunner(
            ds, sub=16, seed=1, mxu="float32", interpret=True, dim=8,
            tile=64, noise_every=ne,
        )
        state = _run_rounds(runner, state, eta=1e-6, rounds=1)
        outs.append((state, runner.plan.u[0].size))
    (s1, bsz), (s4, _) = outs
    # ulp-level tolerance: the ne=1 (single apply body) and ne>1 (dual
    # pl.when bodies) kernels compile to differently-fused float graphs
    np.testing.assert_allclose(
        np.asarray(s1.params.theta), np.asarray(s4.params.theta), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(s1.params.phi), np.asarray(s4.params.phi), atol=1e-7
    )
    lag = np.abs(
        np.asarray(s1.gcountu[:-1]).astype(np.int64)
        - np.asarray(s4.gcountu[:-1]).astype(np.int64)
    )
    assert lag.max() <= 4 * bsz


def test_slot_sgld_eligibility():
    assert sgld_slot_pack(8) == 8
    assert sgld_slot_pack(26) == 4
    assert sgld_slot_pack(58) == 2
    assert sgld_slot_pack(64) == 1
    s = init_dpmf(
        jax.random.PRNGKey(0), synthetic_ratings(500, 300, 2000, seed=0), 8
    )
    assert sgld_slot_eligible(s, 10_000_000)


# ---------------------------------------------------------------------------
# Delta-striped SGLD slot plans (round 4)


def batch_ratings_stripe(plan, b):
    """Global (u, v, r) triples of one STRIPED slot-plan batch: row segment
    s carries delta class s; a rating's v id sits at its own slot's lane."""
    P = plan.pack
    rows_u = plan.tile_u // P
    seg = plan.u.shape[1] // P
    us, vs, rs = [], [], []
    for row in range(plan.u.shape[1]):
        s = row // seg
        for lane in range(8 * P):
            ul = plan.u[b, row, lane]
            if ul == rows_u:
                continue
            k, j = lane // P, lane % P
            jv = (j + s) % P
            u = plan.gu[b] * plan.tile_u + j + P * ul
            v = (plan.gv[b, k] * plan.tile_v + jv
                 + P * plan.v[b, row, k * P + jv])
            us.append(u)
            vs.append(v)
            rs.append(plan.r[b, row, lane])
    return (np.asarray(us, np.int32), np.asarray(vs, np.int32),
            np.asarray(rs, np.float32))


def test_stripe_sgld_matches_xla_batchwise_temp0():
    """temp=0 parity of the STRIPED slot SGLD kernel vs the XLA batch
    update replayed over the striped plan's own batches."""
    ds = synthetic_ratings(300, 200, 4000, rank=3, seed=0)
    state = init_dpmf(jax.random.PRNGKey(0), ds, 8)
    eta, temp, bound = 1e-5, 0.0, 1.0
    ntrain = float(len(ds))
    scal = eta * ntrain * bound * float(state.lambda_r)

    runner = SlotSgldRunner(
        ds, sub=16, seed=1, mxu="float32", interpret=True, dim=8, tile=64,
        noise_every=1, striped=True,
    )
    tables = runner.pad(state)
    tables = runner.epoch(
        tables, 0, (eta, temp, bound, scal, float(state.params.gb)),
        noise_seed=7,
    )
    out = runner.unpack(state, tables)

    hyper = SgldHyper(
        eta=jnp.float32(eta), temp=jnp.float32(temp),
        bound=jnp.float32(bound), ntrain=jnp.float32(ntrain),
    )
    ref = init_dpmf(jax.random.PRNGKey(0), ds, 8)
    plan = runner.plan
    n_seen = 0
    for b in range(plan.u.shape[0]):
        u, v, r = batch_ratings_stripe(plan, b)
        n_seen += len(u)
        if len(u) == 0:
            continue
        batch = (
            jnp.asarray(u), jnp.asarray(v), jnp.asarray(r),
            jnp.ones(len(u), jnp.float32),
        )
        ref = sgld_batch_update(
            ref, batch, hyper, jax.random.fold_in(jax.random.PRNGKey(9), b)
        )
    assert n_seen == len(ds)

    np.testing.assert_allclose(
        np.asarray(out.params.theta), np.asarray(ref.params.theta), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.params.phi), np.asarray(ref.params.phi), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.params.bu), np.asarray(ref.params.bu), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.params.bv), np.asarray(ref.params.bv), atol=3e-5
    )
    assert int(out.gcount) == int(ref.gcount) == len(ds)


def test_sgld_noise_ring_seeded_and_exact_counters():
    """The VMEM noise-ring path (noise_ring=True, the production default):
    deterministic per noise_seed, seed-sensitive on the factor lanes, and
    bitwise-identical gcount stamps to the PRNG path (only the N(0,1)
    source changed — decay/stamp bookkeeping must not move). Runs under
    interpretation (jax.random.normal works there; pltpu.prng does not)."""
    ds = synthetic_ratings(300, 200, 4000, rank=3, seed=2)
    state = init_dpmf(jax.random.PRNGKey(0), ds, 8)
    eta, temp, bound = 1e-5, 1e-3, 1.0
    scal = eta * float(len(ds)) * bound * float(state.lambda_r)
    hyper = (eta, temp, bound, scal, float(state.params.gb))

    def run(noise_ring, seed):
        r = SlotSgldRunner(
            ds, sub=16, seed=1, mxu="float32", interpret=True, dim=8,
            tile=64, noise_every=1, noise_ring=noise_ring,
        )
        t = r.epoch(r.pad(state), 0, hyper, noise_seed=seed)
        return r.unpack(state, t)

    a1 = run(True, 7)
    a2 = run(True, 7)
    b = run(True, 8)
    np.testing.assert_array_equal(a1.params.theta, a2.params.theta)
    np.testing.assert_array_equal(a1.params.phi, a2.params.phi)
    assert np.any(a1.params.theta != b.params.theta)
    # Noise injected at all: factors moved beyond the temp=0 trajectory.
    c = run(True, 7)
    z = SlotSgldRunner(
        ds, sub=16, seed=1, mxu="float32", interpret=True, dim=8,
        tile=64, noise_every=1, noise_ring=True,
    )
    t0 = z.epoch(z.pad(state), 0, (eta, 0.0, bound, scal,
                                   float(state.params.gb)), noise_seed=7)
    z0 = z.unpack(state, t0)
    assert np.any(c.params.theta != z0.params.theta)
    # Stamp/counter bookkeeping identical to the PRNG path (which returns
    # zero noise under interpretation but stamps identically).
    d = run(False, 7)
    np.testing.assert_array_equal(a1.gcountu, d.gcountu)
    np.testing.assert_array_equal(a1.gcountv, d.gcountv)
