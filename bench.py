"""Headline benchmark: rating updates/sec/chip for the fused SGD epoch kernels.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

vs_baseline measures against the BASELINE.json north-star target of 1e9
rating updates/sec/chip on TPU v5e (the reference publishes no numbers of its
own — BASELINE.md). Headline config: an ML-10M-scale problem (nu=69878,
nv=10677, 10M ratings, rank 64 — BASELINE.json configs[2] shape) trained
with the mega-resident fused kernel (tpu_mf/ops/pallas_sgd_mega.py, the
production rank-64 path). "extra" records the rank-8 slot-major kernel
(tpu_mf/ops/pallas_sgd_slot.py) on the same data — the small-rank
production path. Counts only REAL ratings (cell padding excluded). Falls
back to the XLA path off-TPU.
"""

import json
import time


def _time_epochs(runner, params, eta, lam, reps=5):
    import jax.numpy as jnp

    tables = runner.pad(params)
    gb = float(params.gb)
    tables = runner.epoch(tables, eta, lam, gb)  # compile + warm
    _ = float(jnp.sum(tables[0]))
    t0 = time.perf_counter()
    for i in range(reps):
        tables = runner.epoch(tables, eta, lam, gb, epoch_idx=i)
    _ = float(jnp.sum(tables[0]))
    return (time.perf_counter() - t0) / reps


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpu_mf.data.coo import synthetic_ratings
    from tpu_mf.models.mf import init_mf

    nu, nv, dim = 69_878, 10_677, 64
    n = 10_000_000
    ds = synthetic_ratings(nu, nv, n, rank=8, noise=0.1, seed=0)
    eta, lam = 0.02, 5e-3

    on_tpu = jax.default_backend() != "cpu"
    extra = {}
    if on_tpu:
        from tpu_mf.ops.pallas_sgd_mega import MegaEpochRunner
        from tpu_mf.ops.pallas_sgd_slot import SlotEpochRunner

        params = init_mf(jax.random.PRNGKey(0), nu, nv, dim,
                         gb=ds.mean_rating())
        runner = MegaEpochRunner(
            ds, tile_u=384, tile_v=384, batch=8192, seed=1, dim=dim
        )
        dt = _time_epochs(runner, params, eta, lam)
        n_updates = runner.plan.n_real
        name = "mega-fused"
        del runner

        p8 = init_mf(jax.random.PRNGKey(0), nu, nv, 8, gb=ds.mean_rating())
        r8 = SlotEpochRunner(ds, seed=1, dim=8)  # auto tile/sub
        dt8 = _time_epochs(r8, p8, eta, lam)
        extra["rank8_slot_updates_per_s"] = round(r8.plan.n_real / dt8)
    else:
        from tpu_mf.ops.sgd import sgd_epoch

        params = init_mf(jax.random.PRNGKey(0), nu, nv, dim,
                         gb=ds.mean_rating())
        u, v, r, w = ds.to_batches(4096, shuffle_seed=1)
        batches = tuple(jnp.asarray(x) for x in (u, v, r, w))
        params = sgd_epoch(params, batches, jnp.float32(eta), jnp.float32(lam))
        _ = float(jnp.sum(params.theta))
        reps = 2
        t0 = time.perf_counter()
        for _i in range(reps):
            params = sgd_epoch(params, batches, jnp.float32(eta), jnp.float32(lam))
        _ = float(jnp.sum(params.theta))
        dt = (time.perf_counter() - t0) / reps
        n_updates = n
        name = "xla-cpu-fallback"

    ups = n_updates / dt
    out = {
        "metric": (
            f"rating updates/sec/chip (ML-10M scale, rank {dim}, {name})"
        ),
        "value": round(ups),
        "unit": "updates/s",
        "vs_baseline": round(ups / 1e9, 4),
    }
    if extra:
        out["extra"] = extra
    print(json.dumps(out))


if __name__ == "__main__":
    main()
