"""Headline benchmark: rating updates/sec/chip for the fused SGD epoch kernel.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline measures against the BASELINE.json north-star target of 1e9
rating updates/sec/chip on TPU v5e (the reference publishes no numbers of its
own — BASELINE.md). Config: an ML-10M-scale problem (nu=69878, nv=10677,
10M ratings, rank 64 — BASELINE.json configs[2]) trained with the fused
Pallas epoch kernel (tpu_mf/ops/pallas_sgd.py); counts only REAL ratings
(cell padding excluded). Falls back to the XLA path off-TPU.
"""

import json
import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpu_mf.data.coo import synthetic_ratings
    from tpu_mf.models.mf import init_mf

    nu, nv, dim = 69_878, 10_677, 64
    n = 10_000_000
    ds = synthetic_ratings(nu, nv, n, rank=8, noise=0.1, seed=0)
    params = init_mf(jax.random.PRNGKey(0), nu, nv, dim, gb=ds.mean_rating())
    eta, lam = 0.02, 5e-3

    on_tpu = jax.default_backend() != "cpu"
    if on_tpu:
        from tpu_mf.ops.pallas_sgd import PallasEpochRunner

        runner = PallasEpochRunner(ds, tile_u=512, tile_v=512, batch=4096, seed=1)
        tables = runner.pad(params)
        gb = float(params.gb)
        tables = runner.epoch(tables, eta, lam, gb)  # compile + warm
        _ = float(jnp.sum(tables[0]))
        reps = 5
        t0 = time.perf_counter()
        for _i in range(reps):
            tables = runner.epoch(tables, eta, lam, gb)
        _ = float(jnp.sum(tables[0]))
        dt = (time.perf_counter() - t0) / reps
        n_updates = runner.plan.n_real
        name = "pallas-fused"
    else:
        from tpu_mf.ops.sgd import sgd_epoch

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
    print(
        json.dumps(
            {
                "metric": (
                    f"rating updates/sec/chip (ML-10M scale, rank {dim}, {name})"
                ),
                "value": round(ups),
                "unit": "updates/s",
                "vs_baseline": round(ups / 1e9, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
