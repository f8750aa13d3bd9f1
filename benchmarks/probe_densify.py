"""Why did the on-device densify take 1285 s (bench_dense, 2026-08-20)?

Splits compile vs run for the COO scatter-add and tries the two standard
XLA scatter accelerators: host-sorted indices (indices_are_sorted) and
host-deduped unique indices (unique_indices). Also times a segment-sum
formulation (device sort + unique placement).

Usage: python benchmarks/probe_densify.py [--n 10000000]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import calibrated_ml10m  # noqa: E402


def t(fn, *a, **k):
    t0 = time.perf_counter()
    out = fn(*a, **k)
    return out, time.perf_counter() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu_mf.ops.pallas_sgd_dense import prepare_dense

    ds = calibrated_ml10m()
    if args.n < len(ds):
        from tpu_mf.data.coo import RatingsCOO

        ds = RatingsCOO(u=ds.u[: args.n], v=ds.v[: args.n],
                        r=ds.r[: args.n], nu=ds.nu, nv=ds.nv)
    plan = prepare_dense(ds)
    total = plan.n_gu * plan.n_gvp * plan.tile_u * plan.tile_v
    out = {"n": len(ds), "total": total}

    @functools.partial(jax.jit, static_argnames=("sorted_", "unique"))
    def scat(flat, vals, *, sorted_=False, unique=False):
        z = jnp.zeros((total,), jnp.float32)
        return z.at[flat].add(
            vals, indices_are_sorted=sorted_, unique_indices=unique
        ).astype(jnp.bfloat16)

    def run(label, flat_np, vals_np, **kw):
        flat = jnp.asarray(flat_np)
        vals = jnp.asarray(vals_np)
        jax.block_until_ready((flat, vals))
        x, dt_c = t(lambda: jax.block_until_ready(scat(flat, vals, **kw)))
        del x
        x, dt_r = t(lambda: jax.block_until_ready(scat(flat, vals, **kw)))
        del x
        out[label] = {"first_s": round(dt_c, 2), "second_s": round(dt_r, 2)}
        print(json.dumps({label: out[label]}), flush=True)

    r = plan.r
    run("scatter_raw", plan.flat, r)

    _, dt = t(np.argsort, plan.flat, kind="stable")
    order = np.argsort(plan.flat, kind="stable")
    fs, rs = plan.flat[order], r[order]
    out["host_sort_s"] = round(dt, 2)
    run("scatter_sorted", fs, rs, sorted_=True)

    t0 = time.perf_counter()
    uniq, start = np.unique(fs, return_index=True)
    sums = np.add.reduceat(rs.astype(np.float64), start).astype(np.float32)
    out["host_dedup_s"] = round(time.perf_counter() - t0, 2)
    out["n_unique"] = int(len(uniq))
    pad = ((len(uniq) + 1023) // 1024) * 1024 - len(uniq)
    uniq_p = np.concatenate([uniq, np.full(pad, total, np.int64)])
    sums_p = np.concatenate([sums, np.zeros(pad, np.float32)])
    run("scatter_unique", uniq_p.astype(np.int32), sums_p,
        sorted_=True, unique=True)

    # segment-sum formulation: dense one-shot via jnp.zeros().at[].set on
    # unique positions (set, not add — no combiner)
    @jax.jit
    def scat_set(flat, vals):
        z = jnp.zeros((total,), jnp.float32)
        return z.at[flat].set(
            vals, indices_are_sorted=True, unique_indices=True
        ).astype(jnp.bfloat16)

    flat_d = jnp.asarray(uniq_p.astype(np.int32))
    vals_d = jnp.asarray(sums_p)
    jax.block_until_ready((flat_d, vals_d))
    _, dt1 = t(lambda: jax.block_until_ready(scat_set(flat_d, vals_d)))
    _, dt2 = t(lambda: jax.block_until_ready(scat_set(flat_d, vals_d)))
    out["scatter_set_unique"] = {"first_s": round(dt1, 2),
                                 "second_s": round(dt2, 2)}
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
