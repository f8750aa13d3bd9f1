"""Densify probe, round 2: replicate DenseEpochRunner.materialize exactly
at 10M and split upload / compile+run / rerun with forced reads
(float(jnp.sum(...)) — block_until_ready lies through the tunnel).

Variants: raw (production today), host-sorted indices, host-sorted without
the in-cell transpose. Usage: python benchmarks/probe_densify2.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import calibrated_ml10m  # noqa: E402


def main() -> int:
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu_mf.ops.pallas_sgd_dense import _densify_pair, prepare_dense

    ds = calibrated_ml10m()
    plan = prepare_dense(ds)
    kw = dict(n_gu=plan.n_gu, n_gvp=plan.n_gvp, tile_u=plan.tile_u,
              tile_v=plan.tile_v, out_dtype=jnp.bfloat16)
    out = {}

    def force(x):
        return float(jnp.sum(x[0, 0, :8].astype(jnp.float32)))

    def run(label, flat_np, r_np, fn):
        t0 = time.perf_counter()
        flat = jnp.asarray(flat_np)
        rr = jnp.asarray(r_np)
        _ = float(jnp.sum(rr[:8]))
        up = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = fn(flat, rr)
        _ = force(res[0])
        c1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = fn(flat, rr)
        _ = force(res[0])
        c2 = time.perf_counter() - t0
        del res
        out[label] = {"upload_s": round(up, 2), "call1_s": round(c1, 2),
                      "call2_s": round(c2, 2)}
        print(json.dumps({label: out[label]}), flush=True)

    run("raw_pair", plan.flat, plan.r,
        lambda f, r: _densify_pair(f, r, **kw))

    order = np.argsort(plan.flat, kind="stable")
    fs, rs = plan.flat[order], plan.r[order]

    @functools.partial(jax.jit, static_argnames=tuple(kw))
    def pair_sorted(flat, vals, **k):
        total = k["n_gu"] * k["n_gvp"] * k["tile_u"] * k["tile_v"]
        x = jnp.zeros((total,), jnp.float32).at[flat].add(
            vals, indices_are_sorted=True)
        x4 = x.reshape(k["n_gu"], k["n_gvp"], k["tile_u"], k["tile_v"])
        return (x4.astype(k["out_dtype"]),
                jnp.swapaxes(x4, 2, 3).astype(k["out_dtype"]))

    run("sorted_pair", fs, rs, lambda f, r: pair_sorted(f, r, **kw))

    @functools.partial(jax.jit, static_argnames=tuple(kw))
    def one_sorted(flat, vals, **k):
        total = k["n_gu"] * k["n_gvp"] * k["tile_u"] * k["tile_v"]
        x = jnp.zeros((total,), jnp.float32).at[flat].add(
            vals, indices_are_sorted=True)
        x4 = x.reshape(k["n_gu"], k["n_gvp"], k["tile_u"], k["tile_v"])
        return (x4.astype(k["out_dtype"]),)

    run("sorted_noT", fs, rs, lambda f, r: one_sorted(f, r, **kw))
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
