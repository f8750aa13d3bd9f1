"""Validate the band-segmented slot-kernel cost model on the MXU.

The gen-4 slot column gathers with ONE (sub, tile)@(tile, 128) matmul
(tile=1024 -> 8 K-passes). The gen-5 idea splits the column into Q sublane
segments, each contracting over its own 256-row band of the resident table
(K=256 -> 2 passes), at dynamic multiple-of-256 offsets. Same math when the
one-hots are band-local. This probe times the two shapes in isolation
(plus the narrow one-hot builds with sub-128 lane concats) to check:

  * Q x (sub/Q, 256)@(256, 128) with dynamic offsets really runs ~4x
    faster than (sub, 1024)@(1024, 128) (MXU time ~ M*ceil(K/128));
  * small-M matmuls (M=56) don't hit a latency wall;
  * 32-lane-boundary one-hot concats (roll+select) are affordable.

Usage: probe_segmm.py VARIANT [SUB] [Q] — variants: wide, seg, wideoh, segoh
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "wide"
SUB = int(sys.argv[2]) if len(sys.argv) > 2 else 224
Q = int(sys.argv[3]) if len(sys.argv) > 3 else 4
TILE = 1024
BAND = TILE // Q
P = 8
REPS = 200          # inner loop per grid step to swamp the floor
NB = 64


def kernel(off_ref, ids_ref, tab_ref, out_ref, *, variant, sub, q):
    tab = tab_ref[:]                     # (TILE, 128) resident "phi tile"
    acc = jnp.zeros((sub, 128), jnp.float32)
    ids = ids_ref[0]                     # (sub, 8) int32 band-local ids
    i = pl.program_id(0)
    for rep in range(REPS):
        if variant == "wide":
            # one wide gather: prebuilt one-hot would hide the compare
            # cost; build it (128-aligned concat, rows=128) like gen-4.
            iota = jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 1)
            oh = jnp.concatenate(
                [(iota == ids[:, j : j + 1] + 0 * rep).astype(jnp.bfloat16)
                 for j in range(P)],
                axis=1,
            )                             # (sub, 1024)
            acc += jnp.dot(oh, tab.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        elif variant == "seg":
            # Q band-local gathers at dynamic multiple-of-BAND offsets;
            # rows per slot inside a band = BAND // P (32 at Q=4).
            rows = BAND // P
            sq = sub // q
            iota = jax.lax.broadcasted_iota(jnp.int32, (sq, rows), 1)
            parts = []
            for s in range(q):
                off = pl.multiple_of(off_ref[i * q + s] * BAND, BAND)
                band = tab_ref[pl.ds(off, BAND), :].astype(jnp.bfloat16)
                seg_ids = ids[s * sq : (s + 1) * sq, :]
                oh = jnp.concatenate(
                    [(iota == seg_ids[:, j : j + 1] % rows + 0 * rep
                      ).astype(jnp.bfloat16) for j in range(P)],
                    axis=1,
                )                         # (sq, BAND) concat at rows-lanes
                parts.append(jnp.dot(oh, band,
                                     preferred_element_type=jnp.float32))
            acc += jnp.concatenate(parts, axis=0)
        elif variant == "mm":
            # matmul ONLY (prebuilt constant one-hot): wide
            oh = (jax.lax.broadcasted_iota(jnp.int32, (sub, TILE), 1)
                  == (ids[:, 0:1] + rep % 7)).astype(jnp.bfloat16)
            acc += jnp.dot(oh, tab.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        elif variant == "segmm":
            rows = BAND // P
            sq = sub // q
            parts = []
            for s in range(q):
                off = pl.multiple_of(off_ref[i * q + s] * BAND, BAND)
                band = tab_ref[pl.ds(off, BAND), :].astype(jnp.bfloat16)
                oh = (jax.lax.broadcasted_iota(jnp.int32, (sq, BAND), 1)
                      == (ids[s * sq : (s + 1) * sq, 0:1] + rep % 7)
                      ).astype(jnp.bfloat16)
                parts.append(jnp.dot(oh, band,
                                     preferred_element_type=jnp.float32))
            acc += jnp.concatenate(parts, axis=0)
    out_ref[:] = acc


def main():
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 128, (NB, SUB, 8)), jnp.int32)
    offs = jnp.asarray(rng.integers(0, Q, (NB * Q,)), jnp.int32)
    tab = jnp.asarray(rng.normal(size=(TILE, 128)), jnp.float32)

    body = functools.partial(kernel, variant=VARIANT, sub=SUB, q=Q)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, SUB, 8), lambda i, o: (i, 0, 0)),
            pl.BlockSpec((TILE, 128), lambda i, o: (0, 0)),
        ],
        out_specs=pl.BlockSpec((SUB, 128), lambda i, o: (0, 0)),
    )
    run = jax.jit(lambda o, i, t: pl.pallas_call(
        body, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((SUB, 128), jnp.float32),
    )(o, i, t))
    out = run(offs, ids, tab)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(5):
        out = run(offs, ids, tab)
    _ = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / 5
    per = dt / (NB * REPS) * 1e9
    print(f"{VARIANT:6s} sub={SUB} Q={Q}: {per:8.1f} ns/gather "
          f"({per / SUB * 8:.3f} ns per slot-equivalent)", flush=True)


if __name__ == "__main__":
    main()
