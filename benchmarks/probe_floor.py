"""What's inside the gen-1 empty-step floor (5.26us at t256/B7168)?

Variants measure the per-step fixed cost with different input-stream sets
actually DECLARED in the grid spec (Mosaic DMAs every blocked input whether
or not the body reads it, so ablating reads isn't enough — the spec must
change):

  all       - uv (sub,8) + uvt (8,sub) + r (sub,8) + theta tile   [=empty]
  tonly     - uvt (8,sub) + rt (8,sub) + theta tile (dense-lane streams)
  none      - theta tile only
  tonly_tx  - tonly + in-kernel 8-wide transpose matmuls rebuilding
              (sub,8) uv/r from the transposed copies (the real candidate)

Usage: probe_floor.py VARIANT [TILE] [BATCH] [N]
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

from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.models.mf import init_mf
from tpu_mf.ops.pallas_sgd import UV_BASE, PallasEpochRunner, row_lanes

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "all"
TILE = int(sys.argv[2]) if len(sys.argv) > 2 else 256
BATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 7168
N = int(sys.argv[4]) if len(sys.argv) > 4 else 10_000_000
DIM = 64


def kernel(gu_ref, gv_ref, ap_ref, hyper_ref, *refs, variant, sub, lanes):
    if variant == "all":
        uv_ref, uvt_ref, r_ref, theta_ref, phi_hbm, theta_out, phi_out, acc, sem = refs
    elif variant in ("tonly", "tonly_tx"):
        uvt_ref, rt_ref, theta_ref, phi_hbm, theta_out, phi_out, acc, sem = refs
    else:
        theta_ref, phi_hbm, theta_out, phi_out, acc, sem = refs
    i = pl.program_id(0)
    prev = jnp.maximum(i - 1, 0)
    new_gu = (i == 0) | (gu_ref[i] != gu_ref[prev])

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(phi_hbm, phi_out, sem)
        cp.start()
        cp.wait()

    @pl.when(new_gu)
    def _():
        theta_out[:] = theta_ref[:]

    extra = jnp.float32(0.0)
    if variant == "tonly_tx":
        # Rebuild the (sub, 8) column-sliceable streams from the dense
        # transposed copies with one tiny sublane-contraction matmul each:
        # X^T = dot_general(X (8,sub), I8, contract dim0 x dim0) -> (sub,8).
        eye8 = jnp.eye(8, dtype=jnp.float32)
        dg = (((0,), (0,)), ((), ()))
        uvf = uvt_ref[0].astype(jnp.float32)  # ids < 2^22: exact in f32
        uv3 = jax.lax.dot_general(
            uvf, eye8, dg, preferred_element_type=jnp.float32
        ).astype(jnp.int32)
        r3 = jax.lax.dot_general(
            rt_ref[0], eye8, dg, preferred_element_type=jnp.float32
        )
        extra = (jnp.sum(r3[:, 0:1]) + jnp.sum(uv3[:, 0:1].astype(jnp.float32)))
    elif variant == "tonly":
        extra = jnp.sum(rt_ref[0][0:1, :]) + jnp.sum(
            uvt_ref[0][0:1, :].astype(jnp.float32))
    elif variant == "all":
        extra = (jnp.sum(r_ref[0][:, 0:1]) +
                 jnp.sum(uvt_ref[0][0:1, :].astype(jnp.float32)) +
                 jnp.sum(uv_ref[0][:, 0:1].astype(jnp.float32)))
    # keep `extra` live so nothing is DCE'd
    theta_out[0:1, :] = theta_out[0:1, :] + 0.0 * extra


def main():
    nu, nv = 69_878, 10_677
    ds = synthetic_ratings(nu, nv, N, rank=8, noise=0.1, seed=0)
    params = init_mf(jax.random.PRNGKey(0), nu, nv, DIM, gb=ds.mean_rating())
    r = PallasEpochRunner(ds, tile_u=TILE, tile_v=TILE, batch=BATCH, seed=1)
    plan = r.plan
    lanes = row_lanes(DIM)
    sub = BATCH // 8
    nb = plan.u.shape[0]
    n_gu, n_gv = plan.n_gu, plan.n_gv
    # runner.dev now stores the byte-plane stream; rebuild legacy streams.
    gu, gv = r.dev[0], r.dev[1]
    uv_np = r.plan.u * UV_BASE + r.plan.v
    uv = jnp.asarray(uv_np)
    uvt = jnp.asarray(np.swapaxes(uv_np, 1, 2).copy())
    rr = jnp.asarray(r.plan.r)
    gvf = gv.reshape(-1)
    ap = jnp.ones((nb * 8,), jnp.int32)
    hyper = jnp.asarray([0.02, 5e-3, 3.5], jnp.float32)
    theta, phi = r.pad(params)
    rt = jnp.asarray(np.swapaxes(np.asarray(rr), 1, 2).copy())

    body = functools.partial(kernel, variant=VARIANT, sub=sub, lanes=lanes)
    base_in = [
        pl.BlockSpec((tile_u_b, lanes), lambda i, gu, gv, ap, h: (gu[i], 0))
        for tile_u_b in (TILE,)
    ] + [pl.BlockSpec(memory_space=pl.ANY)]
    if VARIANT == "all":
        in_specs = [
            pl.BlockSpec((1, sub, 8), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 8, sub), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, sub, 8), lambda i, *_: (i, 0, 0)),
        ] + base_in
        ins = (uv, uvt, rr, theta, phi)
    elif VARIANT in ("tonly", "tonly_tx"):
        in_specs = [
            pl.BlockSpec((1, 8, sub), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 8, sub), lambda i, *_: (i, 0, 0)),
        ] + base_in
        ins = (uvt, rt, theta, phi)
    else:
        in_specs = base_in
        ins = (theta, phi)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((TILE, lanes), lambda i, gu, gv, ap, h: (gu[i], 0)),
            pl.BlockSpec((n_gv * TILE, lanes), lambda i, *_: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_gv * TILE, lanes), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    n_in = len(ins)
    alias = {4 + n_in - 2: 0, 4 + n_in - 1: 1}

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run(theta, phi, *ins_rest):
        return pl.pallas_call(
            body,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_gu * TILE, lanes), jnp.float32),
                jax.ShapeDtypeStruct((n_gv * TILE, lanes), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            input_output_aliases=alias,
            interpret=False,
        )(gu, gvf, ap, hyper, *ins_rest, theta, phi)

    ins_rest = ins[:-2]
    th, ph = run(theta, phi, *ins_rest)
    _ = float(jnp.sum(th))
    reps = 10
    t0 = time.perf_counter()
    for _i in range(reps):
        th, ph = run(th, ph, *ins_rest)
    _ = float(jnp.sum(th))
    dt = (time.perf_counter() - t0) / reps
    print(f"{VARIANT:9s} t={TILE} B={BATCH}: {dt/nb*1e6:6.2f}us/step "
          f"({plan.n_real/dt/1e6:.0f}M/s-equivalent) nb={nb}", flush=True)


if __name__ == "__main__":
    main()
