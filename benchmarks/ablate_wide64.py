"""Wide-stream resident experiment for rank 64 (round-3 ablation follow-up).

The rank-64 ablation (ablate_homog64.py) measured the id/rating stream
reads at ~25% of the step and the per-step floor (theta tile round trips +
grid) at ~30%. This experiment attacks both:

* STREAMS: 16 batches' (sub, 8) blocks re-packed host-side into ONE dense
  (sub, 128) block (and (128, sub) for the transposed ids) — the DMA goes
  from 16x-strided 32-byte rows to dense 512-byte rows.
* FLOOR: both tables fully VMEM-resident (mega-style), one grid step per
  16 batches, the batch loop unrolled in Python so the per-batch stream
  slices are static lane/sublane windows.
* Optional MXU pred (ones-matmul instead of the VPU lane reduction):
  variant "widemxu".

Usage: ablate_wide64.py [wide|widemxu] [TILE] [BATCH] [N] [G]
G < 16 widens the stream minor to 8G lanes only (partially strided DMA but
a much shorter unroll; G=16 is fully dense and compiles very slowly).
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
from tpu_mf.ops.pallas_sgd import (
    LANES,
    UV_BASE,
    UV_SHIFT,
    PallasEpochRunner,
    fuse_rows,
    split_params,
)

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "wide"
TILE = int(sys.argv[2]) if len(sys.argv) > 2 else 384
BATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
N = int(sys.argv[4]) if len(sys.argv) > 4 else 10_000_000
G = int(sys.argv[5]) if len(sys.argv) > 5 else 4
DIM = 64


def kernel(gu_ref, gv_ref, hyper_ref,
           uv_ref, uvt_ref, r_ref, theta_hbm, phi_hbm,
           theta_out, phi_out, sem_t, sem_p,
           *, tile_u, tile_v, batch, dim, lanes, mxu_dtype, mxupred):
    eta = hyper_ref[0]
    lam = hyper_ref[1]
    gb = hyper_ref[2]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cpt = pltpu.make_async_copy(theta_hbm, theta_out, sem_t)
        cpp = pltpu.make_async_copy(phi_hbm, phi_out, sem_p)
        cpt.start()
        cpp.start()
        cpt.wait()
        cpp.wait()

    sub = batch // 8
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    m_cnt = (lane == dim + 2).astype(jnp.float32)
    m_keep_u = (lane <= dim).astype(jnp.float32)
    m_one_u = (lane == dim + 1).astype(jnp.float32)
    m_keep_v = ((lane < dim) | (lane == dim + 1)).astype(jnp.float32)
    m_one_v = (lane == dim).astype(jnp.float32)
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (sub, tile_u), 1)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (sub, tile_v), 1)
    iota_ut = jax.lax.broadcasted_iota(jnp.int32, (tile_u, sub), 0)
    iota_vt = jax.lax.broadcasted_iota(jnp.int32, (tile_v, sub), 0)
    lameta = 1.0 - eta * lam
    ln_lameta = jnp.log(lameta)
    if mxupred:
        ones = jnp.ones((lanes, lanes), jnp.float32)

    uv_all = uv_ref[0]    # (sub, 128) = 16 batches x 8 columns
    uvt_all = uvt_ref[0]  # (128, sub)
    r_all = r_ref[0]

    for g in range(G):
        b = i * G + g
        off_u = pl.multiple_of(gu_ref[b] * tile_u, tile_u)
        theta = theta_out[pl.ds(off_u, tile_u), :]
        uv3 = uv_all[:, g * 8 : (g + 1) * 8]
        uvt3 = uvt_all[g * 8 : (g + 1) * 8, :]
        r3 = r_all[:, g * 8 : (g + 1) * 8]
        u3 = uv3 >> UV_SHIFT
        v3 = uv3 & (UV_BASE - 1)
        ut3 = uvt3 >> UV_SHIFT
        vt3 = uvt3 & (UV_BASE - 1)
        w3 = (uv3 != tile_u * UV_BASE + tile_v).astype(jnp.float32)

        theta_mx = theta.astype(mxu_dtype)
        d_theta_g = jnp.zeros((tile_u, lanes), jnp.float32)
        for k in range(8):
            off = pl.multiple_of(gv_ref[8 * b + k] * tile_v, tile_v)
            phi = phi_out[pl.ds(off, tile_v), :]
            phi_mx = phi.astype(mxu_dtype)
            oh_u = (iota_u == u3[:, k : k + 1]).astype(mxu_dtype)
            oh_v = (iota_v == v3[:, k : k + 1]).astype(mxu_dtype)
            oht_u = (iota_ut == ut3[k : k + 1, :]).astype(mxu_dtype)
            oht_v = (iota_vt == vt3[k : k + 1, :]).astype(mxu_dtype)
            t = jnp.dot(oh_u, theta_mx, preferred_element_type=jnp.float32)
            p = jnp.dot(oh_v, phi_mx, preferred_element_type=jnp.float32)
            wk = w3[:, k : k + 1]
            if mxupred:
                pred = jnp.dot(
                    t * p, ones, preferred_element_type=jnp.float32
                ) + gb
            else:
                pred = jnp.sum(t * p, axis=1, keepdims=True) + gb
            err = (eta * wk) * (r3[:, k : k + 1] - pred)
            rhs_u = (err * p + wk * m_cnt).astype(mxu_dtype)
            rhs_v = (err * t + wk * m_cnt).astype(mxu_dtype)
            d_theta_g += jnp.dot(
                oht_u, rhs_u, preferred_element_type=jnp.float32
            )
            d_phi = jnp.dot(oht_v, rhs_v, preferred_element_type=jnp.float32)
            k_v = jnp.sum(d_phi * m_cnt, axis=1, keepdims=True)
            phi_out[pl.ds(off, tile_v), :] = (
                phi * jnp.exp(k_v * ln_lameta) + d_phi
            ) * m_keep_v + m_one_v

        k_u = jnp.sum(d_theta_g * m_cnt, axis=1, keepdims=True)
        theta_out[pl.ds(off_u, tile_u), :] = (
            theta * jnp.exp(k_u * ln_lameta) + d_theta_g
        ) * m_keep_u + m_one_u


@functools.partial(jax.jit, donate_argnums=(0, 1), static_argnames=(
    "tile_u", "tile_v", "batch", "dim", "n_gu", "n_gv", "mxupred"))
def run(theta_p, phi_p, gu, gv, uvw, uvtw, rw, hyper,
        *, tile_u, tile_v, batch, dim, n_gu, n_gv, mxupred):
    nbg = uvw.shape[0]
    gv = gv.reshape(-1)
    lanes = LANES
    k = functools.partial(
        kernel, tile_u=tile_u, tile_v=tile_v, batch=batch, dim=dim,
        lanes=lanes, mxu_dtype=jnp.bfloat16, mxupred=mxupred)
    sub = batch // 8
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(nbg,),
        in_specs=[
            pl.BlockSpec((1, sub, 8 * G), lambda i, a, b, h: (i, 0, 0)),
            pl.BlockSpec((1, 8 * G, sub), lambda i, a, b, h: (i, 0, 0)),
            pl.BlockSpec((1, sub, 8 * G), lambda i, a, b, h: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),   # theta
            pl.BlockSpec(memory_space=pl.ANY),   # phi
        ],
        out_specs=[
            pl.BlockSpec((n_gu * tile_u, lanes), lambda i, a, b, h: (0, 0)),
            pl.BlockSpec((n_gv * tile_v, lanes), lambda i, a, b, h: (0, 0)),
        ],
        scratch_shapes=[pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        k, grid_spec=gs,
        out_shape=[jax.ShapeDtypeStruct((n_gu * tile_u, lanes), jnp.float32),
                   jax.ShapeDtypeStruct((n_gv * tile_v, lanes), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        input_output_aliases={6: 0, 7: 1},
    )(gu, gv, hyper, uvw, uvtw, rw, theta_p, phi_p)


def main():
    nu, nv = 69_878, 10_677
    ds = synthetic_ratings(nu, nv, N, rank=8, noise=0.1, seed=0)
    params = init_mf(jax.random.PRNGKey(0), nu, nv, DIM, gb=ds.mean_rating())
    base = PallasEpochRunner(
        ds, tile_u=TILE, tile_v=TILE, batch=BATCH, seed=1,
        theta_groups=8, phi_groups=8,
    )
    plan = base.plan
    nb = plan.u.shape[0]
    nbg = nb // G * G  # drop the ragged tail for the experiment
    sub = BATCH // 8
    uv = (plan.u * UV_BASE + plan.v)[:nbg]
    # (nb, sub, 8) -> (nb/G, sub, 8G): G consecutive batches side by side
    uvw = np.ascontiguousarray(
        uv.reshape(nbg // G, G, sub, 8).transpose(0, 2, 1, 3).reshape(
            nbg // G, sub, 8 * G)
    )
    uvtw = np.ascontiguousarray(
        np.swapaxes(uv, 1, 2).reshape(nbg // G, G * 8, sub)
    )
    rw = np.ascontiguousarray(
        plan.r[:nbg].reshape(nbg // G, G, sub, 8).transpose(0, 2, 1, 3)
        .reshape(nbg // G, sub, 8 * G)
    )
    gu = jnp.asarray(plan.gu[:nbg])
    gvv = jnp.asarray(plan.gv[:nbg])
    n_real = int(plan.w[:nbg].sum())

    theta_p = fuse_rows(params.theta, params.bu, plan.n_gu * TILE, LANES, "u")
    phi_p = fuse_rows(params.phi, params.bv, plan.n_gv * TILE, LANES, "v")
    hyper = jnp.asarray([0.02, 5e-3, float(params.gb)], jnp.float32)
    kw = dict(tile_u=TILE, tile_v=TILE, batch=BATCH, dim=DIM,
              n_gu=plan.n_gu, n_gv=plan.n_gv,
              mxupred=(VARIANT == "widemxu"))
    uvw_d, uvtw_d, rw_d = map(jnp.asarray, (uvw, uvtw, rw))
    theta_p, phi_p = run(theta_p, phi_p, gu, gvv, uvw_d, uvtw_d, rw_d,
                         hyper, **kw)
    _ = float(jnp.sum(theta_p))
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        theta_p, phi_p = run(theta_p, phi_p, gu, gvv, uvw_d, uvtw_d, rw_d,
                             hyper, **kw)
    _ = float(jnp.sum(theta_p))
    dt = (time.perf_counter() - t0) / reps
    out = split_params(theta_p, phi_p, nu, nv, DIM, float(params.gb))
    ok = bool(jnp.isfinite(out.theta).all())
    print(f"{VARIANT:8s} dim={DIM} t={TILE} B={BATCH} G={G}: "
          f"{n_real/dt/1e6:7.1f}M/s  {dt*1e6/nbg:6.2f}us/batch  "
          f"nb={nbg} finite={ok}")


if __name__ == "__main__":
    main()
