"""Ablation bench for the HOMOGENEOUS-ROW gen-1 kernel at mid rank (64).

Round-3 question: after the homogeneous-row mid-chain fusion, rank-64
throughput only moved 231 -> 237M/s, and fill-corrected per-slot cost is
nearly tile-independent (t256 3.63ns vs t384 3.73ns) — so neither the
mid-chain nor the one-hot/matmul width (both tile-proportional) can be the
whole wall. Each variant below breaks the math to isolate one component
(ablate by SHAPE where possible; constant one-hots are known to re-schedule,
see PERF_NOTES).

  full      - the real homog kernel
  noonehot  - one-hot construction replaced by reused constants
  nogather  - gather matmuls replaced by broadcasts
  noscatter - scatter matmuls replaced by zeros
  nomid     - pred/err/rhs chain minimized (keeps matmuls + one-hots)
  nodecay   - apply without exp/count rowsum
  nostreams - uv/uvt/r blocks never read
  empty     - body only copies theta through

Usage: ablate_homog64.py VARIANT [TILE] [BATCH] [N]
Round-3 addendum: an "mp" prefix composes the MXU-pred mid-chain (now the
production kernel) with each ablation: mp = the new full, mpnoonehot,
mpnogather, mpnoscatter, mpnostreams, mpnodecay.
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
from tpu_mf.ops.pallas_sgd import UV_BASE, UV_SHIFT, PallasEpochRunner, row_lanes

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "full"
MP = VARIANT.startswith("mp")
ABL = VARIANT[2:] if MP else VARIANT
if MP and ABL == "":
    ABL = "full"
TILE = int(sys.argv[2]) if len(sys.argv) > 2 else 384
BATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
N = int(sys.argv[4]) if len(sys.argv) > 4 else 10_000_000
DIM = 64


def kernel(gu_ref, gv_ref, ap_ref, hyper_ref,
           uv_ref, uvt_ref, r_ref, theta_ref, phi_hbm,
           theta_out, phi_out, acc, sem,
           *, tile_u, tile_v, batch, dim, lanes, mxu_dtype, variant,
           mp=False):
    eta = hyper_ref[0]
    lam = hyper_ref[1]
    gb = hyper_ref[2]
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

    if variant == "empty":
        return

    sub = batch // 8
    if variant == "nostreams":
        uv3 = jax.lax.broadcasted_iota(jnp.int32, (sub, 8), 0) % tile_u
        uv3 = uv3 * UV_BASE + (uv3 % tile_v)
        uvt3 = jax.lax.broadcasted_iota(jnp.int32, (8, sub), 1) % tile_u
        uvt3 = uvt3 * UV_BASE + (uvt3 % tile_v)
        r3 = jnp.full((sub, 8), 3.0, jnp.float32)
    else:
        uv3 = uv_ref[0]
        uvt3 = uvt_ref[0]
        r3 = r_ref[0]
    u3 = uv3 >> UV_SHIFT
    v3 = uv3 & (UV_BASE - 1)
    ut3 = uvt3 >> UV_SHIFT
    vt3 = uvt3 & (UV_BASE - 1)
    w3 = (uv3 != tile_u * UV_BASE + tile_v).astype(jnp.float32)
    theta = theta_out[:]

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

    if variant == "noonehot":
        c_oh_u = (iota_u == 0).astype(mxu_dtype)
        c_oh_v = (iota_v == 0).astype(mxu_dtype)
        c_oht_u = (iota_ut == 0).astype(mxu_dtype)
        c_oht_v = (iota_vt == 0).astype(mxu_dtype)

    theta_mx = theta.astype(mxu_dtype)
    d_theta_g = jnp.zeros((tile_u, lanes), jnp.float32)
    for k in range(8):
        off = pl.multiple_of(gv_ref[8 * i + k] * tile_v, tile_v)
        phi = phi_out[pl.ds(off, tile_v), :]
        phi_mx = phi.astype(mxu_dtype)
        if variant == "noonehot":
            oh_u, oh_v, oht_u, oht_v = c_oh_u, c_oh_v, c_oht_u, c_oht_v
        else:
            oh_u = (iota_u == u3[:, k : k + 1]).astype(mxu_dtype)
            oh_v = (iota_v == v3[:, k : k + 1]).astype(mxu_dtype)
            oht_u = (iota_ut == ut3[k : k + 1, :]).astype(mxu_dtype)
            oht_v = (iota_vt == vt3[k : k + 1, :]).astype(mxu_dtype)
        if variant == "nogather":
            t = (jnp.broadcast_to(theta_mx[0:1], (sub, lanes))
                 .astype(jnp.float32) + oh_u[:, 0:1].astype(jnp.float32))
            p = (jnp.broadcast_to(phi_mx[0:1], (sub, lanes))
                 .astype(jnp.float32) + oh_v[:, 0:1].astype(jnp.float32))
        else:
            t = jnp.dot(oh_u, theta_mx, preferred_element_type=jnp.float32)
            p = jnp.dot(oh_v, phi_mx, preferred_element_type=jnp.float32)
        wk = w3[:, k : k + 1]
        if variant == "nomid":
            err = eta * wk * r3[:, k : k + 1]
            rhs_u = (err * p).astype(mxu_dtype)
            rhs_v = (err * t).astype(mxu_dtype)
        elif mp or variant == "mxupred":
            # pred via a bf16 ones-matmul on the MXU (all lanes carry the
            # rowsum) instead of the VPU lane reduction + broadcast —
            # matches the production kernel (ops/pallas_sgd.py mxu_pred).
            ones = jnp.ones((lanes, lanes), mxu_dtype)
            pred = jnp.dot((t * p).astype(mxu_dtype), ones,
                           preferred_element_type=jnp.float32) + gb
            err = (eta * wk) * (r3[:, k : k + 1] - pred)
            rhs_u = (err * p + wk * m_cnt).astype(mxu_dtype)
            rhs_v = (err * t + wk * m_cnt).astype(mxu_dtype)
        else:
            pred = jnp.sum(t * p, axis=1, keepdims=True) + gb
            err = (eta * wk) * (r3[:, k : k + 1] - pred)
            rhs_u = (err * p + wk * m_cnt).astype(mxu_dtype)
            rhs_v = (err * t + wk * m_cnt).astype(mxu_dtype)
        if variant == "noscatter":
            d_theta_g += jnp.sum(rhs_u.astype(jnp.float32)) * 0
            d_phi = (jnp.zeros((tile_v, lanes), jnp.float32)
                     + jnp.sum(rhs_v.astype(jnp.float32)) * 0)
        else:
            d_theta_g += jnp.dot(
                oht_u, rhs_u, preferred_element_type=jnp.float32
            )
            d_phi = jnp.dot(oht_v, rhs_v, preferred_element_type=jnp.float32)
        if variant == "nodecay":
            phi_out[pl.ds(off, tile_v), :] = phi + d_phi * m_keep_v
        else:
            k_v = jnp.sum(d_phi * m_cnt, axis=1, keepdims=True)
            phi_out[pl.ds(off, tile_v), :] = (
                phi * jnp.exp(k_v * ln_lameta) + d_phi
            ) * m_keep_v + m_one_v

    if variant == "nodecay":
        theta = theta + d_theta_g * m_keep_u
    else:
        k_u = jnp.sum(d_theta_g * m_cnt, axis=1, keepdims=True)
        theta = (
            theta * jnp.exp(k_u * ln_lameta) + d_theta_g
        ) * m_keep_u + m_one_u
    theta_out[:] = theta


@functools.partial(jax.jit, donate_argnums=(0, 1), static_argnames=(
    "tile_u", "tile_v", "batch", "dim", "n_gu", "n_gv", "variant", "mp"))
def run(theta_p, phi_p, gu, gv, ap, uv, uvt, r, hyper,
        *, tile_u, tile_v, batch, dim, n_gu, n_gv, variant, mp=False):
    nb = uv.shape[0]
    gv = gv.reshape(-1)
    ap = ap.reshape(-1)
    lanes = row_lanes(dim)
    k = functools.partial(
        kernel, tile_u=tile_u, tile_v=tile_v, batch=batch, dim=dim,
        lanes=lanes, mxu_dtype=jnp.bfloat16, variant=variant, mp=mp)
    sub = batch // 8
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4, grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, sub, 8), lambda i, a, b, c, h: (i, 0, 0)),
            pl.BlockSpec((1, 8, sub), lambda i, a, b, c, h: (i, 0, 0)),
            pl.BlockSpec((1, sub, 8), lambda i, a, b, c, h: (i, 0, 0)),
            pl.BlockSpec((tile_u, lanes), lambda i, a, b, c, h: (a[i], 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((tile_u, lanes), lambda i, a, b, c, h: (a[i], 0)),
            pl.BlockSpec((n_gv * tile_v, lanes), lambda i, a, b, c, h: (0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((n_gv * tile_v, lanes), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        k, grid_spec=gs,
        out_shape=[jax.ShapeDtypeStruct((n_gu * tile_u, lanes), jnp.float32),
                   jax.ShapeDtypeStruct((n_gv * tile_v, lanes), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        input_output_aliases={7: 0, 8: 1},
    )(gu, gv, ap, hyper, uv, uvt, r, theta_p, phi_p)


def main():
    nu, nv = 69_878, 10_677
    ds = synthetic_ratings(nu, nv, N, rank=8, noise=0.1, seed=0)
    params = init_mf(jax.random.PRNGKey(0), nu, nv, DIM, gb=ds.mean_rating())
    runner = PallasEpochRunner(
        ds, tile_u=TILE, tile_v=TILE, batch=BATCH, seed=1,
        theta_groups=8, phi_groups=8,
    )
    tables = runner.pad(params)
    runner.dim = DIM
    hyper = jnp.asarray([0.02, 5e-3, float(params.gb)], jnp.float32)
    # runner.dev now stores the byte-plane stream; this harness keeps the
    # legacy split-stream kernel, so rebuild its inputs from the plan.
    gu, gv = runner.dev[0], runner.dev[1]
    uv_np = runner.plan.u * UV_BASE + runner.plan.v
    uv = jnp.asarray(uv_np)
    uvt = jnp.asarray(np.swapaxes(uv_np, 1, 2).copy())
    r = jnp.asarray(runner.plan.r)
    ap = runner.flags[0][8]
    kw = dict(tile_u=TILE, tile_v=TILE, batch=runner.batch, dim=DIM,
              n_gu=runner.plan.n_gu, n_gv=runner.plan.n_gv, variant=ABL,
              mp=MP)
    tables = run(*tables, gu, gv, ap, uv, uvt, r, hyper, **kw)
    _ = float(jnp.sum(tables[0]))
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        tables = run(*tables, gu, gv, ap, uv, uvt, r, hyper, **kw)
    _ = float(jnp.sum(tables[0]))
    dt = (time.perf_counter() - t0) / reps
    nb = runner.plan.u.shape[0]
    print(f"{VARIANT:9s} dim={DIM} t={TILE} B={BATCH}: "
          f"{runner.plan.n_real/dt/1e6:7.1f}M/s  {dt*1e6/nb:6.2f}us/step  "
          f"nb={nb}")


if __name__ == "__main__":
    main()
