"""Ablation bench for the HOMOG slot-major kernel at small rank.

Round-3 question (VERDICT #6): Netflix-scale rank 8 sits at ~590M
updates/s; PERF_NOTES attributes ~1.06 ns/slot to one-hot construction by
MODEL, not measurement. Variants isolate the real split at the production
geometry (pg=tg=1 parallel groups, SMEM metadata):

  full      - the real homog slot kernel
  noonehot  - constant reused one-hots (known to re-schedule; directional)
  nogather  - gather matmuls replaced by broadcasts
  noscatter - scatter matmuls replaced by zeros
  nomid     - pred/err chain minimized
  nobcast   - per-slot rating broadcast (E matmul) replaced by constant
  empty     - body only copies theta through

Usage: ablate_slot.py VARIANT [CONFIG] [SUB]   (CONFIG: ml10m | netflix)
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
from tpu_mf.ops.pallas_sgd import LANES, UV_BASE, UV_SHIFT
from tpu_mf.ops.pallas_sgd_slot import SlotEpochRunner

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "full"
CONFIG = sys.argv[2] if len(sys.argv) > 2 else "netflix"
SUB = int(sys.argv[3]) if len(sys.argv) > 3 else 0
DIM = 8
shapes = {
    "ml10m": (69_878, 10_677, 10_000_000),
    "netflix": (480_189, 17_770, 100_000_000),
}


def kernel(gu_ref, gv_ref, ap_ref, hyper_ref,
           uv_ref, uvt_ref, r_ref, theta_ref, phi_hbm,
           theta_out, phi_out, acc, sem,
           *, tile_u, tile_v, sub, dim, pack, mxu_dtype, variant):
    P = pack
    m = LANES // P
    rows_u = tile_u // P
    rows_v = tile_v // P
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
        acc[:] = jnp.zeros_like(acc)

    @pl.when(new_gu)
    def _():
        theta_out[:] = theta_ref[:]

    if variant == "empty":
        return

    uv3 = uv_ref[0]
    uvt3 = uvt_ref[0]
    r3 = r_ref[0]
    theta = theta_out[:]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    slot_lane = lane >> (m.bit_length() - 1)
    inslot = lane - slot_lane * m
    m_fac = (inslot < dim).astype(jnp.float32)
    m_bias_u = (inslot == dim).astype(jnp.float32)
    m_one_u = (inslot == dim + 1).astype(jnp.float32)
    m_bias_v = m_one_u
    m_one_v = m_bias_u
    m_cnt = (inslot == dim + 2).astype(jnp.float32)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    CB = (c_iota == slot_lane * m + (dim + 2)).astype(jnp.float32)
    SS = (slot_lane == (c_iota >> (m.bit_length() - 1))).astype(jnp.float32)
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (P, LANES), 0)
    E = (p_iota == slot_lane).astype(jnp.float32)
    iota_ru = jax.lax.broadcasted_iota(jnp.int32, (sub, rows_u), 1)
    iota_rv = jax.lax.broadcasted_iota(jnp.int32, (sub, rows_v), 1)
    iota_rut = jax.lax.broadcasted_iota(jnp.int32, (rows_u, sub), 0)
    iota_rvt = jax.lax.broadcasted_iota(jnp.int32, (rows_v, sub), 0)
    rseg_u = jax.lax.broadcasted_iota(jnp.int32, (tile_u, 1), 0) // rows_u
    mkd_u = (rseg_u == slot_lane).astype(jnp.float32)
    MK_u = mkd_u * (m_fac + m_bias_u)
    M1_u = mkd_u * m_one_u
    MC_u = mkd_u * m_cnt
    rseg_v = jax.lax.broadcasted_iota(jnp.int32, (tile_v, 1), 0) // rows_v
    mkd_v = (rseg_v == slot_lane).astype(jnp.float32)
    MK_v = mkd_v * (m_fac + m_bias_v)
    M1_v = mkd_v * m_one_v
    MS_v = mkd_v * (m_fac + m_bias_v + m_cnt)
    lameta = 1.0 - eta * lam
    ln_lameta = jnp.log(lameta)

    if variant == "noonehot":
        c_oh_u = jnp.concatenate(
            [(iota_ru == j).astype(mxu_dtype) for j in range(P)], axis=1)
        c_oh_v = jnp.concatenate(
            [(iota_rv == j).astype(mxu_dtype) for j in range(P)], axis=1)
        c_oht_u = jnp.concatenate(
            [(iota_rut == j).astype(mxu_dtype) for j in range(P)], axis=0)
        c_oht_v = jnp.concatenate(
            [(iota_rvt == j).astype(mxu_dtype) for j in range(P)], axis=0)

    theta_mx = theta.astype(mxu_dtype)
    d_theta_g = jnp.zeros((tile_u, LANES), jnp.float32)
    for k in range(8):
        off = pl.multiple_of(gv_ref[8 * i + k] * tile_v, tile_v)
        delta = k % P
        phi = phi_out[pl.ds(off, tile_v), :]
        phi_mx = phi.astype(mxu_dtype)
        uc = uv3[:, k * P : (k + 1) * P]
        ut = uvt3[k * P : (k + 1) * P, :]
        u_i = uc >> UV_SHIFT
        v_i = uc & (UV_BASE - 1)
        ut_i = ut >> UV_SHIFT
        vt_i = ut & (UV_BASE - 1)
        if variant == "noonehot":
            oh_u, oh_v, oht_u, oht_v = c_oh_u, c_oh_v, c_oht_u, c_oht_v
        else:
            oh_u = jnp.concatenate(
                [(iota_ru == u_i[:, j : j + 1]).astype(mxu_dtype)
                 for j in range(P)], axis=1)
            oh_v = jnp.concatenate(
                [(iota_rv == v_i[:, (sv - delta) % P : (sv - delta) % P + 1]
                  ).astype(mxu_dtype) for sv in range(P)], axis=1)
            oht_u = jnp.concatenate(
                [(iota_rut == ut_i[j : j + 1, :]).astype(mxu_dtype)
                 for j in range(P)], axis=0)
            oht_v = jnp.concatenate(
                [(iota_rvt == vt_i[(sv - delta) % P : (sv - delta) % P + 1, :]
                  ).astype(mxu_dtype) for sv in range(P)], axis=0)
        if variant == "nogather":
            t = (jnp.broadcast_to(theta_mx[0:1], (sub, LANES))
                 .astype(jnp.float32) + oh_u[:, 0:1].astype(jnp.float32))
            p = (jnp.broadcast_to(phi_mx[0:1], (sub, LANES))
                 .astype(jnp.float32) + oh_v[:, 0:1].astype(jnp.float32))
        else:
            t = jnp.dot(oh_u, theta_mx, preferred_element_type=jnp.float32)
            p0 = jnp.dot(oh_v, phi_mx, preferred_element_type=jnp.float32)
            p = pltpu.roll(p0, ((P - delta) % P) * m, 1) if delta else p0
        if variant == "nobcast":
            r_b = jnp.broadcast_to(
                r3[:, k * P : k * P + 1], (sub, LANES)
            ).astype(jnp.float32)
        else:
            r_b = jnp.dot(r3[:, k * P : (k + 1) * P], E,
                          preferred_element_type=jnp.float32)
        if variant == "nomid":
            err = eta * r_b
            rhs_u = (err * p).astype(mxu_dtype)
            rhs_v0 = err * t
        else:
            pred = jnp.dot(t * p, SS, preferred_element_type=jnp.float32) + gb
            err = eta * (r_b - pred)
            rhs_u = (err * p + m_cnt).astype(mxu_dtype)
            rhs_v0 = err * t + m_cnt
        rhs_v = (pltpu.roll(rhs_v0, delta * m, 1) if delta else rhs_v0
                 ).astype(mxu_dtype)
        if variant == "noscatter":
            d_theta_g += jnp.sum(rhs_u.astype(jnp.float32)) * 0
            d_phi = (jnp.zeros((tile_v, LANES), jnp.float32)
                     + jnp.sum(rhs_v.astype(jnp.float32)) * 0)
        else:
            d_theta_g += jnp.dot(oht_u, rhs_u,
                                 preferred_element_type=jnp.float32)
            d_phi = jnp.dot(oht_v, rhs_v, preferred_element_type=jnp.float32)

        acc[pl.ds(off, tile_v), :] += d_phi * MS_v

        @pl.when(ap_ref[8 * i + k] == 1)
        def _(off=off, phi=phi):
            a = acc[pl.ds(off, tile_v), :]
            k_v = jnp.dot(a, CB, preferred_element_type=jnp.float32)
            phi_out[pl.ds(off, tile_v), :] = (
                phi * jnp.exp(k_v * ln_lameta) + a
            ) * MK_v + M1_v
            acc[pl.ds(off, tile_v), :] = jnp.zeros_like(a)

    k_u = jnp.dot(d_theta_g * MC_u, CB, preferred_element_type=jnp.float32)
    theta_out[:] = (
        theta * jnp.exp(k_u * ln_lameta) + d_theta_g
    ) * MK_u + M1_u


@functools.partial(jax.jit, donate_argnums=(0, 1), static_argnames=(
    "tile_u", "tile_v", "sub", "dim", "pack", "n_gu", "n_gv", "variant"))
def run(theta_s, phi_s, gu, gv, ap, uv, uvt, r, hyper,
        *, tile_u, tile_v, sub, dim, pack, n_gu, n_gv, variant):
    nb = uv.shape[0]
    gv = gv.reshape(-1)
    ap = ap.reshape(-1)
    k = functools.partial(
        kernel, tile_u=tile_u, tile_v=tile_v, sub=sub, dim=dim, pack=pack,
        mxu_dtype=jnp.bfloat16, variant=variant)
    lanes8 = 8 * pack
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4, grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, sub, lanes8), lambda i, a, b, c, h: (i, 0, 0)),
            pl.BlockSpec((1, lanes8, sub), lambda i, a, b, c, h: (i, 0, 0)),
            pl.BlockSpec((1, sub, lanes8), lambda i, a, b, c, h: (i, 0, 0)),
            pl.BlockSpec((tile_u, LANES), lambda i, a, b, c, h: (a[i], 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((tile_u, LANES), lambda i, a, b, c, h: (a[i], 0)),
            pl.BlockSpec((n_gv * tile_v, LANES), lambda i, a, b, c, h: (0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((n_gv * tile_v, LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        k, grid_spec=gs,
        out_shape=[jax.ShapeDtypeStruct((n_gu * tile_u, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((n_gv * tile_v, LANES), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        input_output_aliases={7: 0, 8: 1},
    )(gu, gv, ap, hyper, uv, uvt, r, theta_s, phi_s)


def main():
    nu, nv, n = shapes[CONFIG]
    ds = synthetic_ratings(nu, nv, n, rank=8, noise=0.1, seed=0)
    params = init_mf(jax.random.PRNGKey(0), nu, nv, DIM, gb=ds.mean_rating())
    kw = dict(dim=DIM, tile_u=1024, tile_v=1024,
              phi_groups=1, theta_groups=1, seed=1)
    if SUB:
        kw["sub"] = SUB
    runner = SlotEpochRunner(ds, **kw)
    tables = runner.pad(params)
    hyper = jnp.asarray([0.02, 5e-3, float(params.gb)], jnp.float32)
    gu, gv, uv, uvt, r = runner.dev
    ap = runner.flags[0][1]
    rkw = dict(tile_u=runner.tile_u, tile_v=runner.tile_v, sub=runner.sub,
               dim=DIM, pack=runner.pack, n_gu=runner.plan.n_gu,
               n_gv=runner.plan.n_gv, variant=VARIANT)
    tables = run(*tables, gu, gv, ap, uv, uvt, r, hyper, **rkw)
    _ = float(jnp.sum(tables[0]))
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        tables = run(*tables, gu, gv, ap, uv, uvt, r, hyper, **rkw)
    _ = float(jnp.sum(tables[0]))
    dt = (time.perf_counter() - t0) / reps
    nslots = runner.plan.u.size
    print(f"{VARIANT:9s} {CONFIG} sub={runner.sub}: "
          f"{runner.plan.n_real/dt/1e6:7.1f}M/s  "
          f"{dt*1e9/nslots:5.2f}ns/slot  nb={runner.plan.u.shape[0]}")


if __name__ == "__main__":
    main()
