"""Ablation bench for the packed kernel: which component dominates?

Variants (each breaks math but isolates cost):
  full        - the real kernel
  noswitch    - delta rolls removed (p used unaligned)
  nooh        - one-hot construction hoisted to constants
  nomxu       - gather/scatter matmuls replaced by broadcasts
  noelem      - err/rhs elementwise chain reduced to minimum
  nodecay     - no CB matmul / exp decay
  empty       - kernel body only copies theta through (per-step floor)
"""
import functools, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.models.mf import init_mf
from tpu_mf.ops.pallas_sgd_packed import (
    PackedEpochRunner, prepare_cells_packed, pack_params, LANES)

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "full"
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 8
PACK = {8: 8, 16: 4, 32: 2}.get(DIM, 8)

def kernel(gu_ref, gv_ref, gd_ref, hyper_ref,
           u_ref, v_ref, ut_ref, vt_ref, r_ref, w_ref, theta_ref, phi_hbm,
           theta_out, phi_out, sem,
           *, tile_u, tile_v, batch, dim, pack, mxu_dtype, theta_groups, variant):
    P = pack; m = LANES // P; lgP = P.bit_length() - 1
    rows_u = tile_u // P; rows_v = tile_v // P
    eta = hyper_ref[0]; lam = hyper_ref[1]; gb = hyper_ref[2]
    i = pl.program_id(0)
    prev = jnp.maximum(i - 1, 0)
    new_gu = (i == 0) | (gu_ref[i] != gu_ref[prev])
    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(phi_hbm, phi_out, sem)
        cp.start(); cp.wait()
    @pl.when(new_gu)
    def _():
        theta_out[:] = theta_ref[:]
    if variant == "empty":
        return
    sub = batch // 8
    u3 = u_ref[0]; v3 = v_ref[0]; ut3 = ut_ref[0]; vt3 = vt_ref[0]
    r3 = r_ref[0]; w3 = w_ref[0]
    theta = theta_out[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    slot_lane = lane >> (m.bit_length() - 1)
    inslot = lane - slot_lane * m
    m_fac = (inslot < dim).astype(jnp.float32)
    m_bias = (inslot == dim).astype(jnp.float32)
    m_cnt = (inslot == dim + 1).astype(jnp.float32)
    m_keep = m_fac + m_bias
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    CB = (c_iota == slot_lane * m + (dim + 1)).astype(jnp.float32)
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (sub, rows_u), 1)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (sub, rows_v), 1)
    iota_ut = jax.lax.broadcasted_iota(jnp.int32, (rows_u, sub), 0)
    iota_vt = jax.lax.broadcasted_iota(jnp.int32, (rows_v, sub), 0)
    ln_lameta = jnp.log(1.0 - eta * lam)
    fwd = [lambda x, r=r: pltpu.roll(x, ((P - r) % P) * m, 1) for r in range(P)]
    bwd = [lambda x, r=r: pltpu.roll(x, (r % P) * m, 1) for r in range(P)]
    per_group = 8 // theta_groups
    for g in range(theta_groups):
        theta_mx = theta.astype(mxu_dtype)
        d_theta_g = jnp.zeros((rows_u, LANES), jnp.float32)
        for k in range(g * per_group, (g + 1) * per_group):
            off = pl.multiple_of(gv_ref[8 * i + k] * rows_v, rows_v)
            delta = gd_ref[8 * i + k]
            phi = phi_out[pl.ds(off, rows_v), :]
            phi_mx = phi.astype(mxu_dtype)
            uk = u3[:, k:k+1]
            if variant == "nooh":
                oh_u = jnp.zeros((sub, rows_u), mxu_dtype)
                oh_v = jnp.zeros((sub, rows_v), mxu_dtype)
                oht_u = jnp.zeros((rows_u, sub), mxu_dtype)
                oht_v = jnp.zeros((rows_v, sub), mxu_dtype)
            else:
                oh_u = (iota_u == (uk >> lgP)).astype(mxu_dtype)
                oh_v = (iota_v == (v3[:, k:k+1] >> lgP)).astype(mxu_dtype)
                oht_u = (iota_ut == (ut3[k:k+1, :] >> lgP)).astype(mxu_dtype)
                oht_v = (iota_vt == (vt3[k:k+1, :] >> lgP)).astype(mxu_dtype)
            if variant == "nomxu":
                t = jnp.broadcast_to(theta_mx[0:1].astype(jnp.float32), (sub, LANES)) * oh_u[:, 0:1].astype(jnp.float32)
                p0 = jnp.broadcast_to(phi_mx[0:1].astype(jnp.float32), (sub, LANES)) * oh_v[:, 0:1].astype(jnp.float32)
            else:
                t = jnp.dot(oh_u, theta_mx, preferred_element_type=jnp.float32)
                p0 = jnp.dot(oh_v, phi_mx, preferred_element_type=jnp.float32)
            if variant == "noswitch":
                p = p0
            else:
                p = jax.lax.switch(delta, fwd, p0)
            msk = (slot_lane == (uk & (P - 1))).astype(jnp.float32)
            if variant == "noelem":
                err = (eta * w3[:, k:k+1]) * (r3[:, k:k+1] - jnp.sum(t * p, 1, keepdims=True))
                rhs_u = (err * p).astype(mxu_dtype)
                rhs_v0 = err * t
            else:
                q = (p * m_fac + m_bias) * msk
                pred = (jnp.sum(t * q, 1, keepdims=True)
                        + jnp.sum(p * (m_bias * msk), 1, keepdims=True) + gb)
                wk = w3[:, k:k+1]
                err = (eta * wk) * (r3[:, k:k+1] - pred)
                cnt = wk * (m_cnt * msk)
                rhs_u = (err * q + cnt).astype(mxu_dtype)
                rhs_v0 = err * ((t * m_fac + m_bias) * msk) + cnt
            if variant == "noswitch":
                rhs_v = rhs_v0.astype(mxu_dtype)
            else:
                rhs_v = jax.lax.switch(delta, bwd, rhs_v0).astype(mxu_dtype)
            if variant == "nomxu":
                d_theta_g += rhs_u.astype(jnp.float32)[0:rows_u * 0 + rows_u] if False else jnp.zeros((rows_u, LANES), jnp.float32)
                d_phi = jnp.zeros((rows_v, LANES), jnp.float32) + jnp.sum(rhs_v.astype(jnp.float32)) * 0
            else:
                d_theta_g += jnp.dot(oht_u, rhs_u, preferred_element_type=jnp.float32)
                d_phi = jnp.dot(oht_v, rhs_v, preferred_element_type=jnp.float32)
            if variant == "nodecay":
                phi_out[pl.ds(off, rows_v), :] = phi + d_phi * m_keep
            else:
                k_v = jnp.dot(d_phi, CB, preferred_element_type=jnp.float32)
                phi_out[pl.ds(off, rows_v), :] = phi * jnp.exp(k_v * ln_lameta) + d_phi * m_keep
        if variant == "nodecay":
            theta = theta + d_theta_g * m_keep
        else:
            k_u = jnp.dot(d_theta_g, CB, preferred_element_type=jnp.float32)
            theta = theta * jnp.exp(k_u * ln_lameta) + d_theta_g * m_keep
    theta_out[:] = theta


@functools.partial(jax.jit, donate_argnums=(0, 1), static_argnames=(
    "tile_u", "tile_v", "batch", "dim", "pack", "n_gu", "n_gv", "theta_groups", "variant"))
def run(theta_p, phi_p, gu, gv, gd, u, v, ut, vt, r, w, hyper,
        *, tile_u, tile_v, batch, dim, pack, n_gu, n_gv, theta_groups, variant):
    nb = u.shape[0]
    gv = gv.reshape(-1); gd = gd.reshape(-1)
    rows_u = tile_u // pack; rows_v = tile_v // pack
    k = functools.partial(kernel, tile_u=tile_u, tile_v=tile_v, batch=batch,
                          dim=dim, pack=pack, mxu_dtype=jnp.bfloat16,
                          theta_groups=theta_groups, variant=variant)
    sub = batch // 8
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4, grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, sub, 8), lambda i, a, b, c, h: (i, 0, 0)),
            pl.BlockSpec((1, sub, 8), lambda i, a, b, c, h: (i, 0, 0)),
            pl.BlockSpec((1, 8, sub), lambda i, a, b, c, h: (i, 0, 0)),
            pl.BlockSpec((1, 8, sub), lambda i, a, b, c, h: (i, 0, 0)),
            pl.BlockSpec((1, sub, 8), lambda i, a, b, c, h: (i, 0, 0)),
            pl.BlockSpec((1, sub, 8), lambda i, a, b, c, h: (i, 0, 0)),
            pl.BlockSpec((rows_u, LANES), lambda i, a, b, c, h: (a[i], 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((rows_u, LANES), lambda i, a, b, c, h: (a[i], 0)),
            pl.BlockSpec((n_gv * rows_v, LANES), lambda i, a, b, c, h: (0, 0)),
        ],
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        k, grid_spec=gs,
        out_shape=[jax.ShapeDtypeStruct((n_gu * rows_u, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((n_gv * rows_v, LANES), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        input_output_aliases={10: 0, 11: 1},
    )(gu, gv, gd, hyper, u, v, ut, vt, r, w, theta_p, phi_p)


def main():
    nu, nv, n = 69_878, 10_677, 10_000_000
    ds = synthetic_ratings(nu, nv, n, rank=8, noise=0.1, seed=0)
    params = init_mf(jax.random.PRNGKey(0), nu, nv, DIM, gb=ds.mean_rating())
    runner = PackedEpochRunner(ds, batch=4096, seed=1, dim=DIM, pack=PACK)
    tables = runner.pad(params)
    hyper = jnp.asarray([0.02, 5e-3, float(params.gb)], jnp.float32)
    kw = dict(tile_u=runner.tile_u, tile_v=runner.tile_v, batch=runner.batch,
              dim=DIM, pack=PACK, n_gu=runner.plan.n_gu, n_gv=runner.plan.n_gv,
              theta_groups=8, variant=VARIANT)
    tables = run(*tables, *runner.dev, hyper, **kw)
    _ = float(jnp.sum(tables[0]))
    t0 = time.perf_counter(); reps = 5
    for _ in range(reps):
        tables = run(*tables, *runner.dev, hyper, **kw)
    _ = float(jnp.sum(tables[0]))
    dt = (time.perf_counter() - t0) / reps
    nb = runner.plan.u.shape[0]
    print(f"{VARIANT:9s} dim={DIM} P={PACK}: {runner.plan.n_real/dt/1e6:7.1f}M/s  "
          f"{dt*1e6/nb:6.2f}us/step  nb={nb}")

if __name__ == "__main__":
    main()
