"""Ablation bench for the CURRENT packed kernel: which component dominates?

Mirrors ops/pallas_sgd_packed._packed_epoch_kernel (fused uv stream, static
delta-class rolls, deferred item apply) with variants that each break the
math but isolate one cost:

  full        - the real kernel (phi_groups/theta_groups from argv)
  noonehot    - one-hot construction replaced by reused constants
  nogather    - gather matmuls (oh@table) replaced by broadcasts
  noscatter   - scatter matmuls (oht@rhs) replaced by zeros
  noelem      - err/rhs elementwise chain reduced to minimum
  nodecay     - no CB matmul / exp decay on apply
  nophi       - item-side slice read/update/write removed entirely
  nostreams   - uv/uvt/r blocks never read (iota-derived fake ids)
  empty       - kernel body only copies theta through (per-step floor)

Usage: ablate_packed.py VARIANT [DIM] [BATCH] [PG] [TG] [N]
"""
import functools, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tpu_mf.data.coo import synthetic_ratings
from tpu_mf.models.mf import init_mf
from tpu_mf.ops.pallas_sgd import LANES, UV_BASE, UV_SHIFT
from tpu_mf.ops.pallas_sgd_packed import PackedEpochRunner

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "full"
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 8
BATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
PG = int(sys.argv[4]) if len(sys.argv) > 4 else 1
TG = int(sys.argv[5]) if len(sys.argv) > 5 else 1
N = int(sys.argv[6]) if len(sys.argv) > 6 else 10_000_000


def kernel(gu_ref, gv_ref, ap_ref, hyper_ref,
           uv_ref, uvt_ref, r_ref, theta_ref, phi_hbm,
           theta_out, phi_out, acc, sem,
           *, tile_u, tile_v, batch, dim, pack, mxu_dtype,
           theta_groups, phi_groups, variant):
    P = pack
    m = LANES // P
    lgP = P.bit_length() - 1
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
        if phi_groups < 8:
            acc[:] = jnp.zeros_like(acc)

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
    lameta = 1.0 - eta * lam
    ln_lameta = jnp.log(lameta)

    tg_w = 8 // theta_groups
    pg_w = 8 // phi_groups
    theta_mx = None
    d_theta_g = None
    pending = []
    # constant one-hots for the noonehot variant (reused across columns)
    if variant == "noonehot":
        c_oh_u = (iota_u == 0).astype(mxu_dtype)
        c_oh_v = (iota_v == 0).astype(mxu_dtype)
        c_oht_u = (iota_ut == 0).astype(mxu_dtype)
        c_oht_v = (iota_vt == 0).astype(mxu_dtype)
    for k in range(8):
        if k % tg_w == 0:
            theta_mx = theta.astype(mxu_dtype)
            d_theta_g = jnp.zeros((rows_u, LANES), jnp.float32)
        off = pl.multiple_of(gv_ref[8 * i + k] * rows_v, rows_v)
        delta = k % P
        if variant == "nophi":
            phi = theta_out[pl.ds(0, rows_v), :]  # reuse resident theta rows
        else:
            phi = phi_out[pl.ds(off, rows_v), :]
        phi_mx = phi.astype(mxu_dtype)
        uk = u3[:, k : k + 1]
        if variant == "noonehot":
            oh_u, oh_v, oht_u, oht_v = c_oh_u, c_oh_v, c_oht_u, c_oht_v
        else:
            oh_u = (iota_u == (uk >> lgP)).astype(mxu_dtype)
            oh_v = (iota_v == (v3[:, k : k + 1] >> lgP)).astype(mxu_dtype)
            oht_u = (iota_ut == (ut3[k : k + 1, :] >> lgP)).astype(mxu_dtype)
            oht_v = (iota_vt == (vt3[k : k + 1, :] >> lgP)).astype(mxu_dtype)
        if variant == "nogather":
            t = jnp.broadcast_to(theta_mx[0:1], (sub, LANES)).astype(jnp.float32) + oh_u[:, 0:1].astype(jnp.float32)
            p0 = jnp.broadcast_to(phi_mx[0:1], (sub, LANES)).astype(jnp.float32) + oh_v[:, 0:1].astype(jnp.float32)
        else:
            t = jnp.dot(oh_u, theta_mx, preferred_element_type=jnp.float32)
            p0 = jnp.dot(oh_v, phi_mx, preferred_element_type=jnp.float32)
        p = pltpu.roll(p0, ((P - delta) % P) * m, 1) if delta else p0
        msk = (slot_lane == (uk & (P - 1))).astype(jnp.float32)
        if variant == "noelem":
            err = (eta * w3[:, k : k + 1]) * (
                r3[:, k : k + 1] - jnp.sum(t * p, 1, keepdims=True))
            rhs_u = (err * p).astype(mxu_dtype)
            rhs_v0 = err * t
        else:
            q = (p * m_fac + m_bias) * msk
            pred = (jnp.sum(t * q + p * (m_bias * msk), axis=1, keepdims=True)
                    + gb)
            wk = w3[:, k : k + 1]
            err = (eta * wk) * (r3[:, k : k + 1] - pred)
            cnt = wk * (m_cnt * msk)
            rhs_u = (err * q + cnt).astype(mxu_dtype)
            rhs_v0 = err * ((t * m_fac + m_bias) * msk) + cnt
        rhs_v = (pltpu.roll(rhs_v0, delta * m, 1) if delta else rhs_v0
                 ).astype(mxu_dtype)
        if variant == "noscatter":
            d_theta_g += jnp.zeros((rows_u, LANES), jnp.float32) + jnp.sum(rhs_u.astype(jnp.float32)) * 0
            d_phi = jnp.zeros((rows_v, LANES), jnp.float32) + jnp.sum(rhs_v.astype(jnp.float32)) * 0
        else:
            d_theta_g += jnp.dot(oht_u, rhs_u, preferred_element_type=jnp.float32)
            d_phi = jnp.dot(oht_v, rhs_v, preferred_element_type=jnp.float32)
        if variant == "nophi":
            pass
        elif phi_groups == 8:
            if variant == "nodecay":
                phi_out[pl.ds(off, rows_v), :] = phi + d_phi * m_keep
            else:
                k_v = jnp.dot(d_phi, CB, preferred_element_type=jnp.float32)
                phi_out[pl.ds(off, rows_v), :] = (
                    phi * jnp.exp(k_v * ln_lameta) + d_phi * m_keep)
        else:
            pending.append((k, off, phi, d_phi))
            if k % pg_w == pg_w - 1:
                for kk, off_, phi_, dphi_ in pending:
                    acc[pl.ds(off_, rows_v), :] += dphi_

                    @pl.when(ap_ref[8 * i + kk] == 1)
                    def _(off_=off_, phi_=phi_):
                        a = acc[pl.ds(off_, rows_v), :]
                        if variant == "nodecay":
                            phi_out[pl.ds(off_, rows_v), :] = phi_ + a * m_keep
                        else:
                            k_v = jnp.dot(a, CB, preferred_element_type=jnp.float32)
                            phi_out[pl.ds(off_, rows_v), :] = (
                                phi_ * jnp.exp(k_v * ln_lameta) + a * m_keep)
                        acc[pl.ds(off_, rows_v), :] = jnp.zeros_like(a)
                pending = []
        if k % tg_w == tg_w - 1:
            if variant == "nodecay":
                theta = theta + d_theta_g * m_keep
            else:
                k_u = jnp.dot(d_theta_g, CB, preferred_element_type=jnp.float32)
                theta = theta * jnp.exp(k_u * ln_lameta) + d_theta_g * m_keep
    theta_out[:] = theta


@functools.partial(jax.jit, donate_argnums=(0, 1), static_argnames=(
    "tile_u", "tile_v", "batch", "dim", "pack", "n_gu", "n_gv",
    "theta_groups", "phi_groups", "variant"))
def run(theta_p, phi_p, gu, gv, ap, uv, uvt, r, hyper,
        *, tile_u, tile_v, batch, dim, pack, n_gu, n_gv,
        theta_groups, phi_groups, variant):
    nb = uv.shape[0]
    gv = gv.reshape(-1)
    ap = ap.reshape(-1)
    rows_u = tile_u // pack
    rows_v = tile_v // pack
    k = functools.partial(
        kernel, tile_u=tile_u, tile_v=tile_v, batch=batch, dim=dim,
        pack=pack, mxu_dtype=jnp.bfloat16, theta_groups=theta_groups,
        phi_groups=phi_groups, variant=variant)
    sub = batch // 8
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4, grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, sub, 8), lambda i, a, b, c, h: (i, 0, 0)),
            pl.BlockSpec((1, 8, sub), lambda i, a, b, c, h: (i, 0, 0)),
            pl.BlockSpec((1, sub, 8), lambda i, a, b, c, h: (i, 0, 0)),
            pl.BlockSpec((rows_u, LANES), lambda i, a, b, c, h: (a[i], 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((rows_u, LANES), lambda i, a, b, c, h: (a[i], 0)),
            pl.BlockSpec((n_gv * rows_v, LANES), lambda i, a, b, c, h: (0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((n_gv * rows_v, LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        k, grid_spec=gs,
        out_shape=[jax.ShapeDtypeStruct((n_gu * rows_u, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((n_gv * rows_v, LANES), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        input_output_aliases={7: 0, 8: 1},
    )(gu, gv, ap, hyper, uv, uvt, r, theta_p, phi_p)


def main():
    nu, nv = 69_878, 10_677
    ds = synthetic_ratings(nu, nv, N, rank=8, noise=0.1, seed=0)
    params = init_mf(jax.random.PRNGKey(0), nu, nv, DIM, gb=ds.mean_rating())
    runner = PackedEpochRunner(ds, batch=BATCH, seed=1, dim=DIM,
                               phi_groups=PG, theta_groups=TG)
    tables = runner.pad(params)
    hyper = jnp.asarray([0.02, 5e-3, float(params.gb)], jnp.float32)
    gu, gv, uv, uvt, r = runner.dev
    ap = runner.flags[0][PG if PG in (1, 2, 4) else 8]
    kw = dict(tile_u=runner.tile_u, tile_v=runner.tile_v, batch=runner.batch,
              dim=DIM, pack=runner.pack, n_gu=runner.plan.n_gu,
              n_gv=runner.plan.n_gv, theta_groups=TG, phi_groups=PG,
              variant=VARIANT)
    tables = run(*tables, gu, gv, ap, uv, uvt, r, hyper, **kw)
    _ = float(jnp.sum(tables[0]))
    t0 = time.perf_counter(); reps = 5
    for _ in range(reps):
        tables = run(*tables, gu, gv, ap, uv, uvt, r, hyper, **kw)
    _ = float(jnp.sum(tables[0]))
    dt = (time.perf_counter() - t0) / reps
    nb = runner.plan.u.shape[0]
    print(f"{VARIANT:9s} dim={DIM} P={runner.pack} B={BATCH} pg={PG} tg={TG}: "
          f"{runner.plan.n_real/dt/1e6:7.1f}M/s  {dt*1e6/nb:6.2f}us/step  nb={nb}")


if __name__ == "__main__":
    main()
