"""Multi-chip diagonal-block DSGD with the fused Pallas epoch kernel.

Combines the two performance layers of the framework (SURVEY §7 step 8):

* ACROSS chips: Jellyfish diagonal scheduling (tpu_mf.parallel.dsgd) — theta
  row-sharded over the mesh, phi ring-rotated with lax.ppermute, substep s on
  device p touching only block (p, (p+s) mod P), race-free by construction.
* WITHIN a chip: each substep runs the fused one-hot MXU epoch kernel
  (tpu_mf.ops.pallas_sgd) over that block's cell plan — theta tiles stream
  through VMEM, the local phi shard stays VMEM-resident.

SPMD uniformity: every (device, substep) cell plan is padded to the same
batch count, so the jitted shard_map program is identical on all devices
(padding batches are weight-0 and touch tile 0 as a no-op).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from tpu_mf.data.blocker import cdiv
from tpu_mf.data.coo import RatingsCOO
from tpu_mf.models.mf import MFParams
from tpu_mf.ops import pallas_sgd
from tpu_mf.ops.pallas_sgd import pad_params, prepare_cells, row_lanes
from tpu_mf.parallel.mesh import AXIS, row_sharding


class ShardedPlan(NamedTuple):
    """Per-(device, substep) cell plans, padded to uniform batch count.

    Array shapes: gu/gv (P, P, NB); u/v/r/w (P, P, NB, B/8, 8);
    ut/vt (P, P, NB, 8, B/8). Axis 0 = device (user shard), axis 1 = substep
    (the item shard held then is (p + s) mod P).
    """

    gu: np.ndarray   # (P, P, NB)
    gv: np.ndarray   # (P, P, NB, 8) per-column item-tile indices
    u: np.ndarray
    v: np.ndarray
    ut: np.ndarray
    vt: np.ndarray
    r: np.ndarray
    w: np.ndarray
    chunk_u: int   # user rows per device (padded to tile multiple)
    chunk_v: int
    tile_u: int
    tile_v: int
    n_real: int


def partition_pallas(
    ds: RatingsCOO,
    n_dev: int,
    tile_u: int = 512,
    tile_v: int = 512,
    batch: int = 4096,
    seed: int = 0,
) -> ShardedPlan:
    """Bin ratings into P x P diagonal blocks, then cell-plan each block."""
    chunk_u = cdiv(cdiv(ds.nu, n_dev), tile_u) * tile_u
    chunk_v = cdiv(cdiv(ds.nv, n_dev), tile_v) * tile_v
    shard_u = ds.u // chunk_u
    shard_v = ds.v // chunk_v
    substep = (shard_v - shard_u) % n_dev

    plans = {}
    nb_max = 1
    for p in range(n_dev):
        for s in range(n_dev):
            sel = (shard_u == p) & (substep == s)
            local = RatingsCOO(
                ds.u[sel] % chunk_u,
                ds.v[sel] % chunk_v,
                ds.r[sel],
                nu=chunk_u,
                nv=chunk_v,
            )
            plan = prepare_cells(
                local, tile_u, tile_v, batch, seed=seed * 7919 + p * n_dev + s
            )
            plans[(p, s)] = plan
            nb_max = max(nb_max, plan.u.shape[0])

    sub = batch // 8
    n_gv = chunk_v // tile_v
    shape4 = (n_dev, n_dev, nb_max)
    GU = np.zeros(shape4, np.int32)
    GV = np.zeros(shape4 + (8,), np.int32)
    U = np.full(shape4 + (sub, 8), tile_u, np.int32)
    V = np.full(shape4 + (sub, 8), tile_v, np.int32)
    R = np.zeros(shape4 + (sub, 8), np.float32)
    W = np.zeros(shape4 + (sub, 8), np.float32)
    for (p, s), plan in plans.items():
        nb = plan.u.shape[0]
        GU[p, s, :nb] = plan.gu
        # Pad batches MUST keep the last real gu: a gu change would reload
        # the theta tile from the aliased HBM buffer, which does not see the
        # store made earlier in the same pallas_call (stale clobber).
        GU[p, s, nb:] = plan.gu[-1]
        GV[p, s, :nb] = plan.gv
        U[p, s, :nb] = plan.u
        V[p, s, :nb] = plan.v
        R[p, s, :nb] = plan.r
        W[p, s, :nb] = plan.w
    return ShardedPlan(
        gu=GU, gv=GV, u=U, v=V,
        ut=np.swapaxes(U, 3, 4).copy(), vt=np.swapaxes(V, 3, 4).copy(),
        r=R, w=W,
        chunk_u=chunk_u, chunk_v=chunk_v, tile_u=tile_u, tile_v=tile_v,
        n_real=len(ds),
    )


def pad_sharded(params: MFParams, splan: ShardedPlan, mesh: Mesh):
    """Fused-layout (homogeneous rows, pallas_sgd.fuse_rows) tables padded
    to P*chunk rows and device_put sharded."""
    from tpu_mf.ops.pallas_sgd import fuse_rows

    n_dev = mesh.devices.size
    lanes = row_lanes(params.theta.shape[1])
    shard = row_sharding(mesh)
    theta_ext = jax.device_put(
        fuse_rows(params.theta, params.bu, n_dev * splan.chunk_u, lanes, "u"),
        shard,
    )
    phi_ext = jax.device_put(
        fuse_rows(params.phi, params.bv, n_dev * splan.chunk_v, lanes, "v"),
        shard,
    )
    return theta_ext, phi_ext


def unpack_sharded(theta_ext, phi_ext, nu, nv, dim, gb) -> MFParams:
    theta_ext = np.asarray(theta_ext)
    phi_ext = np.asarray(phi_ext)
    return MFParams(
        theta=jnp.asarray(theta_ext[:nu, :dim]),
        phi=jnp.asarray(phi_ext[:nv, :dim]),
        bu=jnp.asarray(theta_ext[:nu, dim]),
        bv=jnp.asarray(phi_ext[:nv, dim + 1]),  # phi rows: [fac | 1 | bias]
        gb=jnp.asarray(gb, jnp.float32),
    )


@lru_cache(maxsize=None)
def _sharded_epoch_fn(
    mesh: Mesh, n_dev: int, tile_u: int, tile_v: int, batch: int,
    n_gu: int, n_gv: int, dim: int, mxu: str, interpret: bool,
):
    spec_rows = PartitionSpec(AXIS)
    spec_data = PartitionSpec(AXIS)
    spec_repl = PartitionSpec()
    perm = [((i + 1) % n_dev, i) for i in range(n_dev)]

    def epoch(theta_ext, phi_ext, gu, gv, pb, hyper):
        # Local views: leading device axis of the data is size 1.
        gu, gv = gu[0], gv[0]          # (P, NB)
        pb = pb[0]

        def substep(carry, xs):
            theta_ext, phi_ext = carry
            sgu, sgv, spb = xs
            theta_ext, phi_ext = pallas_sgd._run_epoch(
                theta_ext, phi_ext, sgu, sgv, spb, hyper,
                tile_u=tile_u, tile_v=tile_v, batch=batch, dim=dim,
                n_gu=n_gu, n_gv=n_gv, mxu=mxu, interpret=interpret,
                mxu_pred=True,
            )
            phi_ext = jax.lax.ppermute(phi_ext, AXIS, perm)
            return (theta_ext, phi_ext), None

        (theta_ext, phi_ext), _ = jax.lax.scan(
            substep, (theta_ext, phi_ext), (gu, gv, pb)
        )
        return theta_ext, phi_ext

    return jax.jit(
        jax.shard_map(
            epoch,
            mesh=mesh,
            in_specs=(spec_rows, spec_rows) + (spec_data,) * 3 + (spec_repl,),
            out_specs=(spec_rows, spec_rows),
            # pallas_call's ShapeDtypeStructs carry no varying-mesh-axes
            # metadata; skip the vma check for the kernel-in-shard_map case.
            check_vma=False,
        ),
        donate_argnums=(0, 1),
    )


class ShardedPallasRunner:
    """Multi-chip fused-kernel DSGD epochs over a static sharded plan."""

    def __init__(
        self,
        ds: RatingsCOO,
        mesh: Mesh,
        tile_u: int = 512,
        tile_v: int = 512,
        batch: int = 4096,
        seed: int = 0,
        mxu: str = "bfloat16",
        interpret: bool = False,
    ):
        self.mesh = mesh
        self.n_dev = mesh.devices.size
        self.nu, self.nv = ds.nu, ds.nv
        self.mxu, self.interpret = mxu, interpret
        batch = cdiv(batch, 8) * 8
        self.tile_u, self.tile_v, self.batch = tile_u, tile_v, batch
        self.splan = partition_pallas(ds, self.n_dev, tile_u, tile_v, batch, seed)
        shard = row_sharding(mesh)
        # The MF kernel consumes fused id streams (pallas_sgd.UV_BASE doc);
        # ShardedPlan keeps the split arrays for the SGLD/AdaptReg kernels.
        uv = self.splan.u * pallas_sgd.UV_BASE + self.splan.v
        # Byte-plane stream (pallas_sgd.stream_planes; leading (P, S) axes
        # flattened through the plane build, then restored).
        P, S, NB, subb, _ = uv.shape
        pb = jax.jit(pallas_sgd.stream_planes)(
            uv.reshape(P * S * NB, subb, 8),
            self.splan.r.reshape(P * S * NB, subb, 8),
        ).reshape(P, S, NB, 56, subb)
        self.dev = tuple(
            jax.device_put(x, shard)
            for x in (self.splan.gu, self.splan.gv, pb)
        )

    def pad(self, params: MFParams):
        self.dim = params.theta.shape[1]
        self.gb = float(params.gb)
        return pad_sharded(params, self.splan, self.mesh)

    def epoch(self, tables, eta: float, lam: float):
        hyper = jnp.asarray([eta, lam, self.gb], jnp.float32)
        fn = _sharded_epoch_fn(
            self.mesh, self.n_dev, self.tile_u, self.tile_v, self.batch,
            self.splan.chunk_u // self.tile_u, self.splan.chunk_v // self.tile_v,
            self.dim, self.mxu, self.interpret,
        )
        return fn(tables[0], tables[1], *self.dev, hyper)

    def trim(self, tables) -> MFParams:
        return unpack_sharded(
            tables[0], tables[1], self.nu, self.nv, self.dim, self.gb
        )
