"""Shared diagonal-block partitioning for slot-major mesh runners.

Factors the plan-construction half of parallel/dsgd_slot.py so the SGLD and
AdaptReg gen-2 mesh runners (round-3 VERDICT #3: only MF had a slot kernel
under shard_map) build identical structures: ratings partitioned into
(device-shard p, substep s) diagonal blocks — block (p, s) holds ratings
with u in user-chunk p and v in item-chunk (p + s) mod P, so each substep's
P blocks touch disjoint theta AND phi chunks — then slot plans per block
padded to a common per-substep batch count (sentinel columns are no-ops:
their one-hot columns are all zero).

``sub`` is chosen once from the summed bucket counts of all blocks so the
jitted program is identical across devices and substeps.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import numpy as np

from tpu_mf.data.coo import RatingsCOO
from tpu_mf.ops.pallas_sgd import cdiv
from tpu_mf.ops.pallas_sgd_slot import (
    SlotPlan,
    _slot_bucket_counts,
    pick_sub,
    pick_sub_stripe,
    prepare_cells_slot,
    prepare_cells_stripe,
)


class SlotDiagonal(NamedTuple):
    """Per-substep stacked slot plans (leading axis = device)."""

    gu: list          # S x (P, NB_s) int32
    gv: list          # S x (P, NB_s, 8) int32
    u: list           # S x (P, NB_s, sub, 8P) int32
    v: list           # S x (P, NB_s, sub, 8P) int32
    r: list           # S x (P, NB_s, sub, 8P) float32
    nb: list          # S ints
    sub: int
    chunk_u: int
    chunk_v: int
    n_gu: int         # per-device user tiles
    n_gv: int         # per-device item tiles
    plans: dict       # (p, s) -> SlotPlan (for stats/tests)
    n_real: int


def partition_slot_diagonal(
    ds: RatingsCOO,
    n_dev: int,
    tile: int,
    pack: int,
    sub: int | None,
    seed: int,
    sub_scale: float = 1.0,
    striped: bool = False,
) -> SlotDiagonal:
    """Diagonal-block slot plans for an ``n_dev`` mesh (see module doc).

    ``sub_scale`` scales the auto-picked column height (SGLD's heavier
    per-tile apply amortizes better with taller columns — the measured
    1.25x rule from ops/pallas_sgld_slot.SlotSgldRunner).

    ``striped`` builds delta-striped plans per block
    (pallas_sgd_slot.prepare_cells_stripe): striping only reorganizes
    columns WITHIN a (user-tile, item-tile) pair, so diagonal-block
    disjointness (chunk membership) is untouched."""
    P = n_dev
    chunk_u = cdiv(cdiv(ds.nu, P), tile) * tile
    chunk_v = cdiv(cdiv(ds.nv, P), tile) * tile
    shard_u = ds.u // chunk_u
    substep = (ds.v // chunk_v - shard_u) % P

    counts = None
    locals_ = {}
    for p in range(P):
        for s in range(P):
            sel = (shard_u == p) & (substep == s)
            local = RatingsCOO(
                (ds.u[sel] % chunk_u).astype(np.int32),
                (ds.v[sel] % chunk_v).astype(np.int32),
                ds.r[sel].astype(np.float32),
                nu=chunk_u, nv=chunk_v,
            )
            locals_[(p, s)] = local
            c = _slot_bucket_counts(local, tile, tile, pack)
            counts = c if counts is None else counts + c
    if sub is None:
        if striped:
            # counts are summed over blocks with identical (tile, pack)
            # geometry; each block has n_gv = chunk_v // tile item tiles.
            sub = pick_sub_stripe(counts, pack, chunk_v // tile)
        else:
            base = pick_sub(counts, pack)
            sub = max(8, int(base * sub_scale) // 8 * 8)
    builder = prepare_cells_stripe if striped else prepare_cells_slot

    plans = {
        k: builder(
            v, tile, tile, sub, seed * 7919 + k[0] * P + k[1], pack
        )
        for k, v in locals_.items()
    }
    rows = tile // pack
    nb = [max(plans[(p, s)].u.shape[0] for p in range(P)) for s in range(P)]
    GU, GV, U, V, R = [], [], [], [], []
    for s in range(P):
        n = nb[s]
        gu = np.zeros((P, n), np.int32)
        gv = np.zeros((P, n, 8), np.int32)
        u = np.full((P, n, sub, 8 * pack), rows, np.int32)
        v = np.full((P, n, sub, 8 * pack), rows, np.int32)
        r = np.zeros((P, n, sub, 8 * pack), np.float32)
        for p in range(P):
            plan = plans[(p, s)]
            nbp = plan.u.shape[0]
            gu[p, :nbp] = plan.gu
            # pad batches keep the last real gu (aliased-ref rule)
            gu[p, nbp:] = plan.gu[-1] if nbp else 0
            gv[p, :nbp] = plan.gv
            u[p, :nbp] = plan.u
            v[p, :nbp] = plan.v
            r[p, :nbp] = plan.r
        GU.append(gu)
        GV.append(gv)
        U.append(u)
        V.append(v)
        R.append(r)
    return SlotDiagonal(
        gu=GU, gv=GV, u=U, v=V, r=R, nb=nb, sub=sub,
        chunk_u=chunk_u, chunk_v=chunk_v,
        n_gu=chunk_u // tile, n_gv=chunk_v // tile,
        plans=plans, n_real=len(ds),
    )


def diagonal_dup_stats(diag: SlotDiagonal, pack: int, tile: int) -> tuple:
    """(user, item) window-duplicate maxima over all blocks, per grouping."""
    from tpu_mf.ops.pallas_sgd import _dup_stats
    from tpu_mf.ops.pallas_sgd_slot import slot_col_ids

    du = {g: 0 for g in (1, 2, 4, 8)}
    dv = {g: 0 for g in (1, 2, 4, 8)}
    for plan in diag.plans.values():
        su = _dup_stats(slot_col_ids(plan.u, pack), tile)
        sv = _dup_stats(slot_col_ids(plan.v, pack), tile)
        for g in (1, 2, 4, 8):
            du[g] = max(du[g], su[g])
            dv[g] = max(dv[g], sv[g])
    return du, dv


class SlotPlanView:
    """Adapter exposing the SlotPlan fields pack/unpack helpers read, for
    the FULL mesh-padded tables (n_dev * per-device tiles)."""

    def __init__(self, tile: int, n_dev: int, n_gu: int, n_gv: int,
                 pack: int):
        self.tile_u = tile
        self.tile_v = tile
        self.n_gu = n_dev * n_gu
        self.n_gv = n_dev * n_gv
        self.pack = pack
