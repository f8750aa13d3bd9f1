"""Slot-major fused Pallas SGD epoch kernel: P ratings per sublane row.

Fourth-generation small-rank kernel. The lane-packed kernel
(ops/pallas_sgd_packed.py) still spends most of its step on elementwise VPU
work over (B/8, 128) arrays in which each sublane row carries ONE rating
that occupies a single m = 128/P lane slot — at P=8, 7/8 of every
mid-chain elementwise op (pred, err, rhs construction, masks) is wasted on
empty lanes. Measured v5e ablations: the step is compute-bound (~3.4
ns/rating at d8), not DMA- or floor-bound.

Here each sublane row carries P ratings, one per slot, so every lane of
every mid-chain op does useful work (P-fold reduction). The enabling trick
is a **slot-major stacked table layout**: table row ``id`` lives at physical
row ``(id % P) * rows + (id % tile) // P`` of its tile with data ONLY in
slot ``id % P``'s lanes (other lanes zero). Then

* a multi-row gather ``t[s] = sum_j table[phys(id_{s,j})]`` — one one-hot
  matmul whose lhs rows have P ones — lands each rating's data in its own
  slot with NO masking (the layout pre-masks the table);
* the multi-hot is built as P narrow per-segment compares ``iota_rows ==
  id_j`` concatenated at segment boundaries (128-lane-aligned at tile =
  128*P, where lane concatenation is free) — per-rating cost rows =
  TILE/P compare lanes, same as the packed kernel, with no comparand
  matmuls;
* scatter garbage (a rhs row's other-slot lanes hitting another slot's
  physical row) is erased by ONE constant mask multiply folded into the
  m_keep apply mask.

Slot alignment constraints are host-side plan construction, as in the
packed kernel: rating (u, v) goes to slot j = u %% P of a column whose
delta class is (v - u) %% P (static lane rolls align item slots onto user
slots). Per-slot ratings broadcast to their slot's lanes via tiny
(sub, P) @ (P, 128) one-hot matmuls. Geometric per-occurrence decay,
adaptive theta/phi grouping, deferred item apply, and the resident item
table all match the packed kernel.

Round 3: slots are HOMOGENEOUS rows — theta [fac | bu | 1 | cnt], phi
[fac | 1 | bv | cnt] (ops/pallas_sgd.py) — so the mid-chain is maskless:
pred = slot-sum(t*p) + gb, rhs = err*p / err*t (5 elementwise ops vs 11).
P in {2, 4, 8} (dim <= 61).

Reference cost model being beaten: src/mf.h:94-109 (~10*dim flops + 4 row
accesses per rating, CPU memory-bound).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_mf.data.coo import RatingsCOO
from tpu_mf.models.mf import MFParams
from tpu_mf.ops.pallas_sgd import (
    LANES,
    UV_BASE,
    UV_SHIFT,
    _apply_flags,
    _dup_stats,
    cdiv,
)


class SlotPlan(NamedTuple):
    """Slot-major epoch layout. A batch = 8 columns x sub rows x P slots;
    lane k*P+j of row s is column k's slot-j rating."""

    u: np.ndarray    # (NB, sub, 8P) int32 segment-local packed-row ids
    v: np.ndarray    # (NB, sub, 8P) int32; sentinel = rows_v
    r: np.ndarray    # (NB, sub, 8P) float32
    gu: np.ndarray   # (NB,) int32 user-tile per batch
    gv: np.ndarray   # (NB, 8) int32 item-tile per column
    tile_u: int
    tile_v: int
    sub: int
    n_gu: int
    n_gv: int
    n_real: int
    pack: int


def prepare_cells_slot(
    ds: RatingsCOO,
    tile_u: int,
    tile_v: int,
    sub: int,
    seed: int,
    pack: int,
) -> SlotPlan:
    """Disk-cached plan build (ops/plan_cache.py)."""
    from tpu_mf.ops.plan_cache import cached_build

    return cached_build(
        "slot", SlotPlan, ds, seed, (tile_u, tile_v, sub, pack),
        lambda: _prepare_cells_slot_impl(ds, tile_u, tile_v, sub, seed, pack),
    )


def _prepare_cells_slot_impl(
    ds: RatingsCOO,
    tile_u: int,
    tile_v: int,
    sub: int,
    seed: int,
    pack: int,
) -> SlotPlan:
    """Bucket shuffled ratings by (user-tile, delta, item-tile, slot) and
    fill slot-major columns; fully vectorized cumsum+scatter fill."""
    P = pack
    assert tile_u % P == 0 and tile_v % P == 0 and 8 % P == 0
    rows_u = tile_u // P
    rows_v = tile_v // P
    n_gu = cdiv(ds.nu, tile_u)
    n_gv = cdiv(ds.nv, tile_v)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(ds))
    u, v, r = ds.u[perm], ds.v[perm], ds.r[perm]

    g = u // tile_u
    gv = v // tile_v
    j = u % P
    d = (v - u) % P
    cell = ((g * P + d) * n_gv + gv).astype(np.int64)   # column class + tile
    bucket = cell * P + j
    order = np.argsort(bucket, kind="stable")
    u, v, r, bucket = u[order], v[order], r[order], bucket[order]
    counts = np.bincount(bucket, minlength=n_gu * P * n_gv * P)
    # A cell's columns hold all P slots; its column count is driven by its
    # fullest slot.
    cols_per_cell = cdiv_np(counts.reshape(-1, P).max(1), sub)
    cpc = 8 // P
    cols_per_class = cols_per_cell.reshape(n_gu, P, n_gv).sum(2)
    nb_per_group = np.maximum(
        1, cdiv_np(cols_per_class, cpc).max(1)
    ).astype(np.int64)
    nb_total = int(nb_per_group.sum())

    U = np.full((nb_total, sub, 8 * P), rows_u, np.int32)   # sentinel
    V = np.full((nb_total, sub, 8 * P), rows_v, np.int32)
    R = np.zeros((nb_total, sub, 8 * P), np.float32)
    GU = np.zeros(nb_total, np.int32)
    GV = np.zeros((nb_total, 8), np.int32)

    src = np.concatenate([[0], np.cumsum(counts)])
    col_cs = np.concatenate([[0], np.cumsum(cols_per_cell)])
    base = np.concatenate([[0], np.cumsum(nb_per_group)])
    GU[:] = np.repeat(np.arange(n_gu, dtype=np.int32), nb_per_group)

    l = np.arange(len(u), dtype=np.int64) - src[bucket]   # index in bucket
    cellv = bucket // P
    cls = cellv // n_gv                                   # (group, delta)
    gg = cls // P
    dd = (cls % P).astype(np.int64)
    jj = (bucket % P).astype(np.int64)
    col_in_class = (col_cs[cellv] - col_cs[cls * n_gv]) + l // sub
    b = base[gg] + col_in_class // cpc
    kcol = dd + (col_in_class % cpc) * P
    lane = kcol * P + jj
    row = l % sub
    flat = (b * sub + row) * (8 * P) + lane
    U.reshape(-1)[flat] = ((u % tile_u) // P).astype(np.int32)
    V.reshape(-1)[flat] = ((v % tile_v) // P).astype(np.int32)
    R.reshape(-1)[flat] = r
    GV.reshape(-1)[b * 8 + kcol] = (cellv % n_gv).astype(np.int32)
    return SlotPlan(
        u=U, v=V, r=R, gu=GU, gv=GV,
        tile_u=tile_u, tile_v=tile_v, sub=sub, n_gu=n_gu, n_gv=n_gv,
        n_real=len(ds), pack=P,
    )


def cdiv_np(a, b):
    return -(-a // b)


def prepare_cells_stripe(
    ds: RatingsCOO,
    tile_u: int,
    tile_v: int,
    sub: int,
    seed: int,
    pack: int,
) -> SlotPlan:
    """Disk-cached striped plan build (ops/plan_cache.py)."""
    from tpu_mf.ops.plan_cache import cached_build

    return cached_build(
        "stripe", SlotPlan, ds, seed, (tile_u, tile_v, sub, pack),
        lambda: _prepare_cells_stripe_impl(ds, tile_u, tile_v, sub, seed,
                                           pack),
    )


def _prepare_cells_stripe_impl(
    ds: RatingsCOO,
    tile_u: int,
    tile_v: int,
    sub: int,
    seed: int,
    pack: int,
) -> SlotPlan:
    """DELTA-STRIPED slot plan: a column's P sublane segments each carry a
    DIFFERENT (static) delta class — segment s holds ratings with
    (v - u) %% P == s.

    The plain slot plan pins one delta class per column (delta = k %% P),
    so every (user-tile, delta, item-tile) cell needs its own columns and
    nb floors at n_gu * n_gv with one column per fullest (cell, slot)
    bucket. Striping lets the 8 delta-buckets of a (user-tile, item-tile)
    PAIR share columns: columns per pair = max over the P*P (delta, slot)
    buckets of ceil(count / (sub/P)). That breaks the structural nb floor
    and — because the MXU gather matmuls are ~flat in M up to ~448 at
    K=1024 (benchmarks/probe_segmm.py) — lets sub grow into the regime
    where the per-column matmul cost amortizes over 2x the ratings.

    Stream layout per column k (lanes k*P..(k+1)*P-1):
      * lane k*P + j carries the u id and rating of the segment-s rating
        whose user slot is j (u %% P == j), at row s*(sub/P) + l;
      * lane k*P + (j + s) %% P == k*P + v %% P carries its ITEM id — i.e.
        v ids are arranged by their OWN slot, so the kernel's item one-hots
        are built exactly like the user side (no delta indexing) and only
        the gathered rows / scatter rhs need per-segment lane rolls.
    """
    P = pack
    assert tile_u % P == 0 and tile_v % P == 0 and 8 % P == 0
    assert sub % P == 0, f"striped plans need P | sub, got {sub} / {P}"
    seg = sub // P
    rows_u = tile_u // P
    rows_v = tile_v // P
    n_gu = cdiv(ds.nu, tile_u)
    n_gv = cdiv(ds.nv, tile_v)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(ds))
    u, v, r = ds.u[perm], ds.v[perm], ds.r[perm]

    g = u // tile_u
    gvt = v // tile_v
    j = u % P
    s = (v - u) % P
    pair = g.astype(np.int64) * n_gv + gvt
    bucket = (pair * P + s) * P + j
    order = np.argsort(bucket, kind="stable")
    u, v, r, bucket = u[order], v[order], r[order], bucket[order]
    counts = np.bincount(bucket, minlength=n_gu * n_gv * P * P)
    ncols_pair = cdiv_np(counts.reshape(-1, P * P).max(1), seg)
    cols_per_gu = ncols_pair.reshape(n_gu, n_gv).sum(1)
    nb_per_gu = np.maximum(1, cdiv_np(cols_per_gu, 8)).astype(np.int64)
    nb_total = int(nb_per_gu.sum())

    U = np.full((nb_total, sub, 8 * P), rows_u, np.int32)   # sentinel
    V = np.full((nb_total, sub, 8 * P), rows_v, np.int32)
    R = np.zeros((nb_total, sub, 8 * P), np.float32)
    GU = np.repeat(np.arange(n_gu, dtype=np.int32), nb_per_gu).astype(
        np.int32
    )
    GV = np.zeros((nb_total, 8), np.int32)

    src = np.concatenate([[0], np.cumsum(counts)])
    col_cs = np.concatenate([[0], np.cumsum(ncols_pair)])
    base = np.concatenate([[0], np.cumsum(nb_per_gu)])

    l = np.arange(len(u), dtype=np.int64) - src[bucket]   # index in bucket
    pairid = bucket // (P * P)
    ss = (bucket // P) % P
    jj = bucket % P
    gg = pairid // n_gv
    col_in_gu = (col_cs[pairid] - col_cs[gg * n_gv]) + l // seg
    b = base[gg] + col_in_gu // 8
    kcol = col_in_gu % 8
    row = ss * seg + l % seg
    lane_u = kcol * P + jj
    lane_v = kcol * P + (jj + ss) % P
    flat_u = (b * sub + row) * (8 * P) + lane_u
    flat_v = (b * sub + row) * (8 * P) + lane_v
    U.reshape(-1)[flat_u] = ((u % tile_u) // P).astype(np.int32)
    V.reshape(-1)[flat_v] = ((v % tile_v) // P).astype(np.int32)
    R.reshape(-1)[flat_u] = r
    GV.reshape(-1)[b * 8 + kcol] = (pairid % n_gv).astype(np.int32)
    return SlotPlan(
        u=U, v=V, r=R, gu=GU, gv=GV,
        tile_u=tile_u, tile_v=tile_v, sub=sub, n_gu=n_gu, n_gv=n_gv,
        n_real=len(ds), pack=P,
    )


def slot_col_ids(ids: np.ndarray, pack: int) -> np.ndarray:
    """(NB, sub, 8P) segment-local ids -> (NB, sub*P, 8) full-local ids for
    duplicate-window statistics (sentinel rows map >= tile)."""
    P = pack
    nb, sub, _ = ids.shape
    i4 = ids.reshape(nb, sub, 8, P)
    j = np.arange(P, dtype=ids.dtype)
    full = i4 * P + j  # local id = packed_row * P + slot
    return np.swapaxes(full, 2, 3).reshape(nb, sub * P, 8)


def _slot_bucket_counts(
    ds: RatingsCOO, tile_u: int, tile_v: int, pack: int
) -> np.ndarray:
    """Per-(user-tile, delta, item-tile, slot) bucket sizes. Shuffle-
    invariant, so the sub auto-tuner can run before any plan is built."""
    P = pack
    n_gu = cdiv(ds.nu, tile_u)
    n_gv = cdiv(ds.nv, tile_v)
    g = ds.u // tile_u
    gv = ds.v // tile_v
    d = (ds.v - ds.u) % P
    bucket = (
        ((g.astype(np.int64) * P + d) * n_gv + gv) * P + ds.u % P
    )
    return np.bincount(bucket, minlength=n_gu * P * n_gv * P)


def slot_dup_lower_bound(
    ds: RatingsCOO,
    dim: int | None = None,
    pack: int | None = None,
    tile_u: int | None = None,
    tile_v: int | None = None,
    sub: int | None = None,
    balance: bool = False,
) -> Tuple[int, int]:
    """(lower bound on max within-column duplicates at g=8, chosen sub).

    Shuffle-INVARIANT pigeonhole bound, computable before any plan exists:
    a row with c ratings in its (cell, slot) bucket is spread over the
    cell's ncols columns, so some column holds >= ceil(c / ncols) of them.
    The train loop uses this to skip building slot plans entirely (they are
    argsort-bound, tens of seconds at 100M ratings) when even the LAST
    epoch's decayed eta cannot satisfy eta * dups <= 0.2; the exact
    per-plan statistics (envelope_ok) still gate the built runner.
    """
    if pack is None:
        assert dim is not None, "pass dim= or pack="
        pack = slot_packing_factor(dim)
    P = pack
    tile_u = tile_u or 128 * P
    tile_v = tile_v or 128 * P
    if balance:
        # must match the production runners' map (cross_tile=True) so the
        # pre-gate sees the same bucket structure
        ds, _, _ = balance_dataset(ds, tile_u, tile_v, P, cross_tile=True)
    counts = _slot_bucket_counts(ds, tile_u, tile_v, P)
    if sub is None:
        sub = pick_sub(counts, P)
    rows_u = tile_u // P
    rows_v = tile_v // P
    n_gv = cdiv(ds.nv, tile_v)
    ncols = np.maximum(cdiv_np(counts.reshape(-1, P).max(1), sub), 1)

    g = ds.u.astype(np.int64) // tile_u
    gvt = ds.v.astype(np.int64) // tile_v
    d = (ds.v.astype(np.int64) - ds.u) % P
    bucket = ((g * P + d) * n_gv + gvt) * P + ds.u % P

    def side_bound(ids, tile, rows):
        key = bucket * rows + (ids.astype(np.int64) % tile) // P
        c = np.bincount(key)
        nz = np.nonzero(c)[0]
        if nz.size == 0:
            return 0
        return int(cdiv_np(c[nz], ncols[nz // (rows * P)]).max())

    lb = max(
        side_bound(ds.u, tile_u, rows_u),
        side_bound(ds.v, tile_v, rows_v),
    )
    return lb, sub


_SUB_CANDIDATES = (32, 64, 128, 192, 256, 384, 512)

GV_SMEM_LIMIT = 900_000  # bytes of scalar-prefetch metadata before the
                         # kernel switches gv/ap to the blocked VMEM stream


def pick_sub(counts: np.ndarray, pack: int) -> int:
    """Column height maximizing throughput: fill from the exact bucket
    sizes (cell columns quantize at its fullest slot) over a measured
    per-slot cost model a + b/sub (larger sub amortizes per-column fixed
    work: tile applies, broadcasts, rolls).

    Constants refit on the round-3 calibrated ML-10M balanced sweep
    (pg=tg=1, tile 1024): per-slot cost at sub 128/192/256/384 measured
    1.71/1.51/1.34/1.25 (arb units) == 1.0 + 94/sub to within 2%. The
    off-grid heights 96 and 320 ran 13-16% ABOVE that trend (Mosaic
    retiling off the 128-sublane grid), so the candidate list keeps only
    the heights that measured on-trend."""
    per_cell_max = counts.reshape(-1, pack).max(1)
    n = int(counts.sum())
    best, best_score = 128, -1.0
    for sub in _SUB_CANDIDATES:
        cols = cdiv_np(per_cell_max, sub)
        slots = int(cols.sum()) * sub * pack
        if slots == 0:
            continue
        fill = n / slots
        score = fill / (1.0 + 94.0 / sub)
        if score > best_score:
            best, best_score = sub, score
    return best


_SUB_CANDIDATES_STRIPE = (128, 192, 256, 320, 384, 448, 512)


def pick_sub_stripe(counts: np.ndarray, pack: int, n_gv: int) -> int:
    """pick_sub for DELTA-STRIPED plans (prepare_cells_stripe): a column's
    P segments each hold one delta class, so a (user-tile, item-tile)
    pair's columns quantize at its fullest (delta, slot) bucket against
    segment height sub/P. The flat per-column share is larger than the
    plain slot kernel's (the gather/scatter matmuls are ~flat in sub up to
    ~448, benchmarks/probe_segmm.py), so the cost model rewards taller
    columns; constant measured round 4 (benchmarks/sweep_stripe.py).
    Candidates keep 8 | sub/P (sublane-aligned segments)."""
    n = int(counts.sum())
    # counts keyed ((gu*P + d)*n_gv + gv)*P + j -> (n_gu, P, n_gv, P)
    per_pair_max = (
        counts.reshape(-1, pack, n_gv, pack).max(axis=(1, 3)).reshape(-1)
    )
    best, best_score = 128, -1.0
    for sub in _SUB_CANDIDATES_STRIPE:
        seg = sub // pack
        if sub % pack or seg % 8:
            continue
        cols = cdiv_np(per_pair_max, seg)
        slots = int(cols.sum()) * sub * pack
        if slots == 0:
            continue
        fill = n / slots
        score = fill / (1.0 + 170.0 / sub)
        if score > best_score:
            best, best_score = sub, score
    return best


def _balance_map(counts: np.ndarray, tile: int, pack: int) -> np.ndarray:
    """``new_of_old`` relabeling: per-tile capacity-constrained LPT over
    slots.

    Within each ``tile``-sized id block, rows are assigned heaviest-first
    to the least-loaded slot that still has physical rows free (longest-
    processing-time scheduling with per-slot capacity tile/P). This
    balances per-(cell, slot) bucket sizes under zipfy marginals, where
    the natural ``id % P`` hash lets one head row blow up a single slot
    bucket and every cell column quantizes at its fullest slot
    (cols_per_cell in _prepare_cells_slot_impl). Measured on the
    calibrated ML-10M stand-in: natural hash fill 0.477 (sub 192) ->
    LPT 0.754 (sub 128); round-robin-by-rank only reaches 0.636. Tile
    membership (id // tile) is PRESERVED so head/tail mixing across tiles
    is unchanged."""
    P = pack
    n = counts.size
    n_pad = cdiv(n, tile) * tile
    c = np.zeros(n_pad, np.int64)
    c[:n] = counts
    rows = tile // P
    out = np.empty(n_pad, np.int64)
    for t in range(n_pad // tile):
        seg = c[t * tile : (t + 1) * tile]
        order = np.argsort(-seg, kind="stable")
        load = np.zeros(P, np.float64)
        nxt = np.zeros(P, np.int64)
        for o in order:
            j = int(np.argmin(np.where(nxt < rows, load, np.inf)))
            out[t * tile + o] = t * tile + j + P * nxt[j]
            load[j] += seg[o]
            nxt[j] += 1
    return out[:n].astype(np.int32)


def _balance_map_serpentine(
    counts: np.ndarray, tile: int, pack: int
) -> np.ndarray:
    """``new_of_old`` relabeling: GLOBAL serpentine heaviest-first deal
    across all (tile, slot) buckets.

    _balance_map preserves tile membership, so zipfy heads still pile into
    whichever tiles they started in and the per-CELL size spread (the
    cols_per_cell ceil waste) survives. Dealing ids heaviest-first across
    every (tile, slot) bucket serpentine-wise (the balance_cells idea from
    the gen-1 cell plans, composed with the slot-level LPT) equalizes
    per-tile loads AND per-slot loads in one vectorized pass: sorted id at
    position i -> pass p = i // B, bucket b = i % B (reversed on odd
    passes, B = n_tiles * P buckets), new id = t*tile + p*P + j for
    b = (t, j). Every bucket receives exactly tile/P ids (capacity-exact).
    Measured calibrated ML-10M rank 8 SGLD (tile 1024, sub auto): fill
    0.54 -> see PERF_NOTES round-3-late."""
    P = pack
    n = counts.size
    n_pad = cdiv(n, tile) * tile
    c = np.zeros(n_pad, np.int64)
    c[:n] = counts
    rows = tile // P
    B = (n_pad // tile) * P
    order = np.argsort(-c, kind="stable")
    i = np.arange(n_pad, dtype=np.int64)
    p = i // B
    b = i % B
    b = np.where(p % 2 == 1, B - 1 - b, b)
    t, j = b // P, b % P
    out = np.empty(n_pad, np.int64)
    out[order] = t * tile + p * P + j
    return out[:n].astype(np.int32)


def balance_dataset(
    ds: RatingsCOO, tile_u: int, tile_v: int, pack: int,
    cross_tile: bool = False,
) -> Tuple[RatingsCOO, np.ndarray, np.ndarray]:
    """Relabel user/item ids so head rows spread across slots within each
    tile (see _balance_map), or across tiles too (cross_tile=True,
    _balance_map_serpentine). Returns (relabeled ds, map_u, map_v) where the
    maps are new-id-of-old-id; the relabeled ds is padded to whole tiles
    (same n_gu/n_gv). Training on the relabeled ids is exact — the same
    updates hit the same rows, just at different physical table positions —
    and pack/unpack_params_slot invert the maps at the table boundary."""
    bmap = _balance_map_serpentine if cross_tile else _balance_map
    mu = bmap(np.bincount(ds.u, minlength=ds.nu), tile_u, pack)
    mv = bmap(np.bincount(ds.v, minlength=ds.nv), tile_v, pack)
    ds2 = RatingsCOO(
        u=mu[ds.u], v=mv[ds.v], r=ds.r,
        nu=cdiv(ds.nu, tile_u) * tile_u, nv=cdiv(ds.nv, tile_v) * tile_v,
    )
    return ds2, mu, mv


def slot_packing_factor(dim: int) -> int:
    """Rows per 128-lane row; slot = [fac | bias | one | cnt] (homogeneous
    rows, like ops/pallas_sgd.py)."""
    if dim + 3 <= 16:
        return 8
    if dim + 3 <= 32:
        return 4
    if dim + 3 <= 64:
        return 2
    return 1


def pack_params_slot(
    params: MFParams, plan: SlotPlan,
    map_u: np.ndarray | None = None, map_v: np.ndarray | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Slot-major stacked tables: table row ``id`` at physical row
    (id // tile)*tile + (id % P)*rows + (id % tile)//P, data in slot
    id % P's lanes only. Homogeneous slots — theta [fac | bu | 1 | cnt],
    phi [fac | 1 | bv | cnt] — so pred = slot-sum(t*p) + gb with no lane
    masks in the mid-chain. Optional ``map_u/map_v`` are balance_dataset
    relabelings (new-id-of-old-id): row i of params lands at the physical
    position of its NEW id."""
    P = plan.pack
    m = LANES // P
    dim = params.theta.shape[1]
    assert dim + 3 <= m

    def pack(fac, bias, tile, total_rows, one_first, idmap):
        n = fac.shape[0]
        ids = np.arange(n) if idmap is None else idmap.astype(np.int64)
        rows = tile // P
        phys = (ids // tile) * tile + (ids % P) * rows + (ids % tile) // P
        slot = ids % P
        one = jnp.ones((n, 1), jnp.float32)
        b = bias[:, None].astype(jnp.float32)
        cols = [fac.astype(jnp.float32)] + ([one, b] if one_first else [b, one])
        fused = jnp.concatenate(cols, axis=1)
        fused = jnp.pad(fused, ((0, 0), (0, m - fused.shape[1])))
        out = jnp.zeros((total_rows, P, m), jnp.float32)
        out = out.at[phys, slot].set(fused)
        return out.reshape(total_rows, LANES)

    return (
        pack(params.theta, params.bu, plan.tile_u,
             plan.n_gu * plan.tile_u, False, map_u),
        pack(params.phi, params.bv, plan.tile_v,
             plan.n_gv * plan.tile_v, True, map_v),
    )


def unpack_params_slot(
    theta_s, phi_s, nu, nv, dim, gb, tile_u, tile_v, pack,
    map_u: np.ndarray | None = None, map_v: np.ndarray | None = None,
) -> MFParams:
    P = pack
    m = LANES // P

    def unpack(tab, n, tile, bias_lane, idmap):
        ids = np.arange(n) if idmap is None else idmap.astype(np.int64)
        rows = tile // P
        phys = (ids // tile) * tile + (ids % P) * rows + (ids % tile) // P
        slot = ids % P
        t3 = tab.reshape(-1, P, m)
        fused = t3[phys, slot]
        return fused[:, :dim], fused[:, bias_lane]

    th, bu = unpack(theta_s, nu, tile_u, dim, map_u)
    ph, bv = unpack(phi_s, nv, tile_v, dim + 1, map_v)  # [fac | 1 | bv]
    return MFParams(theta=th, phi=ph, bu=bu, bv=bv,
                    gb=jnp.asarray(gb, jnp.float32))


def _slot_kernel(
    *refs,
    tile_u: int, tile_v: int, sub: int, dim: int, pack: int,
    mxu_dtype, theta_groups: int, phi_groups: int, scatter_dg: bool = False,
    gv_vmem: bool = False, saturate: bool = False, striped: bool = False,
):
    # Two metadata layouts: per-batch gv/ap normally ride SMEM scalar
    # prefetch (fast scalar reads), but a huge plan's (nb*8) int32 arrays
    # overflow the ~1 MB SMEM around nb ~ 13k (Netflix-scale single chip).
    # gv_vmem then streams them as a blocked (1, 1, 128) VMEM row per batch
    # (gvap = gv*2 + ap; ~20% slower from the scalar VMEM loads).
    if gv_vmem:
        (gu_ref, hyper_ref, gvap_ref, uv_ref, uvt_ref, r_ref, theta_ref,
         phi_hbm, theta_out, phi_out, acc, sem) = refs
    else:
        (gu_ref, gv_ref, ap_ref, hyper_ref, uv_ref, uvt_ref, r_ref,
         theta_ref, phi_hbm, theta_out, phi_out, acc, sem) = refs
    P = pack
    m = LANES // P
    rows_u = tile_u // P
    rows_v = tile_v // P
    eta = hyper_ref[0]
    lam = hyper_ref[1]
    gb = hyper_ref[2]
    if saturate:
        cap = hyper_ref[3]

    def sat(d, k):
        """Per-(row, slot) window-step saturation (pallas_sgd.sat_scale):
        the slot column window is sub*P slots, so warm etas on zipfy heads
        need the same delta cap as the gen-1/packed kernels."""
        if not saturate:
            return d
        return d * jnp.minimum(1.0, cap / jnp.maximum(k, 1.0))

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

    uv3 = uv_ref[0]    # (sub, 8P) packed local ids
    uvt3 = uvt_ref[0]  # (8P, sub)
    r3 = r_ref[0]      # (sub, 8P)
    theta = theta_out[:]  # (TILE_U, 128) slot-major state

    # Lane-role constants for the homogeneous slots: theta [fac|bu|1|cnt],
    # phi [fac|1|bv|cnt] (pack_params_slot).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    slot_lane = lane >> (m.bit_length() - 1)
    inslot = lane - slot_lane * m
    m_fac = (inslot < dim).astype(jnp.float32)
    m_bias_u = (inslot == dim).astype(jnp.float32)
    m_one_u = (inslot == dim + 1).astype(jnp.float32)
    m_bias_v = m_one_u
    m_one_v = m_bias_u
    m_cnt = (inslot == dim + 2).astype(jnp.float32)
    # Count-broadcast: (d @ CB)[:, l] == d[:, slot(l)*m + dim + 2].
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    CB = (c_iota == slot_lane * m + (dim + 2)).astype(jnp.float32)
    # Slot-sum broadcast: (S @ SS)[:, l] = sum over l' in slot(l) of S[:, l'].
    SS = (slot_lane == (c_iota >> (m.bit_length() - 1))).astype(jnp.float32)
    # Per-slot scalar broadcast: (x (sub,P) @ E)[:, l] = x[:, slot(l)].
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (P, LANES), 0)
    E = (p_iota == slot_lane).astype(jnp.float32)
    # Narrow per-segment one-hot iotas; segments concatenate at rows_*-lane
    # boundaries (128-aligned at tile = 128*P, where the concat is free).
    iota_ru = jax.lax.broadcasted_iota(jnp.int32, (sub, rows_u), 1)
    iota_rv = jax.lax.broadcasted_iota(jnp.int32, (sub, rows_v), 1)
    iota_rut = jax.lax.broadcasted_iota(jnp.int32, (rows_u, sub), 0)
    iota_rvt = jax.lax.broadcasted_iota(jnp.int32, (rows_v, sub), 0)
    # Scatter-garbage eraser folded with the keep mask: physical row block
    # j keeps only slot j's [factors | bias] lanes. The homogeneous one-lane
    # needs NO restore op: the decay exponent is per-lane (lnv_*, zero on
    # one/cnt lanes), so stored 1s ride through exp() untouched while the
    # delta's garbage one-lane dies in MK_*.
    rseg_u = jax.lax.broadcasted_iota(jnp.int32, (tile_u, 1), 0) // rows_u
    mkd_u = (rseg_u == slot_lane).astype(jnp.float32)
    MK_u = mkd_u * (m_fac + m_bias_u)
    MC_u = mkd_u * m_cnt
    rseg_v = jax.lax.broadcasted_iota(jnp.int32, (tile_v, 1), 0) // rows_v
    mkd_v = (rseg_v == slot_lane).astype(jnp.float32)
    MK_v = mkd_v * (m_fac + m_bias_v)
    MS_v = mkd_v * (m_fac + m_bias_v + m_cnt)

    lameta = 1.0 - eta * lam
    ln_lameta = jnp.log(lameta)
    lnv_u = ln_lameta * (m_fac + m_bias_u)  # per-lane decay exponents
    lnv_v = ln_lameta * (m_fac + m_bias_v)
    seg = sub // pack

    def roll_segs(x, to_user_slots: bool):
        """Striped columns: sublane segment s carries delta class s, so the
        gathered item rows roll per SEGMENT (static shifts, cheap sublane
        concat at 8-multiples) instead of per column. to_user_slots rolls
        item-slot lanes onto user-slot lanes (gather side); the inverse
        sends the scatter rhs back to item-slot lanes."""
        parts = []
        for si in range(P):
            sh = ((P - si) % P if to_user_slots else si) * m
            blk = x[si * seg : (si + 1) * seg]
            parts.append(pltpu.roll(blk, sh, 1) if sh else blk)
        return jnp.concatenate(parts, axis=0)

    tg_w = 8 // theta_groups
    pg_w = 8 // phi_groups
    theta_mx = None
    d_theta_g = None
    pending = []
    for k in range(8):
        if k % tg_w == 0:
            theta_mx = theta.astype(mxu_dtype)
            d_theta_g = jnp.zeros((tile_u, LANES), jnp.float32)

        if gv_vmem:
            off = pl.multiple_of((gvap_ref[0, 0, k] >> 1) * tile_v, tile_v)
        else:
            off = pl.multiple_of(gv_ref[8 * i + k] * tile_v, tile_v)
        delta = k % P  # static: columns are delta-classed by the plan
        phi = phi_out[pl.ds(off, tile_v), :]
        phi_mx = phi.astype(mxu_dtype)

        uc = uv3[:, k * P : (k + 1) * P]          # (sub, P) packed ids
        ut = uvt3[k * P : (k + 1) * P, :]          # (P, sub)
        u_i = uc >> UV_SHIFT
        v_i = uc & (UV_BASE - 1)
        ut_i = ut >> UV_SHIFT
        vt_i = ut & (UV_BASE - 1)

        # Multi-hot gather lhs (a row has up to P ones, one per segment):
        # per-segment narrow compares concatenated at segment boundaries.
        # Item segment sv holds slot (sv - delta) %% P's id (the plan's
        # delta-class alignment).
        oh_u = jnp.concatenate(
            [
                (iota_ru == u_i[:, j : j + 1]).astype(mxu_dtype)
                for j in range(P)
            ],
            axis=1,
        )
        # Striped plans arrange v ids by their OWN slot (lane sv carries a
        # slot-sv item id), so the item one-hots index like the user side.
        oh_v = jnp.concatenate(
            [
                (iota_rv
                 == v_i[:, sv : sv + 1] if striped
                 else iota_rv
                 == v_i[:, (sv - delta) % P : (sv - delta) % P + 1]
                 ).astype(mxu_dtype)
                for sv in range(P)
            ],
            axis=1,
        )
        if not scatter_dg:
            # Pre-transposed scatter one-hots from the host-transposed ids.
            oht_u = jnp.concatenate(
                [
                    (iota_rut == ut_i[j : j + 1, :]).astype(mxu_dtype)
                    for j in range(P)
                ],
                axis=0,
            )
            oht_v = jnp.concatenate(
                [
                    (iota_rvt
                     == vt_i[sv : sv + 1, :] if striped
                     else iota_rvt
                     == vt_i[(sv - delta) % P : (sv - delta) % P + 1, :]
                     ).astype(mxu_dtype)
                    for sv in range(P)
                ],
                axis=0,
            )

        # Slot-major gathers: each slot's data arrives pre-masked by the
        # table layout; item slots roll from v%P = (j+delta)%P onto j.
        t = jnp.dot(oh_u, theta_mx, preferred_element_type=jnp.float32)
        p0 = jnp.dot(oh_v, phi_mx, preferred_element_type=jnp.float32)
        if striped:
            p = roll_segs(p0, to_user_slots=True)
        else:
            p = pltpu.roll(p0, ((P - delta) % P) * m, 1) if delta else p0

        # Per-slot broadcast of ratings. No weight stream is needed:
        # padded slots carry the sentinel id, whose one-hot column is all
        # zero, so their err/cnt contributions die in the scatter matmuls
        # and their garbage pred (= gb) is bounded.
        r_b = jnp.dot(
            r3[:, k * P : (k + 1) * P], E, preferred_element_type=jnp.float32
        )

        # Homogeneous slots: slot-sum(t*p) = t.p + bu + bv — NO masks (the
        # cnt lanes of stored rows are zero; unused lanes are zero).
        pred = jnp.dot(t * p, SS, preferred_element_type=jnp.float32) + gb
        err = eta * (r_b - pred)

        rhs_u = (err * p + m_cnt).astype(mxu_dtype)
        rhs_v0 = err * t + m_cnt
        if striped:
            rhs_v = roll_segs(rhs_v0, to_user_slots=False).astype(mxu_dtype)
        else:
            rhs_v = (
                pltpu.roll(rhs_v0, delta * m, 1) if delta else rhs_v0
            ).astype(mxu_dtype)
        # Scatter; other-slot garbage lanes are erased by MK_* at apply.
        if scatter_dg:
            # Contract the sublane axis of the GATHER one-hot directly —
            # no transposed one-hot construction, no transposed id stream.
            dg = (((0,), (0,)), ((), ()))
            d_theta_g += jax.lax.dot_general(
                oh_u, rhs_u, dg, preferred_element_type=jnp.float32
            )
            d_phi = jax.lax.dot_general(
                oh_v, rhs_v, dg, preferred_element_type=jnp.float32
            )
        else:
            d_theta_g += jnp.dot(
                oht_u, rhs_u, preferred_element_type=jnp.float32
            )
            d_phi = jnp.dot(oht_v, rhs_v, preferred_element_type=jnp.float32)

        if phi_groups == 8:
            k_v = jnp.dot(
                d_phi * MS_v, CB, preferred_element_type=jnp.float32
            )
            phi_out[pl.ds(off, tile_v), :] = (
                phi * jnp.exp(k_v * lnv_v) + sat(d_phi, k_v) * MK_v
            )
        else:
            pending.append((k, off, phi, d_phi))
            if k % pg_w == pg_w - 1:
                for kk, off_, phi_, dphi_ in pending:
                    acc[pl.ds(off_, tile_v), :] += dphi_ * MS_v

                    apk = (
                        (gvap_ref[0, 0, kk] & 1) if gv_vmem
                        else ap_ref[8 * i + kk]
                    )

                    @pl.when(apk == 1)
                    def _(off_=off_, phi_=phi_):
                        a = acc[pl.ds(off_, tile_v), :]
                        k_v = jnp.dot(
                            a, CB, preferred_element_type=jnp.float32
                        )
                        phi_out[pl.ds(off_, tile_v), :] = (
                            phi_ * jnp.exp(k_v * lnv_v) + sat(a, k_v) * MK_v
                        )
                        acc[pl.ds(off_, tile_v), :] = jnp.zeros_like(a)

                pending = []

        if k % tg_w == tg_w - 1:
            k_u = jnp.dot(
                d_theta_g * MC_u, CB, preferred_element_type=jnp.float32
            )
            theta = theta * jnp.exp(k_u * lnv_u) + sat(d_theta_g, k_u) * MK_u

    theta_out[:] = theta


@functools.partial(
    jax.jit,
    donate_argnums=(0, 1),
    static_argnames=(
        "tile_u", "tile_v", "sub", "dim", "pack", "n_gu", "n_gv", "mxu",
        "interpret", "theta_groups", "phi_groups", "scatter_dg", "saturate",
        "striped",
    ),
)
def _run_slot_epoch(
    theta_s, phi_s,
    gu, gv, ap, uv, uvt, r, hyper,
    *, tile_u, tile_v, sub, dim, pack, n_gu, n_gv, mxu="bfloat16",
    interpret=False, theta_groups=8, phi_groups=8, scatter_dg=False,
    saturate=False, striped=False,
):
    assert theta_groups in (1, 2, 4, 8), theta_groups
    assert phi_groups in (1, 2, 4, 8), phi_groups
    nb = uv.shape[0]
    # gu + 8*gv + 8*ap int32s vs the ~1 MB SMEM (patchable for tests)
    gv_vmem = nb * 17 * 4 > GV_SMEM_LIMIT
    if gv_vmem:
        # (NB, 1, 128) int32, lanes 0..7 = item-tile*2 + apply-flag (lane
        # dims must be 128-divisible or whole for TPU block specs).
        gvap = jnp.pad(
            gv.reshape(nb, 8) * 2 + ap.reshape(nb, 8), ((0, 0), (0, 120))
        )[:, None, :]
    kernel = functools.partial(
        _slot_kernel,
        tile_u=tile_u, tile_v=tile_v, sub=sub, dim=dim, pack=pack,
        mxu_dtype=jnp.dtype(mxu), theta_groups=theta_groups,
        phi_groups=phi_groups, scatter_dg=scatter_dg, gv_vmem=gv_vmem,
        saturate=saturate, striped=striped,
    )
    lanes8 = 8 * pack
    scratch = [
        pltpu.VMEM((n_gv * tile_v, LANES), jnp.float32),
        pltpu.SemaphoreType.DMA,
    ]
    kw = dict(
        out_shape=[
            jax.ShapeDtypeStruct((n_gu * tile_u, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_gv * tile_v, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )
    if gv_vmem:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # gu, hyper
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, 1, LANES), lambda i, a, h: (i, 0, 0)),
                pl.BlockSpec((1, sub, lanes8), lambda i, a, h: (i, 0, 0)),
                pl.BlockSpec((1, lanes8, sub), lambda i, a, h: (i, 0, 0)),
                pl.BlockSpec((1, sub, lanes8), lambda i, a, h: (i, 0, 0)),
                pl.BlockSpec((tile_u, LANES), lambda i, a, h: (a[i], 0)),
                pl.BlockSpec(memory_space=pl.ANY),   # phi (HBM)
            ],
            out_specs=[
                pl.BlockSpec((tile_u, LANES), lambda i, a, h: (a[i], 0)),
                pl.BlockSpec(
                    (n_gv * tile_v, LANES), lambda i, a, h: (0, 0)
                ),
            ],
            scratch_shapes=scratch,
        )
        theta_s, phi_s = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            # operands: gu, hyper, gvap, uv, uvt, r, theta=6, phi=7
            input_output_aliases={6: 0, 7: 1}, **kw,
        )(gu, hyper, gvap, uv, uvt, r, theta_s, phi_s)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,  # gu, gv, ap, hyper
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(
                    (1, sub, lanes8), lambda i, a, b, c, h: (i, 0, 0)
                ),
                pl.BlockSpec(
                    (1, lanes8, sub), lambda i, a, b, c, h: (i, 0, 0)
                ),
                pl.BlockSpec(
                    (1, sub, lanes8), lambda i, a, b, c, h: (i, 0, 0)
                ),
                pl.BlockSpec(
                    (tile_u, LANES), lambda i, a, b, c, h: (a[i], 0)
                ),
                pl.BlockSpec(memory_space=pl.ANY),   # phi (HBM)
            ],
            out_specs=[
                pl.BlockSpec(
                    (tile_u, LANES), lambda i, a, b, c, h: (a[i], 0)
                ),
                pl.BlockSpec(
                    (n_gv * tile_v, LANES), lambda i, a, b, c, h: (0, 0)
                ),
            ],
            scratch_shapes=scratch,
        )
        theta_s, phi_s = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            # operands: gu, gv, ap, hyper, uv, uvt, r, theta=7, phi=8
            input_output_aliases={7: 0, 8: 1}, **kw,
        )(gu, gv.reshape(-1), ap.reshape(-1), hyper, uv, uvt, r,
          theta_s, phi_s)
    return theta_s, phi_s


class SlotEpochRunner:
    """Holds SlotPlans on device and runs slot-major fused epochs.

    Drop-in counterpart of PackedEpochRunner for dim <= 61; a batch covers
    8 * sub * P ratings. ``sub`` trades per-column fixed cost against cell
    padding: denser datasets want larger sub."""

    def __init__(
        self,
        ds: RatingsCOO,
        tile_u: int | None = None,
        tile_v: int | None = None,
        sub: int | None = None,
        seed: int = 0,
        mxu: str = "bfloat16",
        interpret: bool = False,
        theta_groups=None,
        phi_groups=None,
        n_plans: int = 1,
        dim: int | None = None,
        pack: int | None = None,
        scatter_dg: bool = False,
        balance: bool = False,
        saturate: bool = False,
        striped: bool = False,
    ):
        # Per-(row, slot) window-step saturation (pallas_sgd.sat_scale).
        self.saturate = saturate
        self.striped = striped
        if pack is None:
            assert dim is not None, "pass dim= or pack="
            pack = slot_packing_factor(dim)
        assert pack in (2, 4, 8), (
            f"slot kernel needs pack in 2/4/8 (dim <= 61), got {pack}"
        )
        self.pack = pack
        tile_u = tile_u or 128 * pack
        tile_v = tile_v or 128 * pack
        self.nu, self.nv = ds.nu, ds.nv  # pre-relabel row counts for trim
        self._map_u = self._map_v = None
        if balance:
            # cross_tile: +15% at calibrated Netflix (486.6 -> 558.5M/s,
            # fill .545 -> .622); neutral where nb floors (ML-10M SGLD).
            ds, self._map_u, self._map_v = balance_dataset(
                ds, tile_u, tile_v, pack, cross_tile=True
            )
        if sub is None:
            bc = _slot_bucket_counts(ds, tile_u, tile_v, pack)
            if striped:
                sub = pick_sub_stripe(bc, pack, cdiv(ds.nv, tile_v))
            else:
                sub = pick_sub(bc, pack)
        self.sub = sub
        if striped:
            assert sub % pack == 0, (sub, pack)
        assert max(tile_u // pack, tile_v // pack) < UV_BASE
        builder = prepare_cells_stripe if striped else prepare_cells_slot
        self.plans = [
            builder(ds, tile_u, tile_v, sub, seed + 7919 * p, pack)
            for p in range(max(1, n_plans))
        ]
        self.plan = self.plans[0]
        self.tile_u, self.tile_v = tile_u, tile_v
        self.mxu = mxu
        self.interpret = interpret
        if theta_groups is not None:
            assert theta_groups in (1, 2, 4, 8), theta_groups
        if phi_groups is not None:
            assert phi_groups in (1, 2, 4, 8), phi_groups
        self.theta_groups = theta_groups
        self.phi_groups = phi_groups
        self.scatter_dg = scatter_dg
        self._dup_max = None
        self._vdup_max = None
        self._warned = set()
        if theta_groups is None:
            stats = [
                _dup_stats(self._col_ids(p.u, tile_u), tile_u)
                for p in self.plans
            ]
            self._dup_max = {g: max(s[g] for s in stats) for g in (1, 2, 4, 8)}
        if phi_groups is None:
            stats = [
                _dup_stats(self._col_ids(p.v, tile_v), tile_v)
                for p in self.plans
            ]
            self._vdup_max = {g: max(s[g] for s in stats) for g in (1, 2, 4, 8)}
        # Device staging is LAZY (materialize/devs): the train-loop
        # schedule probes many candidate runners for their envelope stats
        # alone, and losing candidates must not pay plan uploads to the
        # (tunneled) TPU or transiently raise peak HBM (round-4 ADVICE #1).
        self._devs = None
        self._flags = None

    def materialize(self):
        """Upload plan streams to the device (idempotent). Called lazily
        by pad(); envelope probing never triggers it."""
        if self._devs is not None:
            return self
        devs, flags = [], []
        for plan in self.plans:
            uv = plan.u * UV_BASE + plan.v
            devs.append((
                jnp.asarray(plan.gu),
                jnp.asarray(plan.gv),
                jnp.asarray(uv),
                jnp.asarray(np.swapaxes(uv, 1, 2).copy()),
                jnp.asarray(plan.r),
            ))
            flags.append({
                g: jnp.asarray(_apply_flags(plan.gv, g)) for g in (1, 2, 4)
            } | {8: jnp.ones_like(jnp.asarray(plan.gv))})
        self._devs, self._flags = devs, flags
        return self

    @property
    def devs(self):
        return self.materialize()._devs

    @property
    def flags(self):
        return self.materialize()._flags

    @property
    def dev(self):
        return self.devs[0]

    def _col_ids(self, ids: np.ndarray, sentinel: int) -> np.ndarray:
        return slot_col_ids(ids, self.pack)

    @property
    def n_slots(self) -> int:
        return int(self.plan.u.size)

    def pick_theta_groups(self, eta: float) -> int:
        """See pallas_sgd.PallasEpochRunner.pick_theta_groups. NOTE the
        slot layout's window is sub*P slots per column — P times the packed
        kernel's at equal sub, so the envelope binds at smaller eta."""
        if self.theta_groups is not None:
            return self.theta_groups
        for g in (1, 2, 4, 8):
            if eta * self._dup_max[g] <= 0.2:
                return g
        self._warn_envelope("theta", eta, self._dup_max[8])
        return 8

    def pick_phi_groups(self, eta: float) -> int:
        """See pallas_sgd_packed.PackedEpochRunner.pick_phi_groups."""
        if self.phi_groups is not None:
            return self.phi_groups
        for g in (1, 2, 4, 8):
            if eta * self._vdup_max[g] <= 0.2:
                return g
        self._warn_envelope("phi", eta, self._vdup_max[8])
        return 8

    def envelope_ok(self, eta: float) -> bool:
        """True when SOME grouping keeps eta*max_window_dups <= 0.2 on
        both sides (adaptive runners only; explicit groups skip the check).
        The train loop uses this to fall back to the packed kernel (window
        sub instead of sub*P) at warm-start etas that the slot layout's
        wider column window cannot absorb."""
        du = self._dup_max[8] if self._dup_max else 0
        dv = self._vdup_max[8] if self._vdup_max else 0
        return eta * max(du, dv) <= 0.2

    def _warn_envelope(self, side: str, eta: float, dups: int) -> None:
        if side in self._warned:  # once per runner per side, not per eta
            return
        self._warned.add(side)
        import warnings

        warnings.warn(
            f"slot kernel {side}-side staleness envelope exceeded even at "
            f"the most sequential grouping: eta={eta:g} x max window "
            f"duplicates {dups} = {eta * dups:.2f} > 0.2. A row hit that "
            "often inside one sub*P-slot column accumulates that many "
            "stale gradients and can diverge (bias terms first). Reduce "
            "eta, use a smaller sub, or the packed kernel (window = sub).",
            stacklevel=3,
        )

    def epoch(self, tables, eta: float, lam: float, gb: float,
              epoch_idx: int = 0):
        cap = max(1.0, 0.2 / max(eta, 1e-9))
        hyper = jnp.asarray([eta, lam, gb, cap], jnp.float32)
        plan_i = epoch_idx % len(self.plans)
        pg = self.pick_phi_groups(eta)
        gu, gv, uv, uvt, r = self.devs[plan_i]
        return _run_slot_epoch(
            tables[0], tables[1], gu, gv, self.flags[plan_i][pg],
            uv, uvt, r, hyper,
            tile_u=self.tile_u, tile_v=self.tile_v, sub=self.sub,
            dim=self.dim, pack=self.pack,
            n_gu=self.plan.n_gu, n_gv=self.plan.n_gv,
            mxu=self.mxu, interpret=self.interpret,
            theta_groups=self.pick_theta_groups(eta),
            phi_groups=pg, scatter_dg=self.scatter_dg,
            saturate=self.saturate, striped=self.striped,
        )

    def pad(self, params: MFParams):
        self.materialize()
        self.dim = params.theta.shape[1]
        self.gb = float(params.gb)
        return pack_params_slot(params, self.plan, self._map_u, self._map_v)

    def trim(self, tables, dim: int | None = None) -> MFParams:
        return unpack_params_slot(
            tables[0], tables[1], self.nu, self.nv, dim or self.dim,
            self.gb, self.tile_u, self.tile_v, self.pack,
            self._map_u, self._map_v,
        )


def slot_eligible(params: MFParams, batch_size: int = 8192) -> bool:
    """Slot kernel needs dim <= 61 (dim + 3 lanes per slot at pack 2,
    slot_packing_factor) and the slot-major (unpacked-width) item
    table + deferred scratch resident in VMEM."""
    dim = params.theta.shape[1]
    pack = slot_packing_factor(dim)
    if pack < 2:
        return False
    nv = params.phi.shape[0]
    tile_v = 128 * pack
    vmem_phi = cdiv(nv, tile_v) * tile_v * LANES * 4
    return 2 * vmem_phi <= 64 * 1024 * 1024
