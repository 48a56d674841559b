"""Equal-count kd-grid kNN: exact k-nearest-neighbour search that only visits
candidates near each query, breaking the brute-force extraction wall.

This replaces the per-step brute-force kNN-3 of the hierarchical sampler
(the reference's CPU sklearn fit/query per diffusion step,
/root/reference/models/diffusion_model.py:244-246). The brute Pallas kernel is
extraction-pass-bound at ~13 full passes over all 30k refs per query tile
(docs/PERF_NOTES.md); a UNIFORM spatial grid was built and measured first but
loses to brute force on realistic clouds: point density varies orders of
magnitude (gaussian core vs tail, sensor sweeps), so uniform cells hold 300+
refs at the median and the static per-slot capacity always overflows.

The density-adaptive structure that fixes this is an **equal-count kd-grid**:

1. Refs sort by x and split into ``Sx`` slabs of equal COUNT; each slab sorts
   by y into ``Sy`` rows of equal count; each row sorts by z into ``Sz``
   cells of equal count. Cell populations are ~M/(Sx*Sy*Sz) everywhere — by
   construction, independent of density. All cell start offsets are pure
   integer functions of (M, Sx, Sy, Sz): compile-time constants, no tables
   built from data. Three 30k sorts cost ~0.2 ms on TPU (PERF_NOTES: sorts
   are cheap — design around them).
2. Queries locate their cell with a handful of vectorized boundary
   comparisons, then sort by cell id and are scattered into a PER-ROW padded
   layout (each (slab,row)'s queries padded to a multiple of ``tq``). Every
   query tile therefore lies in exactly ONE row — its 27-cell neighbourhood
   is 9 z-runs in 9 DISTINCT (slab,row) pairs: disjoint contiguous ranges of
   the sorted ref array, with no overlap to deduplicate.
3. Each run pads to a static ``slot_cap`` (uniform cell counts make the run
   lengths uniform too); candidates gather densely to [T, 9*slot_cap, 3] and
   a per-tile dense Pallas kNN (the exact two-reduction kernel of
   ops/pallas/distance_topk.py) produces top-k per query.
4. **Exactness proof + fallback.** The covered region around a tile contains
   the conservative box X∩Y∩Z (X: its 3 slabs' extent; Y: the 3 rows'
   common extent; Z: the 9 z-runs' common extent; domain edges extend to
   ±inf since no refs exist beyond them). A query's result is provably exact
   when ball(q, sqrt(d_k)) fits inside that box and no slot overflowed
   slot_cap. Rows failing the check are brute-forced — gathered into a
   ``fallback_cap`` buffer if few, or the whole call switches to the brute
   kernel via ``lax.cond`` if many. Either way the result is exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_FAR = 1e15  # padding coordinate, matching the brute kernels
_INF = jnp.float32(3e38)


def _brute(query: jnp.ndarray, ref: jnp.ndarray, k: int, interpret: bool,
           exact: bool):
    """Unbatched brute-force kNN (f32-packed kernel only when near-tie
    approximation is allowed and the ref count fits its 2^15 index budget)."""
    from .pallas.distance_topk import (_knn_f32packed_single, _knn_single)
    m_padded = -(-ref.shape[0] // 2048) * 2048
    if not exact and m_padded <= (1 << 15):
        return _knn_f32packed_single(query, ref, k, tq=256, tr=2048,
                                     interpret=interpret)
    return _knn_single(query, ref, k, interpret=interpret)


def _partition_tables(M: int, Sx: int, Sy: int, Sz: int):
    """Static integer partition of M sorted refs into Sx*Sy*Sz equal-count
    cells. Returns (SB [Sx+1] slab starts, RB [Sx,Sy+1] row starts,
    CS [Sx*Sy*Sz+1] flat cell starts, slab_of_pos [M], row_of_pos [M]) —
    all numpy, i.e. compile-time constants."""
    SB = (np.arange(Sx + 1) * M) // Sx
    RB = SB[:-1, None] + (np.arange(Sy + 1)[None, :]
                          * (SB[1:] - SB[:-1])[:, None]) // Sy
    row_len = RB[:, 1:] - RB[:, :-1]  # [Sx, Sy]
    CS = (RB[:, :-1, None]
          + (np.arange(Sz + 1)[None, None, :] * row_len[:, :, None]) // Sz)
    CS = np.concatenate([CS[:, :, :-1].reshape(-1), [M]]).astype(np.int32)
    slab_of_pos = np.repeat(np.arange(Sx), SB[1:] - SB[:-1])
    row_of_pos = np.repeat(np.arange(Sx * Sy), row_len.reshape(-1))
    return SB, RB, CS, slab_of_pos.astype(np.int32), row_of_pos.astype(np.int32)


def _grid_knn_core(query: jnp.ndarray, ref: jnp.ndarray, k: int,
                   grid_shape, tq: int, slot_cap: int,
                   interpret: bool, exact: bool):
    """Grid pass only: returns (d [Nq,k], idx [Nq,k], unsafe [Nq]) where
    ``unsafe`` marks rows whose exactness could not be proven (to be
    re-done by the caller's brute fallback)."""
    from .pallas.distance_topk import _knn_f32packed_single, _knn_single

    Sx, Sy, Sz = grid_shape
    Nq = query.shape[0]
    M = ref.shape[0]
    R = Sx * Sy
    query = query.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    SB, RB, CS_np, slab_pos, row_pos = _partition_tables(M, Sx, Sy, Sz)
    CS = jnp.asarray(CS_np)

    # --- build: three partial sorts into the equal-count structure ---
    o1 = jnp.argsort(ref[:, 0])
    ref1 = ref[o1]
    o2 = jnp.lexsort((ref1[:, 1], jnp.asarray(slab_pos)))
    ref2 = ref1[o2]
    o3 = jnp.lexsort((ref2[:, 2], jnp.asarray(row_pos)))
    refs_s = ref2[o3]  # cell (s,r,z) occupies rows [CS[c], CS[c+1])
    order_r = o1[o2][o3]  # sorted position -> original ref index
    refs_pad = jnp.concatenate(
        [refs_s, jnp.full((1, 3), _FAR, jnp.float32)])

    # --- boundary values (gathers at STATIC positions) ---
    xb = ref1[SB[1:-1], 0]  # [Sx-1] inner slab boundaries
    yb = ref2[RB[:, 1:-1], 1]  # [Sx, Sy-1] inner row boundaries per slab
    zcs = CS_np[:-1].reshape(R, Sz)
    zb = refs_s[zcs[:, 1:], 2]  # [R, Sz-1] inner cell boundaries per row
    # outer boundaries for margins; domain edges are open (no refs beyond)
    xb_full = jnp.concatenate([jnp.array([-_INF]), xb, jnp.array([_INF])])
    yb_full = jnp.concatenate(
        [jnp.full((Sx, 1), -_INF), yb, jnp.full((Sx, 1), _INF)], axis=1)
    zb_full = jnp.concatenate(
        [jnp.full((R, 1), -_INF), zb, jnp.full((R, 1), _INF)], axis=1)

    # --- query cell assignment (vectorized boundary compares) ---
    qsx = jnp.sum(query[:, 0:1] >= xb[None, :], axis=1)  # [Nq]
    qsy = jnp.sum(query[:, 1:2] >= yb[qsx], axis=1)
    qrow = qsx * Sy + qsy
    qsz = jnp.sum(query[:, 2:3] >= zb[qrow], axis=1)

    # --- row-aligned padded layout: each row's queries padded to tq ---
    order_q = jnp.argsort(qrow * Sz + qsz)
    row_s = qrow[order_q]
    counts = jnp.zeros((R,), jnp.int32).at[row_s].add(1)
    rowstart = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)])
    pcounts = -(-counts // tq) * tq
    prowstart = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(pcounts)])
    # sorted query i sits at padded position prowstart[row] + within-row rank
    pos = prowstart[row_s] + (jnp.arange(Nq, dtype=jnp.int32)
                              - rowstart[row_s])
    NP = Nq + R * tq  # static upper bound on the padded length
    NP = -(-NP // tq) * tq
    q_pad = jnp.full((NP, 3), _FAR, jnp.float32).at[pos].set(
        query[order_q], mode="drop")
    orig_pad = jnp.full((NP,), Nq, jnp.int32).at[pos].set(
        order_q.astype(jnp.int32), mode="drop")

    T = NP // tq
    qt = q_pad.reshape(T, tq, 3)
    real_t = (orig_pad < Nq).reshape(T, tq)
    # per-tile VALUE ranges over real queries (padding excluded)
    vymin = jnp.min(jnp.where(real_t, qt[:, :, 1], _INF), axis=1)
    vymax = jnp.max(jnp.where(real_t, qt[:, :, 1], -_INF), axis=1)
    vzmin = jnp.min(jnp.where(real_t, qt[:, :, 2], _INF), axis=1)
    vzmax = jnp.max(jnp.where(real_t, qt[:, :, 2], -_INF), axis=1)
    empty_t = ~jnp.any(real_t, axis=1)
    yc = jnp.where(empty_t, 0.0, (vymin + vymax) * 0.5)
    vzmin = jnp.where(empty_t, 0.0, vzmin)
    vzmax = jnp.where(empty_t, 0.0, vzmax)
    # each tile lies in exactly one row
    trow = (jnp.searchsorted(prowstart,
                             jnp.arange(T, dtype=jnp.int32) * tq,
                             side="right") - 1).clip(0, R - 1)
    tsx, tsy = trow // Sy, trow % Sy

    # --- 9 slots: one z-run in each of 9 neighbouring (slab,row) pairs.
    # Neighbour rows and z-runs are selected by VALUE (searchsorted of the
    # tile's value range in the neighbour's OWN partition), not by index
    # offset: equal-count partitions of different slabs/rows are mutually
    # shifted, and index-offset selection was measured to cost ~14% unsafe
    # rows through collapsed covered-box margins. Value selection keeps the
    # covered box >= one local cell beyond the tile's extent on every face.
    offs = np.array([(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
                    np.int32)
    sx3 = tsx[:, None] + np.array([-1, 0, 1])[None, :]  # [T, 3]
    slab3_ok = (sx3 >= 0) & (sx3 < Sx)
    sx3c = jnp.clip(sx3, 0, Sx - 1)
    # row of the tile's y-centre in each neighbour slab's own partition
    r3 = jnp.sum(yc[:, None, None] >= yb[sx3c], axis=2)  # [T, 3]
    dxi = offs[:, 0] + 1  # slot -> index into the 3 slabs
    sy2 = jnp.take_along_axis(r3, jnp.asarray(dxi)[None, :].repeat(T, 0),
                              axis=1) + offs[None, :, 1]  # [T, 9]
    sx2 = sx3[:, jnp.asarray(dxi)]  # [T, 9]
    valid_pair = (slab3_ok[:, jnp.asarray(dxi)]
                  & (sy2 >= 0) & (sy2 < Sy))
    row2 = (jnp.clip(sx2, 0, Sx - 1) * Sy + jnp.clip(sy2, 0, Sy - 1))
    # z-run per pair covering [vzmin, vzmax] +- one local cell
    zb2 = zb[row2]  # [T, 9, Sz-1]
    zlo = jnp.clip(jnp.sum(vzmin[:, None, None] >= zb2, axis=2) - 1,
                   0, Sz - 1)  # [T, 9]
    zhi = jnp.clip(jnp.sum(vzmax[:, None, None] >= zb2, axis=2) + 1,
                   0, Sz - 1)
    st = CS[row2 * Sz + zlo]
    en = CS[row2 * Sz + zhi + 1]
    st = jnp.where(valid_pair, st, 0)
    en = jnp.where(valid_pair, en, 0)
    tile_ok = jnp.all(en - st <= slot_cap, axis=1)  # [T]

    # --- dense candidates (slots are disjoint by construction: 9 distinct
    # rows -> no dedup pass needed) ---
    p = st[:, :, None] + jnp.arange(slot_cap, dtype=jnp.int32)  # [T, 9, cap]
    cand_ids = jnp.where(p < en[:, :, None], p, M).reshape(T, 9 * slot_cap)
    cand = refs_pad[cand_ids]  # [T, C, 3]

    # --- per-tile dense kNN (exact two-reduction kernel by default; the
    # candidate set is ~30x smaller than brute force so the extra reduction
    # is affordable and selection is bit-exact) ---
    base = _knn_single if exact else _knn_f32packed_single
    knn_fn = functools.partial(base, k=k, tq=tq, tr=9 * slot_cap,
                               interpret=interpret)
    d_s, li = jax.vmap(knn_fn)(q_pad.reshape(T, tq, 3), cand)  # [T, tq, k]
    gidx = jax.vmap(lambda ci, l: ci[l])(cand_ids, li)
    ridx = jnp.where(gidx < M, order_r[jnp.clip(gidx, 0, M - 1)], 0)

    # --- conservative covered box per tile -> per-query safety margin ---
    x_lo = xb_full[jnp.maximum(tsx - 1, 0)]
    x_hi = xb_full[jnp.minimum(tsx + 1, Sx - 1) + 1]
    # rows used per slab are r3-1..r3+1 in that slab's OWN partition;
    # intersect the covered y-interval across the (up to 3) covered slabs
    y_lo_cand = yb_full[sx3c, jnp.maximum(r3 - 1, 0)]  # [T, 3]
    y_hi_cand = yb_full[sx3c, jnp.minimum(r3 + 1, Sy - 1) + 1]
    y_lo = jnp.max(jnp.where(slab3_ok, y_lo_cand, -_INF), axis=1)
    y_hi = jnp.min(jnp.where(slab3_ok, y_hi_cand, _INF), axis=1)
    z_lo_cand = zb_full[row2, zlo]
    z_hi_cand = zb_full[row2, zhi + 1]
    z_lo = jnp.max(jnp.where(valid_pair, z_lo_cand, -_INF), axis=1)
    z_hi = jnp.min(jnp.where(valid_pair, z_hi_cand, _INF), axis=1)

    margin = jnp.minimum(
        jnp.minimum(jnp.minimum(qt[:, :, 0] - x_lo[:, None],
                                x_hi[:, None] - qt[:, :, 0]),
                    jnp.minimum(qt[:, :, 1] - y_lo[:, None],
                                y_hi[:, None] - qt[:, :, 1])),
        jnp.minimum(qt[:, :, 2] - z_lo[:, None],
                    z_hi[:, None] - qt[:, :, 2]))
    margin = jnp.maximum(margin, 0.0)
    safe = tile_ok[:, None] & (d_s[:, :, k - 1] <= margin * margin)

    # --- unsort to original query order ---
    flat_orig = orig_pad  # padded slot -> original query row (Nq = dropped)
    d_out = jnp.zeros((Nq, k), jnp.float32).at[flat_orig].set(
        d_s.reshape(-1, k), mode="drop")
    i_out = jnp.zeros((Nq, k), jnp.int32).at[flat_orig].set(
        ridx.reshape(-1, k), mode="drop")
    unsafe = jnp.zeros((Nq,), bool).at[flat_orig].set(
        ~safe.reshape(-1), mode="drop")
    return d_out, i_out, unsafe


@functools.partial(jax.jit, static_argnames=("k", "grid_shape", "tq",
                                             "slot_cap", "fallback_cap",
                                             "interpret", "exact"))
def _grid_knn_single(query: jnp.ndarray, ref: jnp.ndarray, k: int,
                     grid_shape, tq: int, slot_cap: int, fallback_cap: int,
                     interpret: bool, exact: bool):
    """Unbatched kd-grid kNN: query [Nq, 3], ref [M, 3] -> ([Nq,k], [Nq,k])."""
    Nq = query.shape[0]
    query = query.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    d_out, i_out, unsafe = _grid_knn_core(query, ref, k, grid_shape, tq,
                                          slot_cap, interpret, exact)
    n_unsafe = jnp.sum(unsafe)

    def patched(_):
        ids = jnp.nonzero(unsafe, size=fallback_cap, fill_value=Nq)[0]
        qf = query[jnp.clip(ids, 0, Nq - 1)]
        db, ib = _brute(qf, ref, k, interpret, exact)
        return (d_out.at[ids].set(db, mode="drop"),
                i_out.at[ids].set(ib, mode="drop"))

    def all_brute(_):
        return _brute(query, ref, k, interpret, exact)

    return jax.lax.cond(n_unsafe <= fallback_cap, patched, all_brute, None)


def grid_knn(query: jnp.ndarray, ref: jnp.ndarray, k: int = 3, *,
             grid_shape=(12, 12, 20), tq: int = 128, slot_cap: int = 96,
             fallback_cap: int = 8192, interpret: bool = False,
             exact: bool = True):
    """Batched equal-count kd-grid kNN: query [B, N, 3], ref [B, M, 3] ->
    (sq_dists [B, N, k], indices [B, N, k]), ascending, exact.

    Batches run through ``lax.map`` (not vmap) so the size-dependent
    ``lax.cond`` fallback stays a real branch instead of degrading to an
    always-pay-both select."""
    cells = int(np.prod(grid_shape))
    if ref.shape[1] < max(k, 4 * cells):
        # refs too sparse for this grid resolution: brute force is fine there
        return jax.vmap(
            lambda q, r: _brute(q, r, k, interpret, exact))(query, ref)
    fn = functools.partial(_grid_knn_single, k=k, grid_shape=tuple(grid_shape),
                           tq=tq, slot_cap=slot_cap,
                           fallback_cap=fallback_cap,
                           interpret=interpret, exact=exact)
    if query.shape[0] == 1:
        d, i = fn(query[0], ref[0])
        return d[None], i[None]
    return jax.lax.map(lambda qr: fn(qr[0], qr[1]), (query, ref))
