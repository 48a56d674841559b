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
   built from data. The three sorts carry coordinates and the permutation as
   extra ``lax.sort`` operands (sorts are cheap on TPU — PERF_NOTES; gathers
   are NOT, so nothing here applies a permutation with a gather).
2. Queries locate their cell with vectorized boundary comparisons (per-query
   boundary-table rows come from one-hot MXU matmuls, not XLA gathers), then
   sort by cell id — one variadic ``lax.sort`` carries coords + original ids
   — and are scattered into a PER-ROW padded layout (each (slab,row)'s
   queries padded to a multiple of ``tq``). Every query tile therefore lies
   in exactly ONE row — its 27-cell neighbourhood is 9 z-runs in 9 DISTINCT
   (slab,row) pairs: disjoint contiguous ranges of the sorted ref array.
3. The Pallas kernel (ops/pallas/grid_fused.py) keeps the ENTIRE sorted ref
   array VMEM-resident (~1 MB) and reads each tile's 9 runs directly out of
   it via scalar-prefetched, 128-block-aligned offsets — no HBM candidate
   gather exists. Exact [st, en) run masking inside the kernel makes
   alignment padding harmless (no duplicate candidates).
4. **Exactness proof + fallback.** A query's result is provably exact when
   ball(q, sqrt(d_k)) fits inside the covered REGION (the union of the
   slot boxes; domain edges extend to ±inf since no refs exist beyond
   them) and no slot overflowed the kernel's aligned window. The region
   test composes per slab/pair in squared distance — a neighbour
   constrains the radius only through the part of the ball that reaches
   it (see the margin block in _query_pass). Rows failing the check are
   brute-forced through patch tiers (``_fallback_caps``: a dense ladder of
   ``fallback_cap`` multiples, then all-brute via ``lax.switch``): either
   way the result is exact.
   Neighbour rows/z-runs are selected by VALUE (searchsorted in the
   neighbour's own partition) — equal-count partitions are mutually
   shifted and index-offset selection was measured to cost 14% unsafe
   rows via collapsed margins.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_FAR = 1e15  # padding coordinate, matching the brute kernels
_INF = jnp.float32(3e38)
_LANE = 128


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


def _full_z_ok(M: int, grid_shape, slot_cap: int) -> bool:
    """Static predicate: every (slab,row) z-column fits the kernel's aligned
    window (max row length + 127 alignment slack <= slot_cap), i.e. the
    full-column z mode of _query_pass applies. Pure function of
    (M, grid_shape, slot_cap) — the entry points use it to build the ref
    structure with ``skip_z_sort`` and _query_pass uses it to auto-detect
    ``full_z``, so the two can never disagree."""
    Sx, Sy, Sz = grid_shape
    _, RB_np, _, _, _ = _partition_tables(M, Sx, Sy, Sz)
    max_row_len = int(np.max(RB_np[:, 1:] - RB_np[:, :-1]))
    return max_row_len + (_LANE - 1) <= slot_cap


def _lookup_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table [n, c] float32, idx [N] int -> [N, c]: per-row lookup as a
    one-hot HIGHEST-precision matmul. XLA gathers of small-row tables are
    pathologically slow on TPU (~10 ms for 2.2M elements, PERF_NOTES round-2
    addenda); the MXU does this exactly (1.0 * x products, one nonzero per
    accumulation) and orders of magnitude faster."""
    n = table.shape[0]
    oh = (idx[:, None] == jnp.arange(n, dtype=idx.dtype)[None, :])
    return jax.lax.dot(oh.astype(jnp.float32), table.astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST)


def _build_ref_structure(ref: jnp.ndarray, grid_shape,
                         skip_z_sort: bool = False):
    """Sort refs into the equal-count structure. Returns (refs_s [M,3] sorted
    coords, order_r [M] sorted-pos -> original id, xb [Sx-1], yb [Sx,Sy-1],
    zb [R,Sz-1] inner boundary values).

    ``skip_z_sort``: full-column z mode reads whole (slab,row) rows
    ([st,en) = CS row bounds) and never consults zb or intra-row z order,
    so the third sort is pure discarded work there — skipping it returns
    rows in y-order with a zeros zb placeholder. ONLY sound when every
    query pass on the structure runs full_z (the entry points derive the
    same static condition that _query_pass auto-detects)."""
    Sx, Sy, Sz = grid_shape
    M = ref.shape[0]
    R = Sx * Sy
    SB, RB, CS_np, slab_pos, row_pos = _partition_tables(M, Sx, Sy, Sz)
    xr, yr, zr = ref[:, 0], ref[:, 1], ref[:, 2]
    ir = jnp.arange(M, dtype=jnp.int32)
    # each sort carries only (next key, permutation): the next level's key
    # column is re-gathered through the running permutation instead of
    # carrying every coordinate through the sorting network (8 operand
    # passes + three M-row gathers vs 14 operand passes; M is small and the
    # variadic payload dominates). Tie order is unchanged: ties broke on the
    # carried previous-sort order before, which is exactly the stable-sort
    # order here.
    x1, i1 = jax.lax.sort((xr, ir), num_keys=1)
    _, y2, i2 = jax.lax.sort(
        (jnp.asarray(slab_pos), yr[i1], i1), num_keys=2)
    xb = x1[SB[1:-1]]  # static positions: cheap
    yb = y2[RB[:, 1:-1]]
    if skip_z_sort:
        return ref[i2], i2, xb, yb, jnp.zeros((R, Sz - 1), ref.dtype), CS_np
    _, z3, i3 = jax.lax.sort(
        (jnp.asarray(row_pos), zr[i2], i2), num_keys=2)
    refs_s = ref[i3]
    zcs = CS_np[:-1].reshape(R, Sz)
    zb = z3[zcs[:, 1:]]
    return refs_s, i3, xb, yb, zb, CS_np


def _build_struct(ref: jnp.ndarray, grid_shape, skip_z_sort: bool = False):
    """Build the grid structure once per ref set: sorted+padded refs, the
    sort permutation, boundary tables (inner and ±inf-extended), and cell
    start offsets. Multiple query passes (e.g. the expanded-halo second
    pass over margin-failed rows) reuse one structure.
    ``skip_z_sort``: see _build_ref_structure — full_z-only structures."""
    Sx, Sy, Sz = grid_shape
    M = ref.shape[0]
    R = Sx * Sy
    refs_s, order_r, xb, yb, zb, CS_np = _build_ref_structure(
        ref, grid_shape, skip_z_sort)
    CS = jnp.asarray(CS_np)
    M_pad = -(-M // _LANE) * _LANE
    refs_pad = jnp.pad(refs_s, ((0, M_pad - M), (0, 0)),
                       constant_values=_FAR)
    # outer boundaries for margins; domain edges are open (no refs beyond)
    xb_full = jnp.concatenate([jnp.array([-_INF]), xb, jnp.array([_INF])])
    yb_full = jnp.concatenate(
        [jnp.full((Sx, 1), -_INF), yb, jnp.full((Sx, 1), _INF)], axis=1)
    zb_full = jnp.concatenate(
        [jnp.full((R, 1), -_INF), zb, jnp.full((R, 1), _INF)], axis=1)
    return (refs_pad, order_r, xb, yb, zb, xb_full, yb_full, zb_full, CS,
            M, M_pad)


def _query_pass(struct, query: jnp.ndarray, k: int, grid_shape, tq: int,
                slot_cap: int, interpret: bool,
                z_halo: int = 2, xy_halo: int = 1,
                values: jnp.ndarray | None = None, eps: float = 1e-8,
                vals_pad: jnp.ndarray | None = None, diag: bool = False,
                full_z: bool | None = None, layout_out: bool = False):
    """One grid query pass against a prebuilt structure: returns
    (d [Nq,k], idx [Nq,k], unsafe [Nq]), or (v [Nq,C], unsafe) in fused
    interpolation mode (``values`` [M, C] set; ``vals_pad`` optionally
    passes the pre-sorted padded values to share across passes). The grid
    pass itself is always exact-or-flagged-unsafe; the ``exact`` knob of
    the public entry points only selects the BRUTE fallback kernel (exact
    vs f32-packed near-tie approximate) and so lives in the fallback
    wrappers, not here.

    ``xy_halo`` widens the slot neighbourhood to (2h+1)^2 (slab,row) pairs
    and the covered-box margins to ±h slabs/rows: the second fallback pass
    runs with xy_halo=2, doubling the margins for rows whose d_k exceeded
    the ±1 box (measured ~2x the safe median on DDIM mixture clouds, i.e.
    just past the pass-1 margin, not in voids).

    **Full-column z mode** (round 4): the kernel streams every one of its
    ``blocks_per_slot`` aligned blocks per slot UNCONDITIONALLY — [st, en)
    only masks (ops/pallas/grid_fused.py::slot_body) — so whenever an
    ENTIRE (slab,row) z-column fits the aligned window
    (max row length + 127 alignment slack <= slot_cap, true at the
    sampler's M=30k default (16,12,8)/384 config: 157 + 127 = 284, and
    at the former (16,8,8)/384 and (16,16,8)/256), covering the
    whole column instead of a value-range z-run costs ZERO extra kernel
    time and makes the pair/z margin leg vanish: every ref in a covered
    pair's footprint is a candidate, so the pair imposes NO radius
    constraint (msq_pair = inf) and the safety test reduces to the x-strip
    and y-band legs. Strictly fewer unsafe rows AND less margin plumbing
    (no z-boundary MXU lookup, no per-tile z value ranges, no [T,tq,S]
    z-term arrays). The windowed z-run path remains for configurations
    whose columns overflow the window."""
    from .pallas.grid_fused import grid_interp_resident, grid_topk_resident

    Sx, Sy, Sz = grid_shape
    Nq = query.shape[0]
    R = Sx * Sy
    bps = slot_cap // _LANE
    query = query.astype(jnp.float32)
    (refs_pad, order_r, xb, yb, zb, xb_full, yb_full, zb_full, CS,
     M, M_pad) = struct
    if values is not None and vals_pad is None:
        vals_pad = jnp.pad(values.astype(jnp.float32)[order_r],
                           ((0, M_pad - M), (0, 0)))
    full_z_ok = _full_z_ok(M, grid_shape, slot_cap)
    if full_z is None:
        full_z = full_z_ok
    elif full_z and not full_z_ok:
        # a column that overflows the aligned window would be silently
        # truncated by the kernel masking — unsound, refuse
        raise ValueError(
            f"full_z requires max row length + {_LANE - 1} <= slot_cap "
            f"{slot_cap} (M={M}, grid_shape={grid_shape})")

    # --- query cell assignment (boundary compares; table rows via MXU) ---
    qsx = jnp.sum(query[:, 0:1] >= xb[None, :], axis=1).astype(jnp.int32)
    qsy = jnp.sum(query[:, 1:2] >= _lookup_rows(yb, qsx),
                  axis=1).astype(jnp.int32)
    qrow = qsx * Sy + qsy
    if full_z:
        # tiles need no z-coherence when slots cover whole columns: skip
        # the z-boundary MXU lookup and sort queries by row only (the
        # padded layout pads per ROW either way — intra-row order is free)
        qsz = jnp.zeros_like(qrow)
    else:
        qsz = jnp.sum(query[:, 2:3] >= _lookup_rows(zb, qrow),
                      axis=1).astype(jnp.int32)

    # --- row-aligned padded layout: each row's queries padded to tq.
    # One variadic sort carries coords + original ids; row starts come from
    # searchsorted on the (sorted) row keys. The padded buffer is filled by
    # a row GATHER through the inverse map (sorted index = padded position
    # minus the row's pad offset) — a [NP, 4] scatter costs ~5x a row
    # gather at this size on v5e (examples/microbench_primitives.py), and
    # the inverse map is free: each padded position's row is its TILE's row
    # (tiles never straddle rows), so the per-element offsets broadcast
    # from [T]-sized tables. ---
    cell_key = qrow * Sz + qsz
    iq = jnp.arange(Nq, dtype=jnp.int32)
    ck_s, qx_s, qy_s, qz_s, oq = jax.lax.sort(
        (cell_key, query[:, 0], query[:, 1], query[:, 2], iq),
        num_keys=1)
    # the sorted row ids come free from the sorted cell keys — one fewer
    # payload operand through the 90k-element sorting network
    row_s = ck_s // Sz
    rowstart = jnp.searchsorted(row_s, jnp.arange(R + 1, dtype=jnp.int32))
    counts = jnp.diff(rowstart)
    pcounts = -(-counts // tq) * tq
    prowstart = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), jnp.cumsum(pcounts)])
    NP = Nq + R * tq  # static upper bound on the padded length
    NP = -(-NP // tq) * tq
    T = NP // tq
    # each tile lies in exactly one row; positions past prowstart[R] are
    # global padding (clipped row 0 below, masked by valid)
    trow_all = (jnp.searchsorted(prowstart,
                                 jnp.arange(T, dtype=prowstart.dtype) * tq,
                                 side="right") - 1)
    trow = jnp.clip(trow_all, 0, R - 1)
    in_rows = (trow_all < R) & (trow_all >= 0)  # tile holds real positions
    src = (jnp.arange(NP, dtype=jnp.int32).reshape(T, tq)
           - (prowstart[trow] - rowstart[trow])[:, None].astype(jnp.int32))
    valid = ((src < rowstart[trow + 1][:, None]) & in_rows[:, None])
    src = jnp.clip(src, 0, Nq - 1).reshape(-1)
    # the gathered payload carries coords + the original id: ids ride as
    # exact f32 VALUES (Nq < 2^24 — never bitcast int bits through f32
    # lanes, the TPU flushes denormal patterns; PERF_NOTES round-2 addenda).
    # Padding rows get _FAR coords and id Nq.
    payload = jnp.stack([qx_s, qy_s, qz_s, oq.astype(jnp.float32)], axis=1)
    buf = jnp.where(valid.reshape(-1)[:, None], payload[src],
                    jnp.array([_FAR, _FAR, _FAR, float(Nq)], jnp.float32))
    q_pad = buf[:, :3]
    orig_pad = buf[:, 3].astype(jnp.int32)

    qt = q_pad.reshape(T, tq, 3)
    real_t = valid
    # per-tile VALUE ranges over real queries (padding excluded)
    vymin = jnp.min(jnp.where(real_t, qt[:, :, 1], _INF), axis=1)
    vymax = jnp.max(jnp.where(real_t, qt[:, :, 1], -_INF), axis=1)
    empty_t = ~jnp.any(real_t, axis=1)
    yc = jnp.where(empty_t, 0.0, (vymin + vymax) * 0.5)
    if not full_z:
        vzmin = jnp.min(jnp.where(real_t, qt[:, :, 2], _INF), axis=1)
        vzmax = jnp.max(jnp.where(real_t, qt[:, :, 2], -_INF), axis=1)
        vzmin = jnp.where(empty_t, 0.0, vzmin)
        vzmax = jnp.where(empty_t, 0.0, vzmax)
    tsx, tsy = trow // Sy, trow % Sy

    # --- slot construction. ``xy_halo`` may be an int (symmetric) or an
    # (Hx, Hy) tuple — the margin-binding probe showed 85% of the
    # sampler's unsafe rows bind on the y-band term, so widening y
    # coverage independently of x is the useful asymmetry. All arrays
    # here are [T, ...]-sized: plain gathers are fine.
    #
    # Full-z fast shape (round 4, "y-run slots"): rows of a slab are
    # ADJACENT ranges of the sorted ref array (the equal-count build
    # sorts by x then y), so the ±Hy y-window inside each neighbour slab
    # is ONE contiguous run — (2Hx+1) slots of ceil((maxrun+127)/128)
    # blocks instead of (2Hx+1)(2Hy+1) whole-column slots of
    # slot_cap/128 blocks. At the production (16,12,8)/384 geometry that
    # is 3x5=15 candidate blocks and 3 slot-loop iterations per tile vs
    # 9x3=27 and 9. The covered candidate SET is identical (same rows,
    # same exact [st,en) masking, positions in the same sorted array),
    # so distances, tie-broken indices AND the unsafe flags are all
    # bit-identical to the per-pair shape — only kernel geometry
    # changes. Engaged whenever it does not lose (fewer or equal total
    # blocks and the window fits the padded ref array). ---
    Hx, Hy = ((xy_halo, xy_halo) if isinstance(xy_halo, int) else xy_halo)
    W1 = 2 * Hx + 1
    sx3 = tsx[:, None] + np.arange(-Hx, Hx + 1)[None, :]  # [T, W1]
    slab3_ok = (sx3 >= 0) & (sx3 < Sx)
    sx3c = jnp.clip(sx3, 0, Sx - 1)
    # row of the tile's y-centre in each neighbour slab's own partition
    r3 = jnp.sum(yc[:, None, None] >= yb[sx3c], axis=2)  # [T, W1]
    bps_eff = bps
    yrun = False
    if full_z:
        # static worst-case contiguous y-run length over all (slab, row)
        _, RB_np, _, _, _ = _partition_tables(M, Sx, Sy, Sz)
        y_idx = np.arange(Sy)
        lo_i = np.maximum(y_idx - Hy, 0)
        hi_i = np.minimum(y_idx + Hy, Sy - 1)
        run_len = RB_np[:, hi_i + 1] - RB_np[:, lo_i]  # [Sx, Sy]
        bps_yrun = -(-(int(np.max(run_len)) + _LANE - 1) // _LANE)
        yrun = (bps_yrun * _LANE <= M_pad
                and W1 * bps_yrun <= W1 * (2 * Hy + 1) * bps)
        if yrun:
            bps_eff = bps_yrun
    if yrun:
        y_lo_r = jnp.clip(r3 - Hy, 0, Sy - 1)  # [T, W1]
        y_hi_r = jnp.clip(r3 + Hy, 0, Sy - 1)
        st = jnp.where(slab3_ok, CS[(sx3c * Sy + y_lo_r) * Sz], 0)
        en = jnp.where(slab3_ok, CS[(sx3c * Sy + y_hi_r) * Sz + Sz], 0)
        stb = jnp.clip(st // _LANE,
                       0, M_pad // _LANE - bps_eff).astype(jnp.int32)
        tile_ok = jnp.ones((T,), bool)
    else:
        offs = np.array([(dx, dy) for dx in range(-Hx, Hx + 1)
                         for dy in range(-Hy, Hy + 1)], np.int32)  # [S, 2]
        dxi = offs[:, 0] + Hx  # slot -> index into the W1 slabs
        sy2 = jnp.take_along_axis(r3, jnp.asarray(dxi)[None, :].repeat(T, 0),
                                  axis=1) + offs[None, :, 1]  # [T, S]
        sx2 = sx3[:, jnp.asarray(dxi)]  # [T, S]
        valid_pair = (slab3_ok[:, jnp.asarray(dxi)]
                      & (sy2 >= 0) & (sy2 < Sy))
        row2 = (jnp.clip(sx2, 0, Sx - 1) * Sy + jnp.clip(sy2, 0, Sy - 1))
    if yrun:
        pass
    elif full_z:
        # whole-column runs: guaranteed to fit the aligned window
        # (max_row_len + 127 <= slot_cap), so tile_ok never fails
        st = jnp.where(valid_pair, CS[row2 * Sz], 0)
        en = jnp.where(valid_pair, CS[row2 * Sz + Sz], 0)
        stb = jnp.clip(st // _LANE, 0, M_pad // _LANE - bps).astype(jnp.int32)
        tile_ok = jnp.ones((T,), bool)
    else:
        # z-run per pair covering [vzmin, vzmax] +- z_halo local cells. z
        # cells are the thinnest partition direction (Sz > Sx, Sy and a row
        # is already a 1/(Sx*Sy) column), so the z faces are often the
        # binding covered-box margin: widening the halo from 1 to 2 cells
        # cut unsafe rows 4.9% -> 3.1% on gaussian clouds for ~20 extra
        # candidates/slot inside the SAME aligned kernel window (no extra
        # compute blocks)
        zb2 = zb[row2]  # [T, 9, Sz-1]
        zlo = jnp.clip(jnp.sum(vzmin[:, None, None] >= zb2, axis=2) - z_halo,
                       0, Sz - 1)  # [T, 9]
        zhi = jnp.clip(jnp.sum(vzmax[:, None, None] >= zb2, axis=2) + z_halo,
                       0, Sz - 1)
        st = CS[row2 * Sz + zlo]
        en = CS[row2 * Sz + zhi + 1]
        st = jnp.where(valid_pair, st, 0)
        en = jnp.where(valid_pair, en, 0)
        # 128-aligned window start for the kernel; tile is provably covered
        # only if every slot's exact run fits its aligned window
        stb = jnp.clip(st // _LANE, 0, M_pad // _LANE - bps).astype(jnp.int32)
        tile_ok = jnp.all(en - stb * _LANE <= slot_cap, axis=1)  # [T]

    # --- resident-ref Pallas kNN over the padded tiles (no HBM gather) ---
    # the barrier stops XLA from fusing the (large) producer graphs into the
    # kernel-emulation loop in interpret mode — without it, CPU-test compiles
    # of this function take minutes instead of seconds. (Making it
    # interpret-only was measured WORSE on TPU: 24.0 vs 22.9 ms/step — the
    # barrier apparently also keeps the compiled schedule sane.)
    q_pad_b, refs_pad_b, stb_b, st_b, en_b = jax.lax.optimization_barrier(
        (q_pad, refs_pad, stb, st.astype(jnp.int32), en.astype(jnp.int32)))
    if values is not None:
        v_s, d_s = grid_interp_resident(
            q_pad_b, refs_pad_b, jax.lax.optimization_barrier(vals_pad),
            stb_b, st_b, en_b, k=k, tq=tq, blocks_per_slot=bps_eff, eps=eps,
            interpret=interpret)
        v_s, d_s = jax.lax.optimization_barrier((v_s, d_s))
    else:
        d_s, gidx = grid_topk_resident(q_pad_b, refs_pad_b, stb_b, st_b,
                                       en_b, k=k, tq=tq,
                                       blocks_per_slot=bps_eff,
                                       interpret=interpret)
        d_s, gidx = jax.lax.optimization_barrier((d_s, gidx))
        ridx = jnp.where(gidx < M, order_r[jnp.clip(gidx, 0, M - 1)], 0)

    # --- per-query safety margin against the covered REGION (the union of
    # slot boxes), not the intersection box. A neighbour slab/pair
    # constrains the safe radius only through the part of the ball that
    # actually REACHES it, and the reach and face budgets compose
    # Pythagorean-style (everything in SQUARED distance, no sqrts):
    #   r^2 <= m_x^2                                  (±H slab strip)
    #   r^2 <= dx(q,slab)^2 + relu(y-band margin)^2   per covered slab
    #   r^2 <= dist(q,footprint)^2 + relu(z margin)^2 per (slab,row) pair
    # Soundness: a ball point inside slab s' has x-offset >= dx, so its
    # y-offset is <= sqrt(r^2 - dx^2), which must fit the slab's covered
    # ±H row band; a point inside a pair's (slab x row) footprint has
    # xy-offset >= the L2 box distance, so its z-offset must fit that
    # pair's z-run. Negative face margins degrade to "must not reach".
    # The earlier intersection-box form collapsed the margins of mutually-
    # shifted neighbour partitions and was the dominant source of false
    # unsafe rows on DDIM mixture clouds (d_k of unsafe rows measured only
    # ~2x the safe median; intersection -> union+Pythagoras cut the
    # trajectory-median unsafe count by >40% and then some).
    qx_t, qy_t, qz_t = qt[:, :, 0], qt[:, :, 1], qt[:, :, 2]
    x_lo = xb_full[jnp.maximum(tsx - Hx, 0)]
    x_hi = xb_full[jnp.minimum(tsx + Hx, Sx - 1) + 1]
    m_x = jnp.minimum(qx_t - x_lo[:, None], x_hi[:, None] - qx_t)
    msq_x = m_x * m_x  # m_x >= 0: q lies inside its own slab strip

    sXlo = xb_full[sx3c]  # [T, W1] slab x-intervals
    sXhi = xb_full[sx3c + 1]
    dx_s = jnp.maximum(jnp.maximum(sXlo[:, None, :] - qx_t[:, :, None],
                                   qx_t[:, :, None] - sXhi[:, None, :]),
                       0.0)  # [T, tq, W1]
    y_lo_cand = yb_full[sx3c, jnp.maximum(r3 - Hy, 0)]  # [T, W1]
    y_hi_cand = yb_full[sx3c, jnp.minimum(r3 + Hy, Sy - 1) + 1]
    my_s = jnp.maximum(
        jnp.minimum(qy_t[:, :, None] - y_lo_cand[:, None, :],
                    y_hi_cand[:, None, :] - qy_t[:, :, None]), 0.0)
    term_s = jnp.where(slab3_ok[:, None, :],
                       dx_s * dx_s + my_s * my_s, _INF)
    msq_slab = jnp.min(term_s, axis=2)  # [T, tq]

    if full_z:
        # whole columns covered: every ref inside a covered pair's
        # footprint is a candidate, so pairs impose no radius constraint
        msq = jnp.minimum(msq_x, msq_slab)
    else:
        sx2c = jnp.clip(sx2, 0, Sx - 1)
        sy2c = jnp.clip(sy2, 0, Sy - 1)
        pXlo = xb_full[sx2c]  # [T, S] pair footprint intervals
        pXhi = xb_full[sx2c + 1]
        pYlo = yb_full[sx2c, sy2c]
        pYhi = yb_full[sx2c, sy2c + 1]
        dx_p = jnp.maximum(jnp.maximum(pXlo[:, None, :] - qx_t[:, :, None],
                                       qx_t[:, :, None] - pXhi[:, None, :]),
                           0.0)  # [T, tq, S]
        dy_p = jnp.maximum(jnp.maximum(pYlo[:, None, :] - qy_t[:, :, None],
                                       qy_t[:, :, None] - pYhi[:, None, :]),
                           0.0)
        z_lo_cand = zb_full[row2, zlo]  # [T, S]
        z_hi_cand = zb_full[row2, zhi + 1]
        mz_p = jnp.maximum(
            jnp.minimum(qz_t[:, :, None] - z_lo_cand[:, None, :],
                        z_hi_cand[:, None, :] - qz_t[:, :, None]), 0.0)
        term_p = jnp.where(valid_pair[:, None, :],
                           dx_p * dx_p + dy_p * dy_p + mz_p * mz_p, _INF)
        msq_pair = jnp.min(term_p, axis=2)  # [T, tq]

        msq = jnp.minimum(jnp.minimum(msq_x, msq_slab), msq_pair)
    d_last = d_s[:, k - 1].reshape(T, tq)
    # Explicit degenerate guard: a row whose k-th candidate is the kernel's
    # _BIG sentinel (fewer than k finite candidates in its slots) is unsafe
    # by definition — do NOT rely on the margin comparison alone, which
    # could in principle pass if all msq terms overflowed at pathological
    # grid geometries (advisor round-2 finding).
    safe = tile_ok[:, None] & (d_last <= msq) & (d_last < 1e29)

    if layout_out:
        # Layout-order return (fused-interp mode only): skip this pass's
        # unsort sort + row gathers entirely and hand the caller the padded
        # layout (values, raw per-position safety, original query ids and
        # layout-order coords). The caller composes the layout permutation
        # with its OWN downstream un-permutation — one inverse-permutation
        # sort instead of two (see _grid_interp_single_layout and
        # models/samplers.py::_upsample_unknown). Padding positions carry
        # orig_pad == Nq and _FAR coords.
        assert values is not None and not diag
        return v_s, safe.reshape(-1), orig_pad, q_pad

    # --- unsort to original query order. Every real query id appears in
    # orig_pad exactly once (padding rows carry Nq), so sorting
    # (orig_pad, position) yields each query's padded position in its
    # first Nq entries — the inverse permutation from one cheap 2-operand
    # sort plus row gathers, instead of per-array scatters (a scatter
    # costs ~5x a row gather at this size on v5e; microbench). ---
    _, posq = jax.lax.sort(
        (orig_pad, jnp.arange(NP, dtype=jnp.int32)), num_keys=1)
    posq = posq[:Nq]
    unsafe = ~safe.reshape(-1)[posq]
    if diag:
        # margin-attribution diagnostics (probe-only; never on the hot
        # path): per-query margin terms + d_k + structural flags, in
        # original query order. In full-column z mode the pair term is
        # identically inf (no constraint).
        mp = (jnp.full_like(msq_x, _INF) if full_z else msq_pair)
        diag_out = {
            "msq_x": msq_x.reshape(-1)[posq],
            "msq_slab": msq_slab.reshape(-1)[posq],
            "msq_pair": mp.reshape(-1)[posq],
            "d_last": d_last.reshape(-1)[posq],
            "tile_ok": jnp.broadcast_to(tile_ok[:, None],
                                        (T, tq)).reshape(-1)[posq],
        }
        if values is not None:
            return v_s[posq], unsafe, diag_out
        return d_s[posq], ridx[posq], unsafe, diag_out
    if values is not None:
        return v_s[posq], unsafe
    return d_s[posq], ridx[posq], unsafe


def _fallback_caps(fallback_cap: int, Nq: int) -> list[int]:
    """Patch-buffer sizes for the tiered brute fallback, strictly increasing.

    Dense near the working range: brute-patch cost is ~linear in the tier
    cap, and the ladder is retuned whenever the unsafe distribution moves
    (examples/probe_sampler_unsafe.py). At the (16,16,8)/256 config the
    per-step unsafe count along a real DDIM trajectory sat mostly in
    [0.5x, 3x] of fallback_cap=8192 (median 8.1k, mean 10.5k of 90k); the
    round-4 (16,8,8)/384 full-z grid cut that 71% (mean 2.5k, max 7.1k),
    and fallback_cap=4096 re-centres the ladder on the new range
    (measured 19.31 -> 18.99 ms/step). At the y-run-slot (16,12,8)/384
    default the ladder is insensitive (2048/4096/8192 within run
    variance, 15.79-15.92 ms/step); 4096 stands. A pure power-of-two ladder pads the
    MEAN step to ~1.5x its unsafe count (15/30 steps land just above a
    tier boundary); the extra intermediate tiers cut mean padded rows
    ~18% for a few more compiled branches."""
    mults = (1, 2, 3, 4, 5, 6, 8, 12, 16)  # x fallback_cap/2
    caps = [(m * fallback_cap) // 2 for m in mults]
    caps = sorted({c for c in caps if 0 < c < Nq})
    return caps or [min(fallback_cap, Nq)]


def _grid_knn_core(query: jnp.ndarray, ref: jnp.ndarray, k: int,
                   grid_shape, tq: int, slot_cap: int,
                   interpret: bool, exact: bool = True, z_halo: int = 2,
                   values: jnp.ndarray | None = None, eps: float = 1e-8,
                   xy_halo=1):
    """Build + one query pass (back-compat wrapper; see _query_pass).
    ``exact`` is accepted for signature compatibility but unused: this
    wrapper has no brute fallback (the only place ``exact`` matters)."""
    del exact
    fz = _full_z_ok(ref.shape[0], grid_shape, slot_cap)
    struct = _build_struct(ref.astype(jnp.float32), grid_shape,
                           skip_z_sort=fz)
    return _query_pass(struct, query, k, grid_shape, tq, slot_cap,
                       interpret, z_halo, xy_halo, values, eps,
                       full_z=True if fz else None)


@functools.partial(jax.jit, static_argnames=("k", "grid_shape", "tq",
                                             "slot_cap", "fallback_cap",
                                             "interpret", "exact", "z_halo",
                                             "xy_halo"))
def _grid_knn_single(query: jnp.ndarray, ref: jnp.ndarray, k: int,
                     grid_shape, tq: int, slot_cap: int, fallback_cap: int,
                     interpret: bool, exact: bool, z_halo: int = 2,
                     xy_halo=1):
    """Unbatched kd-grid kNN: query [Nq, 3], ref [M, 3] -> ([Nq,k], [Nq,k])."""
    Nq = query.shape[0]
    query = query.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    d_out, i_out, unsafe = _grid_knn_core(query, ref, k, grid_shape, tq,
                                          slot_cap, interpret, exact, z_halo,
                                          xy_halo=xy_halo)
    n_unsafe = jnp.sum(unsafe)

    # tiered fallback: patch buffers at the _fallback_caps ladder, all-brute
    # as the exactness backstop. The patched branches cost ~cap/Nq of a full
    # brute call, so geometric tiers make every step pay proportionally to
    # its own unsafe count instead of the worst case: mid-trajectory DDIM
    # clouds (cluster+noise mixtures) have a fat unsafe tail — measured
    # median 14.5k / max 35k of 90k on a real 50-step run
    # (examples/probe_sampler_unsafe.py) — and a single coarse tier made the
    # sampler pay a near-full brute on 33/50 steps.
    # Unsafe-row compaction as ONE keys-only sort, hoisted out of the
    # switch and shared by every tier: sorting where(unsafe, qid, Nq)
    # yields exactly nonzero(unsafe, size=cap, fill_value=Nq)[0][:cap] for
    # any cap — ascending unsafe ids, Nq-padded — and a [Nq] i32 sort is
    # ~7x cheaper than nonzero's cumsum+scatter on v5e (microbench).
    unsafe_ids = jnp.sort(jnp.where(unsafe,
                                    jnp.arange(Nq, dtype=jnp.int32), Nq))

    def make_patched(cap):
        def patched(_):
            ids = unsafe_ids[:cap]
            qf = query[jnp.clip(ids, 0, Nq - 1)]
            db, ib = _brute(qf, ref, k, interpret, exact)
            # ids are ascending by construction (sorted iota-or-Nq keys;
            # Nq padding repeats but stays nondecreasing and is dropped)
            return (d_out.at[ids].set(db, mode="drop",
                                      indices_are_sorted=True),
                    i_out.at[ids].set(ib, mode="drop",
                                      indices_are_sorted=True))
        return patched

    def all_brute(_):
        return _brute(query, ref, k, interpret, exact)

    caps = _fallback_caps(fallback_cap, Nq)
    branches = [make_patched(c) for c in caps] + [all_brute]
    sel = sum((n_unsafe > c).astype(jnp.int32) for c in caps)
    return jax.lax.switch(sel, branches, None)


def grid_knn(query: jnp.ndarray, ref: jnp.ndarray, k: int = 3, *,
             grid_shape=(16, 12, 8), tq: int = 128, slot_cap: int = 384,
             fallback_cap: int = 4096, interpret: bool = False,
             exact: bool = True, z_halo: int = 2, xy_halo=1):
    """Batched equal-count kd-grid kNN: query [B, N, 3], ref [B, M, 3] ->
    (sq_dists [B, N, k], indices [B, N, k]), ascending, exact.

    ``slot_cap`` must be a multiple of 128 (the kernel's aligned window).
    Batches run through ``lax.map`` (not vmap) so the size-dependent
    ``lax.switch`` fallback-tier ladder (patch buffers at the dense
    ``_fallback_caps`` ladder, then all-brute) stays a real branch per element
    instead of degrading to an always-pay-every-tier select."""
    if slot_cap % _LANE:
        raise ValueError(f"slot_cap must be a multiple of {_LANE}, got "
                         f"{slot_cap}")
    if query.shape[1] >= 2 ** 24:
        # query ids ride f32 lanes as exact VALUES (not bitcast —
        # docs/PERF_NOTES.md round-2 denormal lesson), exact only below 2^24
        raise ValueError(f"grid_knn supports < 2^24 queries, got "
                         f"{query.shape[1]}")
    cells = int(np.prod(grid_shape))
    m_pad = -(-ref.shape[1] // _LANE) * _LANE
    if ref.shape[1] < max(k, 4 * cells) or m_pad < slot_cap:
        # refs too sparse for this grid resolution (or smaller than one
        # kernel window): brute force is fine there
        return jax.vmap(
            lambda q, r: _brute(q, r, k, interpret, exact))(query, ref)
    fn = functools.partial(_grid_knn_single, k=k, grid_shape=tuple(grid_shape),
                           tq=tq, slot_cap=slot_cap,
                           fallback_cap=fallback_cap,
                           interpret=interpret, exact=exact, z_halo=z_halo,
                           xy_halo=xy_halo)
    if query.shape[0] == 1:
        d, i = fn(query[0], ref[0])
        return d[None], i[None]
    return jax.lax.map(lambda qr: fn(qr[0], qr[1]), (query, ref))


def _build_struct_batched(ref: jnp.ndarray, grid_shape):
    """Flat-batched structure build over [B, M, 3] refs: ONE composite-key
    sort per level instead of B serial builds (batched sorts serialise under
    vmap / lax.map on TPU — the same lesson as
    ops/voxel.py::_downsample_batched). Full-column-z structures only (the
    batched query pass requires full_z, so the third sort never exists —
    the batched analogue of ``skip_z_sort``).

    Returns (refs_pad [B*M_pad, 3] — cloud b's sorted refs at
    [b*M_pad, b*M_pad+M), _FAR padding between; order_g [B*M] global
    original ids (b*M + local) in sorted order; xb [B, Sx-1];
    yb [B, Sx, Sy-1]; xb_full [B, Sx+1]; yb_full [B, Sx, Sy+1]; CS;
    M; M_pad). Per-cloud 128-alignment is preserved because M_pad is a
    multiple of the lane width."""
    Sx, Sy, Sz = grid_shape
    B, M, _ = ref.shape
    SB, RB, _, slab_pos, _ = _partition_tables(M, Sx, Sy, Sz)
    flat = ref.astype(jnp.float32).reshape(B * M, 3)
    bid = np.repeat(np.arange(B, dtype=np.int32), M)
    gidx = jnp.arange(B * M, dtype=jnp.int32)
    # sort 1: (cloud, x). Cloud ids are a static operand; stability keeps
    # per-cloud regions contiguous at [b*M, (b+1)*M).
    _, x1, i1 = jax.lax.sort((jnp.asarray(bid), flat[:, 0], gidx),
                             num_keys=2)
    # after sort 1, position p's (cloud, slab) is STATIC: cloud p//M, slab
    # slab_of_pos[p%M] — one numpy key array, no data-dependent keys
    rowk1 = np.repeat(np.arange(B, dtype=np.int32) * Sx, M) + np.tile(
        slab_pos, B)
    _, _, i2 = jax.lax.sort((jnp.asarray(rowk1), flat[:, 1][i1], i1),
                            num_keys=2)
    # boundary values at static per-cloud positions
    xb = x1[jnp.asarray(np.arange(B)[:, None] * M + SB[None, 1:-1])]
    y2 = flat[:, 1][i2]
    yb = y2[jnp.asarray(np.arange(B)[:, None, None] * M
                        + RB[None, :, 1:-1])]
    refs_s = flat[i2].reshape(B, M, 3)
    M_pad = -(-M // _LANE) * _LANE
    refs_pad = jnp.pad(refs_s, ((0, 0), (0, M_pad - M), (0, 0)),
                       constant_values=_FAR).reshape(B * M_pad, 3)
    xb_full = jnp.concatenate(
        [jnp.full((B, 1), -_INF), xb, jnp.full((B, 1), _INF)], axis=1)
    yb_full = jnp.concatenate(
        [jnp.full((B, Sx, 1), -_INF), yb, jnp.full((B, Sx, 1), _INF)],
        axis=2)
    return refs_pad, i2, xb, yb, xb_full, yb_full, M, M_pad


def _query_pass_batched(structb, query: jnp.ndarray, k: int, grid_shape,
                        tq: int, slot_cap: int, interpret: bool,
                        xy_halo, values: jnp.ndarray,
                        eps: float, vals_pad: jnp.ndarray):
    """Flat-batched `_query_pass` in fused-interpolation layout mode:
    query [B, Nq, 3] against a `_build_struct_batched` structure, ONE padded
    layout over B*Sx*Sy global (cloud, slab, row) rows and ONE kernel launch
    whose resident array concatenates every cloud's sorted refs. Tiles never
    straddle rows, so each tile belongs to exactly one cloud; its slot
    offsets shift by ``tb * M_pad`` and the kernel's exact [st, en) masking
    makes windows that overhang into the next cloud's region harmless.

    Full-column z mode ONLY (the production default at the sampler's
    M=30k/(16,12,8)/384 geometry): callers must check `_full_z_ok` and fall
    back to the per-cloud path otherwise. Returns layout order —
    (v [NPg, C], safe [NPg], qid [NPg] global query ids with Ng = B*Nq as
    the padding sentinel, q_pad [NPg, 3])."""
    from .pallas.grid_fused import grid_interp_resident

    Sx, Sy, Sz = grid_shape
    B, Nq, _ = query.shape
    R = Sx * Sy
    Rg = B * R
    bps = slot_cap // _LANE
    refs_pad, order_g, xb, yb, xb_full, yb_full, M, M_pad = structb
    if not _full_z_ok(M, grid_shape, slot_cap):
        raise ValueError("batched grid pass requires full-column z mode "
                         f"(M={M}, grid_shape={grid_shape}, "
                         f"slot_cap={slot_cap})")
    qf = query.astype(jnp.float32)

    # --- cell assignment with per-cloud boundary tables. The y lookup runs
    # as a vmapped one-hot matmul: per-cloud [Nq, Sx] one-hots (a flat
    # [B*Nq, B*Sx] one-hot would materialise B^2x the elements for the same
    # nonzeros; vmap of dot is a batched matmul, not a serialised loop). ---
    qsx = jnp.sum(qf[:, :, 0:1] >= xb[:, None, :], axis=2).astype(jnp.int32)
    ybq = jax.vmap(_lookup_rows)(yb, qsx)  # [B, Nq, Sy-1]
    qsy = jnp.sum(qf[:, :, 1:2] >= ybq, axis=2).astype(jnp.int32)
    grow = (jnp.arange(B, dtype=jnp.int32)[:, None] * R
            + qsx * Sy + qsy)  # [B, Nq] global row

    # --- one padded layout over all B clouds' rows (see _query_pass; ids
    # ride f32 lanes as exact values, so Ng must stay < 2^24) ---
    Ng = B * Nq
    iq = jnp.arange(Ng, dtype=jnp.int32)
    qfl = qf.reshape(Ng, 3)
    row_s, qx_s, qy_s, qz_s, oq = jax.lax.sort(
        (grow.reshape(-1), qfl[:, 0], qfl[:, 1], qfl[:, 2], iq), num_keys=1)
    rowstart = jnp.searchsorted(row_s, jnp.arange(Rg + 1, dtype=jnp.int32))
    counts = jnp.diff(rowstart)
    pcounts = -(-counts // tq) * tq
    prowstart = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), jnp.cumsum(pcounts)])
    NPg = -(-(Ng + Rg * tq) // tq) * tq
    T = NPg // tq
    trow_all = (jnp.searchsorted(prowstart,
                                 jnp.arange(T, dtype=prowstart.dtype) * tq,
                                 side="right") - 1)
    trow = jnp.clip(trow_all, 0, Rg - 1)
    in_rows = (trow_all < Rg) & (trow_all >= 0)
    src = (jnp.arange(NPg, dtype=jnp.int32).reshape(T, tq)
           - (prowstart[trow] - rowstart[trow])[:, None].astype(jnp.int32))
    valid = ((src < rowstart[trow + 1][:, None]) & in_rows[:, None])
    src = jnp.clip(src, 0, Ng - 1).reshape(-1)
    payload = jnp.stack([qx_s, qy_s, qz_s, oq.astype(jnp.float32)], axis=1)
    buf = jnp.where(valid.reshape(-1)[:, None], payload[src],
                    jnp.array([_FAR, _FAR, _FAR, float(Ng)], jnp.float32))
    q_pad = buf[:, :3]
    orig_pad = buf[:, 3].astype(jnp.int32)

    qt = q_pad.reshape(T, tq, 3)
    real_t = valid
    vymin = jnp.min(jnp.where(real_t, qt[:, :, 1], _INF), axis=1)
    vymax = jnp.max(jnp.where(real_t, qt[:, :, 1], -_INF), axis=1)
    empty_t = ~jnp.any(real_t, axis=1)
    yc = jnp.where(empty_t, 0.0, (vymin + vymax) * 0.5)
    tb = trow // R  # tile's cloud
    tloc = trow % R
    tsx, tsy = tloc // Sy, tloc % Sy

    # --- slots: same full-z geometry as _query_pass, with per-cloud
    # boundary tables (indexed by tb — [T]-sized gathers) and slot offsets
    # shifted into cloud tb's region of the concatenated resident array ---
    Hx, Hy = ((xy_halo, xy_halo) if isinstance(xy_halo, int) else xy_halo)
    W1 = 2 * Hx + 1
    sx3 = tsx[:, None] + np.arange(-Hx, Hx + 1)[None, :]  # [T, W1]
    slab3_ok = (sx3 >= 0) & (sx3 < Sx)
    sx3c = jnp.clip(sx3, 0, Sx - 1)
    r3 = jnp.sum(yc[:, None, None] >= yb[tb[:, None], sx3c],
                 axis=2)  # [T, W1]
    CS = jnp.asarray(_partition_tables(M, Sx, Sy, Sz)[2])
    boff = (tb * M_pad).astype(jnp.int32)  # [T] cloud offset (padded pos)
    bps_eff = bps
    _, RB_np, _, _, _ = _partition_tables(M, Sx, Sy, Sz)
    y_idx = np.arange(Sy)
    run_len = (RB_np[:, np.minimum(y_idx + Hy, Sy - 1) + 1]
               - RB_np[:, np.maximum(y_idx - Hy, 0)])
    bps_yrun = -(-(int(np.max(run_len)) + _LANE - 1) // _LANE)
    yrun = (bps_yrun * _LANE <= M_pad
            and W1 * bps_yrun <= W1 * (2 * Hy + 1) * bps)
    if yrun:
        bps_eff = bps_yrun
        y_lo_r = jnp.clip(r3 - Hy, 0, Sy - 1)
        y_hi_r = jnp.clip(r3 + Hy, 0, Sy - 1)
        st = jnp.where(slab3_ok,
                       boff[:, None] + CS[(sx3c * Sy + y_lo_r) * Sz], 0)
        en = jnp.where(slab3_ok,
                       boff[:, None] + CS[(sx3c * Sy + y_hi_r) * Sz + Sz], 0)
    else:
        offs = np.array([(dx, dy) for dx in range(-Hx, Hx + 1)
                         for dy in range(-Hy, Hy + 1)], np.int32)
        dxi = offs[:, 0] + Hx
        sy2 = jnp.take_along_axis(
            r3, jnp.asarray(dxi)[None, :].repeat(T, 0),
            axis=1) + offs[None, :, 1]  # [T, S]
        sx2 = sx3[:, jnp.asarray(dxi)]
        valid_pair = (slab3_ok[:, jnp.asarray(dxi)]
                      & (sy2 >= 0) & (sy2 < Sy))
        row2 = (jnp.clip(sx2, 0, Sx - 1) * Sy + jnp.clip(sy2, 0, Sy - 1))
        st = jnp.where(valid_pair, boff[:, None] + CS[row2 * Sz], 0)
        en = jnp.where(valid_pair, boff[:, None] + CS[row2 * Sz + Sz], 0)
    stb = jnp.clip(st // _LANE,
                   0, B * (M_pad // _LANE) - bps_eff).astype(jnp.int32)

    q_pad_b, refs_pad_b, stb_b, st_b, en_b = jax.lax.optimization_barrier(
        (q_pad, refs_pad, stb, st.astype(jnp.int32), en.astype(jnp.int32)))
    v_s, d_s = grid_interp_resident(
        q_pad_b, refs_pad_b, jax.lax.optimization_barrier(vals_pad),
        stb_b, st_b, en_b, k=k, tq=tq, blocks_per_slot=bps_eff, eps=eps,
        interpret=interpret)
    v_s, d_s = jax.lax.optimization_barrier((v_s, d_s))

    # --- safety margins (full-z form: x-strip and per-slab y-band legs
    # only; covered pairs impose no radius constraint) with per-cloud
    # boundary tables ---
    qx_t, qy_t = qt[:, :, 0], qt[:, :, 1]
    x_lo = xb_full[tb, jnp.maximum(tsx - Hx, 0)]
    x_hi = xb_full[tb, jnp.minimum(tsx + Hx, Sx - 1) + 1]
    m_x = jnp.minimum(qx_t - x_lo[:, None], x_hi[:, None] - qx_t)
    msq_x = m_x * m_x
    sXlo = xb_full[tb[:, None], sx3c]  # [T, W1]
    sXhi = xb_full[tb[:, None], sx3c + 1]
    dx_s = jnp.maximum(jnp.maximum(sXlo[:, None, :] - qx_t[:, :, None],
                                   qx_t[:, :, None] - sXhi[:, None, :]),
                       0.0)
    y_lo_cand = yb_full[tb[:, None], sx3c, jnp.maximum(r3 - Hy, 0)]
    y_hi_cand = yb_full[tb[:, None], sx3c,
                        jnp.minimum(r3 + Hy, Sy - 1) + 1]
    my_s = jnp.maximum(
        jnp.minimum(qy_t[:, :, None] - y_lo_cand[:, None, :],
                    y_hi_cand[:, None, :] - qy_t[:, :, None]), 0.0)
    term_s = jnp.where(slab3_ok[:, None, :],
                       dx_s * dx_s + my_s * my_s, _INF)
    msq = jnp.minimum(msq_x, jnp.min(term_s, axis=2))
    d_last = d_s[:, k - 1].reshape(T, tq)
    safe = (d_last <= msq) & (d_last < 1e29)
    return v_s, safe.reshape(-1), orig_pad, q_pad


@functools.partial(jax.jit, static_argnames=("k", "grid_shape", "tq",
                                             "slot_cap", "fallback_cap",
                                             "interpret", "eps", "xy_halo"))
def _grid_interp_batched_layout(query: jnp.ndarray, ref: jnp.ndarray,
                                values: jnp.ndarray, k: int, grid_shape,
                                tq: int, slot_cap: int, fallback_cap: int,
                                interpret: bool, eps: float, xy_halo=1):
    """Flat-batched `_grid_interp_single_layout`: query [B, Nq, 3],
    ref [B, M, 3], values [B, M, C] -> (v [NPg, C], qid [NPg] GLOBAL query
    ids b*Nq + local, padding sentinel B*Nq) in ONE structure build + ONE
    kernel pass + ONE fallback ladder for all clouds.

    The fallback groups unsafe layout positions by cloud with one keys-only
    sort (global query ids are already cloud-grouped), picks the shared
    tier from the PER-CLOUD MAX unsafe count (each cloud's patch must hold
    its own rows), and runs the brute patch as ONE vmapped call over
    [B, cap] compacted rows — cross-cloud exactness is per-cloud because
    each row brute-forces against its own cloud's refs."""
    B, Nq, _ = query.shape
    M = ref.shape[1]
    C = values.shape[-1]
    Ng = B * Nq
    query = query.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    values = values.astype(jnp.float32)
    structb = _build_struct_batched(ref, grid_shape)
    order_g, M_pad = structb[1], structb[7]
    vals_pad = jnp.pad(
        values.reshape(B * M, C)[order_g].reshape(B, M, C),
        ((0, 0), (0, M_pad - M), (0, 0))).reshape(B * M_pad, C)
    v_out, safe_flat, qid, q_pad = _query_pass_batched(
        structb, query, k, grid_shape, tq, slot_cap, interpret, xy_halo,
        values, eps, vals_pad)
    NPg = v_out.shape[0]

    unsafe = (~safe_flat) & (qid < Ng)
    # cloud-grouped compaction: sorting (global qid | sentinel) clusters
    # each cloud's unsafe layout positions into one contiguous ascending
    # run; per-cloud starts/counts come from searchsorted on the keys
    keyq = jnp.where(unsafe, qid, Ng)
    keys_s, pos_s = jax.lax.sort(
        (keyq, jnp.arange(NPg, dtype=jnp.int32)), num_keys=1)
    bounds = jnp.searchsorted(
        keys_s, jnp.arange(B + 1, dtype=jnp.int32) * Nq)
    starts, counts_b = bounds[:-1], jnp.diff(bounds)
    n_max = jnp.max(counts_b)
    caps = _fallback_caps(fallback_cap, Nq)
    # explicit sentinel padding so dynamic_slice never clamps the start
    # (a clamped start would silently hand cloud b rows of cloud b-1)
    pos_pad = jnp.concatenate(
        [pos_s, jnp.full((caps[-1],), NPg, jnp.int32)])

    def make_patched(cap):
        def patched(_):
            def slice_one(s, cnt):
                p = jax.lax.dynamic_slice(pos_pad, (s,), (cap,))
                return jnp.where(jnp.arange(cap) < cnt, p, NPg)
            pos = jax.vmap(slice_one)(starts, counts_b)  # [B, cap]
            qf = q_pad[jnp.clip(pos, 0, NPg - 1)]
            qf = jnp.where((pos < NPg)[..., None], qf, _FAR)
            vals = jax.vmap(
                lambda qq, rr, vv: _brute_interp(qq, rr, vv, k, eps,
                                                 interpret))(qf, ref, values)
            return v_out.at[pos.reshape(-1)].set(
                vals.reshape(-1, C), mode="drop")
        return patched

    def all_brute(_):
        # brute in ORIGINAL order (layout coords cross clouds within the
        # compaction, so the per-cloud vmap must run on [B, Nq] inputs),
        # then permuted into layout order through qid
        v_orig = jax.vmap(
            lambda qq, rr, vv: _brute_interp(qq, rr, vv, k, eps,
                                             interpret))(query, ref, values)
        vfl = v_orig.reshape(Ng, C)
        return jnp.where((qid < Ng)[:, None],
                         vfl[jnp.clip(qid, 0, Ng - 1)], v_out)

    branches = [make_patched(c) for c in caps] + [all_brute]
    sel = sum((n_max > c).astype(jnp.int32) for c in caps)
    return jax.lax.switch(sel, branches, None), qid


# Flat-batch group size. Two ceilings bind: (a) resident refs+values live
# in VMEM for the whole batched kernel call (~0.7 MB/cloud at M=30k);
# (b) the [B*Nq]-row 5-operand layout sort falls off the same VMEM cliff
# the voxel flat sort does (ops/voxel.py::_FLAT_SORT_ELEMS — measured
# 7.3x at 480k rows x 6 operands on v5e). Groups above the cap are
# chunked inside grid_knn_interpolate_layout_batched; each group is one
# structure build + kernel pass + fallback ladder. Overridable for
# hardware probes via PCST_GRID_BATCH_GROUP.
import os as _os

_BATCHED_MAX_GROUP = int(_os.environ.get("PCST_GRID_BATCH_GROUP", "8"))


def _batched_grid_ok(B: int, Nq: int, M: int, grid_shape, slot_cap: int,
                     k: int) -> bool:
    """Static predicate: the flat-batched interp path applies."""
    cells = int(np.prod(grid_shape))
    m_pad = -(-M // _LANE) * _LANE
    return (B > 1 and B * Nq < 2 ** 24
            and _full_z_ok(M, tuple(grid_shape), slot_cap)
            and M >= max(k, 4 * cells) and m_pad >= slot_cap)


def grid_batched_defaults_ok(B: int, Nq: int, M: int, k: int = 3) -> bool:
    """`_batched_grid_ok` at the public entry points' default grid config
    ((16, 12, 8)/384) — the static predicate the sampler uses to pick the
    flat-batched layout path at B > 1 (group chunking is internal)."""
    return _batched_grid_ok(B, Nq, M, (16, 12, 8), 384, k)


def grid_knn_interpolate_layout_batched(
        query: jnp.ndarray, ref: jnp.ndarray, values: jnp.ndarray,
        k: int = 3, *, grid_shape=(16, 12, 8), tq: int = 128,
        slot_cap: int = 384, fallback_cap: int = 4096,
        interpret: bool = False, eps: float = 1e-8, xy_halo=1):
    """Flat-batched `grid_knn_interpolate_layout`: query [B, Nq, 3],
    ref [B, M, 3], values [B, M, C] -> (v [NPg, C], qid [NPg]) with GLOBAL
    query ids (b*Nq + local; padding sentinel B*Nq).

    One structure build (composite-key sorts over [B*M]), one layout sort
    over [B*Nq], one kernel launch over all clouds' tiles, one fallback
    ladder — instead of `lax.map`'s B serial passes. Requires a
    full-column-z grid config (`_full_z_ok`; true at the production
    (16,12,8)/384 default) and B <= {0} so the concatenated resident
    refs/values stay inside VMEM; callers chunk above that.
    """.format(_BATCHED_MAX_GROUP)
    if slot_cap % _LANE:
        raise ValueError(f"slot_cap must be a multiple of {_LANE}, got "
                         f"{slot_cap}")
    B, Nq, _ = query.shape
    if not _batched_grid_ok(B, Nq, ref.shape[1], grid_shape, slot_cap, k):
        raise ValueError(
            f"flat-batched grid interp requires B > 1, B*Nq < 2^24, a "
            f"full-column-z grid config and non-degenerate refs; got "
            f"B={B}, Nq={Nq}, M={ref.shape[1]}, grid_shape={grid_shape}, "
            f"slot_cap={slot_cap}")
    k = min(k, ref.shape[1])
    group = max(1, _BATCHED_MAX_GROUP)
    if B <= group:
        return _grid_interp_batched_layout(
            query, ref, values, k=k, grid_shape=tuple(grid_shape), tq=tq,
            slot_cap=slot_cap, fallback_cap=fallback_cap,
            interpret=interpret, eps=eps, xy_halo=xy_halo)
    # chunk into flat-batch groups (VMEM residency + layout-sort cliff —
    # see _BATCHED_MAX_GROUP); group ids lift to GLOBAL query ids and the
    # per-group padding sentinels unify to B*Nq, so the concatenated
    # layout composes with downstream assemblies exactly like one group
    vs, qids = [], []
    sentinel = jnp.int32(B * Nq)
    for s in range(0, B, group):
        e = min(s + group, B)
        if e - s == 1:
            v_g, qid_g = _grid_interp_single_layout(
                query[s], ref[s], values[s], k=k,
                grid_shape=tuple(grid_shape), tq=tq, slot_cap=slot_cap,
                fallback_cap=fallback_cap, interpret=interpret, z_halo=2,
                eps=eps, xy_halo=xy_halo)
            lim = Nq
        else:
            v_g, qid_g = _grid_interp_batched_layout(
                query[s:e], ref[s:e], values[s:e], k=k,
                grid_shape=tuple(grid_shape), tq=tq, slot_cap=slot_cap,
                fallback_cap=fallback_cap, interpret=interpret, eps=eps,
                xy_halo=xy_halo)
            lim = (e - s) * Nq
        qids.append(jnp.where(qid_g < lim, qid_g + s * Nq, sentinel))
        vs.append(v_g)
    return jnp.concatenate(vs, axis=0), jnp.concatenate(qids, axis=0)


def _strip_interp_patch(struct, grid_shape, query: jnp.ndarray,
                        ids: jnp.ndarray, vals_pad: jnp.ndarray, k: int,
                        eps: float, interpret: bool,
                        strip_blocks: int = 64, tp: int = 128):
    """Exact fused kNN+interp for patched rows against their own ±1 x-SLAB
    STRIP — a contiguous run of the slab-sorted ref array (the equal-count
    build sorts refs by x first, so slabs [lo, hi] occupy [SB[lo], SB[hi+1])
    exactly). ~4 slabs of a 16-slab grid ≈ 1/4 the candidates of the full
    brute patch, through the same resident kernel.

    ``ids`` [cap] are row indices into ``query`` (fill value Nq for unused
    slots). Returns (ids_s [cap], vals [cap, C], fail [cap]) in an
    arbitrary (slab-sorted) order — callers scatter by ``ids_s``, so no
    unsort pass exists. ``fail`` marks rows needing a WIDER patch: strip
    window overflowed ``strip_blocks``, or the k-th candidate's ball
    reaches past the strip's x-interval (exactness test: candidates are
    exactly the strip's refs, so d_k <= dist(q, strip x-boundary)^2 proves
    the result exact; domain-edge strips extend to ±inf)."""
    from .pallas.grid_fused import grid_interp_resident

    if ids.shape[0] % tp:
        raise ValueError(f"cap={ids.shape[0]} must be a multiple of "
                         f"tp={tp}")
    Sx, Sy, Sz = grid_shape
    (refs_pad, order_r, xb, yb, zb, xb_full, yb_full, zb_full, CS,
     M, M_pad) = struct
    Nq = query.shape[0]
    cap = ids.shape[0]
    SB = jnp.asarray(_partition_tables(M, Sx, Sy, Sz)[0].astype(np.int32))

    rows_ok = ids < Nq
    q_rows = query[jnp.clip(ids, 0, Nq - 1)]
    qsx = jnp.sum(q_rows[:, 0:1] >= xb[None, :], axis=1).astype(jnp.int32)
    qsx = jnp.where(rows_ok, qsx, Sx)  # padding sorts to the end
    qx = jnp.where(rows_ok, q_rows[:, 0], _FAR)
    qy = jnp.where(rows_ok, q_rows[:, 1], _FAR)
    qz = jnp.where(rows_ok, q_rows[:, 2], _FAR)
    # ids ride the sort as exact f32 VALUES (< 2^24), never bitcast
    sx_s, qx_s, qy_s, qz_s, idf_s = jax.lax.sort(
        (qsx, qx, qy, qz, ids.astype(jnp.float32)), num_keys=1)
    ids_s = jnp.minimum(idf_s, float(Nq)).astype(jnp.int32)

    Tp = cap // tp
    sx_t = sx_s.reshape(Tp, tp)
    ok_t = (ids_s < Nq).reshape(Tp, tp)
    lo = jnp.clip(jnp.min(jnp.where(ok_t, sx_t, Sx), axis=1) - 1, 0, Sx - 1)
    hi = jnp.clip(jnp.max(jnp.where(ok_t, sx_t, -1), axis=1) + 1, 0, Sx - 1)
    st = SB[lo]
    en = jnp.where(jnp.any(ok_t, axis=1), SB[hi + 1], 0)
    bps = strip_blocks
    stb = jnp.clip(st // _LANE, 0, max(M_pad // _LANE - bps, 0))
    tile_fit = (en - stb * _LANE) <= bps * _LANE  # [Tp]

    q_pad = jnp.stack([qx_s, qy_s, qz_s], axis=1)
    v_s, d_s = grid_interp_resident(
        q_pad, refs_pad, vals_pad, stb[:, None].astype(jnp.int32),
        st[:, None].astype(jnp.int32), en[:, None].astype(jnp.int32),
        k=k, tq=tp, blocks_per_slot=bps, eps=eps, interpret=interpret)

    x_lo = xb_full[lo]  # [Tp]; ±inf at domain edges
    x_hi = xb_full[hi + 1]
    m = jnp.minimum(qx_s.reshape(Tp, tp) - x_lo[:, None],
                    x_hi[:, None] - qx_s.reshape(Tp, tp))
    d_last = d_s[:, k - 1].reshape(Tp, tp)
    safe = (tile_fit[:, None] & (d_last <= m * m) & (d_last < 1e29))
    fail = (~safe.reshape(-1)) & (ids_s < Nq)
    return ids_s, v_s, fail


def _interp_weights(sq_d: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Inverse-distance weights, normalised — EXACT formula parity with
    ops/interpolate.py::knn_interpolate_weights."""
    dist = jnp.sqrt(jnp.maximum(sq_d, 0.0))
    w = 1.0 / (dist + eps)
    return w / jnp.sum(w, axis=-1, keepdims=True)


def _brute_interp(query, ref, values, k, eps, interpret):
    """Brute kNN + inverse-distance interpolation in XLA (fallback path)."""
    db, ib = _brute(query, ref, k, interpret, True)
    w = _interp_weights(db, eps)
    vb = values[jnp.clip(ib, 0, values.shape[0] - 1)]  # [n, k, C]
    return jnp.sum(vb * w[..., None], axis=1)


@functools.partial(jax.jit, static_argnames=("k", "grid_shape", "tq",
                                             "slot_cap", "fallback_cap",
                                             "interpret", "z_halo", "eps",
                                             "xy_halo"))
def _grid_interp_single(query: jnp.ndarray, ref: jnp.ndarray,
                        values: jnp.ndarray, k: int, grid_shape, tq: int,
                        slot_cap: int, fallback_cap: int, interpret: bool,
                        z_halo: int, eps: float, xy_halo=1):
    """Unbatched fused kNN-interpolation: query [Nq,3], ref [M,3],
    values [M,C] -> [Nq,C]. Same tiered brute fallback as _grid_knn_single,
    with the patch recomputing interpolated VALUES for unsafe rows.

    A second grid pass with xy_halo=2 over the unsafe rows (reusing the
    built structure) was implemented and MEASURED SLOWER end-to-end
    (1.70 vs 1.41 s/cloud on the 50-step parity sampler): the extra
    query-layout sort, slot tables, nested cond and 25-slot kernel cost
    more in context than the brute patches they replace, even though the
    isolated candidate count is ~4x smaller. The plain geometric brute
    tiers stand; _query_pass(xy_halo=...) remains available.

    The tier ladder MUST be strictly increasing: sel counts how many caps
    the unsafe count exceeds, so a smaller cap after a larger one would
    route overflowing rows to an undersized patch buffer (silently
    inexact)."""
    Nq = query.shape[0]
    query = query.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    values = values.astype(jnp.float32)
    fz = _full_z_ok(ref.shape[0], grid_shape, slot_cap)
    struct = _build_struct(ref, grid_shape, skip_z_sort=fz)
    vals_pad = jnp.pad(values[struct[1]],
                       ((0, struct[10] - struct[9]), (0, 0)))
    v_out, unsafe = _query_pass(struct, query, k, grid_shape, tq, slot_cap,
                                interpret, z_halo, xy_halo, values, eps,
                                vals_pad=vals_pad,
                                full_z=True if fz else None)

    n_unsafe = jnp.sum(unsafe)

    # An always-on slab-strip patch (exact brute over the unsafe rows' own
    # ±1 x-slab strip — a contiguous run of the slab-sorted refs — through
    # the resident kernel, with full-brute tiers only for strip failures)
    # was implemented and MEASURED SLOWER in the sampler (23.6 vs 22.9
    # ms/step): the static 64-block window must cover the worst tile, so
    # the kernel pays ~8k candidates/tile regardless, and the extraction
    # passes — not the candidate count — dominate; see
    # _strip_interp_patch, kept as a library facility.
    # shared keys-only-sort compaction — see _grid_knn_single
    unsafe_ids = jnp.sort(jnp.where(unsafe,
                                    jnp.arange(Nq, dtype=jnp.int32), Nq))

    def make_patched(cap):
        def patched(_):
            ids = unsafe_ids[:cap]
            qf = query[jnp.clip(ids, 0, Nq - 1)]
            vals = _brute_interp(qf, ref, values, k, eps, interpret)
            # ascending ids (see _grid_knn_single's patched branch)
            return v_out.at[ids].set(vals, mode="drop",
                                     indices_are_sorted=True)
        return patched

    def all_brute(_):
        return _brute_interp(query, ref, values, k, eps, interpret)

    caps = _fallback_caps(fallback_cap, Nq)
    branches = [make_patched(c) for c in caps] + [all_brute]
    sel = sum((n_unsafe > c).astype(jnp.int32) for c in caps)
    return jax.lax.switch(sel, branches, None)

def grid_knn_interpolate(query: jnp.ndarray, ref: jnp.ndarray,
                         values: jnp.ndarray, k: int = 3, *,
                         grid_shape=(16, 12, 8), tq: int = 128,
                         slot_cap: int = 384, fallback_cap: int = 4096,
                         interpret: bool = False, z_halo: int = 2,
                         eps: float = 1e-8, xy_halo=1) -> jnp.ndarray:
    """Fused exact-kNN + inverse-distance interpolation: query [B, N, 3],
    ref [B, M, 3], values [B, M, C] -> [B, N, C].

    Equivalent to ``knn_interpolate`` (knn + 1/(dist+eps) weights + gather
    + weighted sum) but the neighbour-value gather and weighting happen
    inside the grid kernel over VMEM-resident candidates — the XLA gather
    of [N, k, C] values from HBM is the single largest post-kNN cost of the
    hierarchical sampler's hot loop (docs/PERF_NOTES.md round-2 addenda).
    Neighbour SELECTION is exact (same margin proof + tiered brute
    fallback as grid_knn); only the weighted-sum reduction order differs
    from the XLA path (float-level, ~1e-7 relative)."""
    if slot_cap % _LANE:
        raise ValueError(f"slot_cap must be a multiple of {_LANE}, got "
                         f"{slot_cap}")
    if query.shape[1] >= 2 ** 24:
        # query ids ride f32 lanes as exact VALUES; exact only below 2^24
        raise ValueError(f"grid_knn_interpolate supports < 2^24 queries, "
                         f"got {query.shape[1]}")
    k = min(k, ref.shape[1])
    cells = int(np.prod(grid_shape))
    m_pad = -(-ref.shape[1] // _LANE) * _LANE
    if ref.shape[1] < max(k, 4 * cells) or m_pad < slot_cap:
        return jax.vmap(
            lambda q, r, v: _brute_interp(q.astype(jnp.float32),
                                          r.astype(jnp.float32),
                                          v.astype(jnp.float32), k, eps,
                                          interpret))(query, ref, values)
    fn = functools.partial(_grid_interp_single, k=k,
                           grid_shape=tuple(grid_shape), tq=tq,
                           slot_cap=slot_cap, fallback_cap=fallback_cap,
                           interpret=interpret, z_halo=z_halo, eps=eps,
                           xy_halo=xy_halo)
    B, Nq, _ = query.shape
    if B == 1:
        return fn(query[0], ref[0], values[0])[None]
    if _batched_grid_ok(B, Nq, ref.shape[1], grid_shape, slot_cap, k):
        # flat-batch: one structure build + one kernel pass + one fallback
        # ladder for all clouds instead of lax.map's B serial passes;
        # chunked so the concatenated VMEM-resident refs/values stay in
        # budget (larger batches recurse per group)
        if B > _BATCHED_MAX_GROUP:
            groups = [
                grid_knn_interpolate(
                    query[s:s + _BATCHED_MAX_GROUP],
                    ref[s:s + _BATCHED_MAX_GROUP],
                    values[s:s + _BATCHED_MAX_GROUP], k,
                    grid_shape=grid_shape, tq=tq, slot_cap=slot_cap,
                    fallback_cap=fallback_cap, interpret=interpret,
                    z_halo=z_halo, eps=eps, xy_halo=xy_halo)
                for s in range(0, B, _BATCHED_MAX_GROUP)]
            return jnp.concatenate(groups, axis=0)
        v_lay, qid = _grid_interp_batched_layout(
            query, ref, values, k=k, grid_shape=tuple(grid_shape), tq=tq,
            slot_cap=slot_cap, fallback_cap=fallback_cap,
            interpret=interpret, eps=eps, xy_halo=xy_halo)
        # unsort to [B, Nq, C]: qid is a permutation of 0..B*Nq-1 over the
        # real layout rows (global ids are already (cloud, local)-ordered)
        NPg = qid.shape[0]
        _, posq = jax.lax.sort(
            (qid, jnp.arange(NPg, dtype=jnp.int32)), num_keys=1)
        return v_lay[posq[:B * Nq]].reshape(B, Nq, -1)
    return jax.lax.map(lambda a: fn(a[0], a[1], a[2]), (query, ref, values))


@functools.partial(jax.jit, static_argnames=("k", "grid_shape", "tq",
                                             "slot_cap", "fallback_cap",
                                             "interpret", "z_halo", "eps",
                                             "xy_halo"))
def _grid_interp_single_layout(query: jnp.ndarray, ref: jnp.ndarray,
                               values: jnp.ndarray, k: int, grid_shape,
                               tq: int, slot_cap: int, fallback_cap: int,
                               interpret: bool, z_halo: int, eps: float,
                               xy_halo=1):
    """`_grid_interp_single` that returns values in PADDED LAYOUT ORDER
    plus the layout's original-query-id map, instead of unsorting:
    (v [NP, C], qid [NP]) with qid == Nq on padding positions.

    Exactly the same per-query values as `_grid_interp_single` (same kernel
    pass, same fallback ladder counting only REAL unsafe rows) — only the
    output order differs. Callers that immediately re-permute the result
    (the sampler's noise-field assembly) compose qid into their own
    inverse-permutation sort, deleting this function's would-be unsort sort
    and [Nq, C] row gather from the step."""
    Nq = query.shape[0]
    query = query.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    values = values.astype(jnp.float32)
    fz = _full_z_ok(ref.shape[0], grid_shape, slot_cap)
    struct = _build_struct(ref, grid_shape, skip_z_sort=fz)
    vals_pad = jnp.pad(values[struct[1]],
                       ((0, struct[10] - struct[9]), (0, 0)))
    v_out, safe_flat, qid, q_pad = _query_pass(
        struct, query, k, grid_shape, tq, slot_cap, interpret, z_halo,
        xy_halo, values, eps, vals_pad=vals_pad,
        full_z=True if fz else None, layout_out=True)
    NP = v_out.shape[0]

    # padding positions are structurally "unsafe" (FAR coords, no real
    # candidates) but must never consume fallback capacity: the unsort
    # path drops them via posq[:Nq]; here they are masked out instead, so
    # n_unsafe and the tier selection match the unsort path exactly.
    unsafe = (~safe_flat) & (qid < Nq)
    n_unsafe = jnp.sum(unsafe)
    # shared keys-only-sort compaction over layout positions
    unsafe_pos = jnp.sort(jnp.where(unsafe,
                                    jnp.arange(NP, dtype=jnp.int32), NP))

    def make_patched(cap):
        def patched(_):
            pos = unsafe_pos[:cap]
            qf = q_pad[jnp.clip(pos, 0, NP - 1)]
            vals = _brute_interp(qf, ref, values, k, eps, interpret)
            return v_out.at[pos].set(vals, mode="drop",
                                     indices_are_sorted=True)
        return patched

    def all_brute(_):
        # brute over the layout-order coords (row-independent, so real
        # positions get identical values; padding rows stay garbage and are
        # dropped by the caller's composed permutation)
        return _brute_interp(q_pad, ref, values, k, eps, interpret)

    caps = _fallback_caps(fallback_cap, Nq)
    branches = [make_patched(c) for c in caps] + [all_brute]
    sel = sum((n_unsafe > c).astype(jnp.int32) for c in caps)
    return jax.lax.switch(sel, branches, None), qid


def grid_knn_interpolate_layout(query: jnp.ndarray, ref: jnp.ndarray,
                                values: jnp.ndarray, k: int = 3, *,
                                grid_shape=(16, 12, 8), tq: int = 128,
                                slot_cap: int = 384, fallback_cap: int = 4096,
                                interpret: bool = False, z_halo: int = 2,
                                eps: float = 1e-8, xy_halo=1):
    """UNBATCHED `grid_knn_interpolate` returning layout-order values plus
    the permutation: query [Nq, 3], ref [M, 3], values [M, C] ->
    (v [NP, C], qid [NP] int32), where NP >= Nq is the static padded layout
    length, ``v[j]`` interpolates query ``qid[j]``, every real query id
    appears exactly once, and padding positions carry ``qid == Nq``.

    For callers that re-permute the interpolated field anyway (the
    sampler's per-step noise-field assembly, models/samplers.py): composing
    ``qid`` into the downstream inverse-permutation sort deletes this op's
    internal unsort (a 2-operand [NP] sort + [Nq, C] gather per call).
    Falls back to original-order brute (qid = arange) on degenerate sizes,
    mirroring `grid_knn_interpolate`'s guards."""
    if slot_cap % _LANE:
        raise ValueError(f"slot_cap must be a multiple of {_LANE}, got "
                         f"{slot_cap}")
    if query.ndim != 2:
        raise ValueError("grid_knn_interpolate_layout is unbatched: "
                         f"query must be [Nq, 3], got {query.shape}")
    Nq = query.shape[0]
    if Nq >= 2 ** 24:
        raise ValueError(f"grid_knn_interpolate_layout supports < 2^24 "
                         f"queries, got {Nq}")
    k = min(k, ref.shape[0])
    cells = int(np.prod(grid_shape))
    m_pad = -(-ref.shape[0] // _LANE) * _LANE
    if ref.shape[0] < max(k, 4 * cells) or m_pad < slot_cap:
        v = _brute_interp(query.astype(jnp.float32),
                          ref.astype(jnp.float32),
                          values.astype(jnp.float32), k, eps, interpret)
        return v, jnp.arange(Nq, dtype=jnp.int32)
    return _grid_interp_single_layout(
        query, ref, values, k=k, grid_shape=tuple(grid_shape), tq=tq,
        slot_cap=slot_cap, fallback_cap=fallback_cap, interpret=interpret,
        z_halo=z_halo, eps=eps, xy_halo=xy_halo)
