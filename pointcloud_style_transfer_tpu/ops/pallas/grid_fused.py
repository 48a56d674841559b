"""Pallas TPU kernel for the equal-count kd-grid kNN: VMEM-resident refs +
scalar-prefetched slot offsets.

The first grid-kNN implementation (ops/grid_knn.py round 2) gathered each
query tile's candidate runs into a dense [T, 9*cap, 3] HBM buffer and vmapped
the brute tile kernel over it. Stage profiling on v5e showed that layout is
plumbing-bound, not compute-bound: the XLA candidate gather alone costs
~10 ms and the 848 vmapped single-tile programs pay ~5 us each of small-DMA
latency, while the actual distance+extraction work is worth ~1 ms
(docs/PERF_NOTES.md, round-2 addenda).

This kernel removes both costs:

* The ENTIRE sorted ref array lives in VMEM for the whole call — 30k refs in
  [NB, 3, 128] block layout are ~1 MB, loaded by one DMA and resident across
  all grid iterations (constant index_map). There is no candidate gather:
  each program reads its 9 slot runs directly out of the resident array with
  dynamic indexing on the untiled leading (block) dimension, the supported
  fast path for runtime offsets.
* Slot offsets arrive via ``pltpu.PrefetchScalarGridSpec``: three small
  [T, S] int32 tables (block start, exact run start, exact run end) are
  prefetched to SMEM before the body runs. Runs are 128-block-aligned by the
  caller; candidates outside the EXACT [st, en) run are masked to +inf so
  alignment padding can never duplicate a candidate that another slot covers.
* Each program writes its S*BPS candidate blocks into a per-tile [tq, W]
  VMEM distance scratch and extracts top-k in ONE full-width k-pass sweep
  (two reductions per neighbour, first occurrence — lowest sorted position —
  on ties). Per-block running top-k was measured 5x slower: it pays the
  lane-reduction latency and a [tq, 1] merge network per 128 candidates
  instead of per tile.

Returned indices are positions in the SORTED ref array; the caller maps them
back through its sort permutation (or pre-sorts per-step payload arrays to
skip that gather entirely — see the sampler's fused interpolation path).

Replaces the per-step CPU sklearn kNN of the reference's hot sampling loop
(/root/reference/models/diffusion_model.py:244-246).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30
_LANE = 128


def _grid_topk_kernel(stb_ref, st_ref, en_ref, q_ref, refs_ref,
                      d_out, i_out, dist_buf, col_buf, *, k: int, tq: int,
                      n_slots: int, blocks_per_slot: int):
    """Grid = (T,). Per program: tq queries vs n_slots aligned runs of the
    resident ref array.

    stb_ref/st_ref/en_ref: [T * n_slots] SMEM (scalar prefetch) — 128-block
        start index, exact run start, exact run end (positions in sorted
        refs). Flat 1-D layout: 2-D SMEM arrays are lane-padded to 128 on the
        minor dim, which blows the ~1 MB SMEM budget at T≈850.
    q_ref: [tq, 3] query tile
    refs_ref: [NB, 3, 128] the ENTIRE sorted ref array, VMEM-resident
    d_out/i_out: [tq, k]
    dist_buf/col_buf: [tq, n_slots * blocks_per_slot * 128] VMEM scratch

    Two phases. Phase 1 streams the 18 candidate blocks into a per-tile
    [tq, W] distance scratch (+ a global-position scratch for index
    recovery), masking everything outside each slot's exact [st, en) run to
    +inf. Phase 2 runs ONE k-pass extraction over the full-width scratch.
    A first version extracted top-k per 128-lane block with a [tq, 1]
    bubble-merge network; that costs 6 lane-reductions + ~27 tiny [tq, 1]
    ops per block (~108 reductions and ~500 poorly-utilized vector ops per
    tile) and measured 22.8 ms of the 29.7 ms call. Full-width extraction
    does the same candidate passes with 6 reductions per TILE and no tiny
    ops, and the k minima emerge already sorted.
    """
    t = pl.program_id(0)

    qx = q_ref[:, 0:1]
    qy = q_ref[:, 1:2]
    qz = q_ref[:, 2:3]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, _LANE), 1)

    def slot_body(s, _):
        stb = stb_ref[t * n_slots + s]
        st = st_ref[t * n_slots + s]
        en = en_ref[t * n_slots + s]
        for bb in range(blocks_per_slot):
            blk = refs_ref[stb + bb]  # [3, 128]
            rx = blk[0:1, :]
            ry = blk[1:2, :]
            rz = blk[2:3, :]
            dx = qx - rx
            dy = qy - ry
            dz = qz - rz
            dist = dx * dx + dy * dy + dz * dz  # [tq, 128]
            col = lane + (stb + bb) * _LANE
            # mask alignment padding and other slots' rows to +inf: only the
            # exact [st, en) run of this slot competes (no duplicates; the
            # 9 slots lie in 9 distinct rows, so valid runs are disjoint)
            dist = jnp.where((col >= st) & (col < en), dist, _BIG)
            w0 = (s * blocks_per_slot + bb) * _LANE
            dist_buf[:, pl.ds(w0, _LANE)] = dist
            col_buf[:, pl.ds(w0, _LANE)] = col
        return 0

    jax.lax.fori_loop(0, n_slots, slot_body, 0)

    cur = dist_buf[:, :]  # [tq, W]
    col = col_buf[:, :]
    D = []
    I = []
    for _ in range(k):
        m = jnp.min(cur, axis=1, keepdims=True)
        # first occurrence (lowest sorted position) on ties
        midx = jnp.min(jnp.where(cur == m, col, jnp.int32(2**30)),
                       axis=1, keepdims=True)
        cur = jnp.where(col == midx, _BIG, cur)
        D.append(m)
        I.append(midx)
    d_out[:] = jnp.concatenate(D, axis=1)
    i_out[:] = jnp.concatenate(I, axis=1)


def _grid_interp_kernel(stb_ref, st_ref, en_ref, q_ref, refs_ref, vals_ref,
                        v_out, d_out, dist_buf, col_buf, *val_bufs, k: int,
                        tq: int, n_slots: int, blocks_per_slot: int,
                        n_chan: int, eps: float):
    """Like _grid_topk_kernel, but fuses inverse-distance-weighted
    interpolation of per-ref values into the extraction pass: the XLA
    alternative gathers [Nq, k, C] neighbour values from HBM after the kNN
    (~810k elements at the sampler's geometry — gathers are the slowest op
    class on this backend, docs/PERF_NOTES.md). Here the values ride the
    resident ref array ([NB, C, 128] blocks) and the weighted combine is a
    masked full-width reduction in VMEM.

    vals_ref: [NB, n_chan, 128] values aligned with refs_ref rows
    v_out: [tq, n_chan] interpolated values; d_out: [tq, k] (for the
    caller's margin check). val_bufs: n_chan scratches [8, W] holding each
    channel's candidate row (value vectors are per-candidate, not
    per-query, so 8 sublanes suffice).
    """
    t = pl.program_id(0)

    qx = q_ref[:, 0:1]
    qy = q_ref[:, 1:2]
    qz = q_ref[:, 2:3]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, _LANE), 1)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, _LANE), 1)

    def slot_body(s, _):
        stb = stb_ref[t * n_slots + s]
        st = st_ref[t * n_slots + s]
        en = en_ref[t * n_slots + s]
        for bb in range(blocks_per_slot):
            blk = refs_ref[stb + bb]  # [3, 128]
            dx = qx - blk[0:1, :]
            dy = qy - blk[1:2, :]
            dz = qz - blk[2:3, :]
            dist = dx * dx + dy * dy + dz * dz
            col = lane + (stb + bb) * _LANE
            valid = (col >= st) & (col < en)
            dist = jnp.where(valid, dist, _BIG)
            # masked entries store col = -1: a position can sit in TWO
            # slots' aligned windows (valid in one, alignment padding in
            # the other), and the weighted-mask combine below matches on
            # col equality — a duplicate col would double-count its value
            # (min-extraction alone is immune; the value sum is not)
            col = jnp.where(valid, col, -1)
            w0 = (s * blocks_per_slot + bb) * _LANE
            dist_buf[:, pl.ds(w0, _LANE)] = dist
            col_buf[:, pl.ds(w0, _LANE)] = col
            vblk = vals_ref[stb + bb]  # [n_chan, 128]
            for c in range(n_chan):
                val_bufs[c][:, pl.ds(w0, _LANE)] = (
                    vblk[c:c + 1, :] + lane8[:, :1] * 0.0)
        return 0

    jax.lax.fori_loop(0, n_slots, slot_body, 0)

    cur = dist_buf[:, :]  # [tq, W]
    col = col_buf[:, :]
    D = []
    W_ = []
    MIDX = []
    for _ in range(k):
        m = jnp.min(cur, axis=1, keepdims=True)
        midx = jnp.min(jnp.where(cur == m, col, jnp.int32(2**30)),
                       axis=1, keepdims=True)
        cur = jnp.where(col == midx, _BIG, cur)
        D.append(m)
        MIDX.append(midx)
        # EXACT formula parity with ops/interpolate.py: 1/(sqrt(d)+eps)
        W_.append(1.0 / (jnp.sqrt(jnp.maximum(m, 0.0)) + eps))
    wsum = W_[0]
    for u in range(1, k):
        wsum = wsum + W_[u]
    # weighted selection mask over the full candidate width
    wm = (col == MIDX[0]).astype(jnp.float32) * (W_[0] / wsum)
    for u in range(1, k):
        wm = wm + (col == MIDX[u]).astype(jnp.float32) * (W_[u] / wsum)
    vcols = []
    for c in range(n_chan):
        vrow = val_bufs[c][0:1, :]  # [1, W]
        vcols.append(jnp.sum(wm * vrow, axis=1, keepdims=True))
    v_out[:] = jnp.concatenate(vcols, axis=1)
    d_out[:] = jnp.concatenate(D, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "tq", "blocks_per_slot",
                                             "eps", "interpret"))
def grid_interp_resident(q_pad: jnp.ndarray, refs_sorted: jnp.ndarray,
                         vals_sorted: jnp.ndarray, stb: jnp.ndarray,
                         st: jnp.ndarray, en: jnp.ndarray, k: int,
                         tq: int = 128, blocks_per_slot: int = 2,
                         eps: float = 1e-8, interpret: bool = False):
    """Fused kNN + inverse-distance interpolation over slot runs.

    vals_sorted: [M_pad, C] per-ref values in the SAME (grid-sorted) order
    as refs_sorted. Returns (v [NP, C] interpolated values, d [NP, k]).
    """
    NP, _ = q_pad.shape
    M_pad, C = vals_sorted.shape
    T, S = stb.shape
    assert NP % tq == 0 and NP // tq == T and M_pad % _LANE == 0
    refs_blk = refs_sorted.astype(jnp.float32).reshape(
        M_pad // _LANE, _LANE, 3).transpose(0, 2, 1)  # [NB, 3, 128]
    vals_blk = vals_sorted.astype(jnp.float32).reshape(
        M_pad // _LANE, _LANE, C).transpose(0, 2, 1)  # [NB, C, 128]
    W = S * blocks_per_slot * _LANE

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((tq, 3), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M_pad // _LANE, 3, _LANE), lambda t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M_pad // _LANE, C, _LANE), lambda t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tq, C), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, k), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=(
            [pltpu.VMEM((tq, W), jnp.float32),
             pltpu.VMEM((tq, W), jnp.int32)]
            + [pltpu.VMEM((8, W), jnp.float32) for _ in range(C)]
        ),
    )
    v, d = pl.pallas_call(
        functools.partial(_grid_interp_kernel, k=k, tq=tq, n_slots=S,
                          blocks_per_slot=blocks_per_slot, n_chan=C,
                          eps=eps),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((NP, C), jnp.float32),
            jax.ShapeDtypeStruct((NP, k), jnp.float32),
        ],
        interpret=interpret,
    )(stb.reshape(-1), st.reshape(-1), en.reshape(-1),
      q_pad.astype(jnp.float32), refs_blk, vals_blk)
    return v, d


@functools.partial(jax.jit, static_argnames=("k", "tq", "blocks_per_slot",
                                             "interpret"))
def grid_topk_resident(q_pad: jnp.ndarray, refs_sorted: jnp.ndarray,
                       stb: jnp.ndarray, st: jnp.ndarray, en: jnp.ndarray,
                       k: int, tq: int = 128, blocks_per_slot: int = 2,
                       interpret: bool = False):
    """kNN of padded query tiles against slot runs of a sorted ref array.

    Args:
        q_pad: [NP, 3] tile-padded queries (padding at +1e15), NP % tq == 0
        refs_sorted: [M_pad, 3] grid-sorted refs, M_pad % 128 == 0, padding
            rows at +1e15
        stb/st/en: [T, S] int32 per-tile slot tables: 128-block start
            (stb*128 <= st, stb*128 + blocks_per_slot*128 >= en for in-budget
            slots), exact run [st, en). Empty slots: st == en.
    Returns:
        (d [NP, k] f32, i [NP, k] i32) — i indexes the SORTED ref array.
    """
    NP, _ = q_pad.shape
    M_pad = refs_sorted.shape[0]
    T, S = stb.shape
    assert NP % tq == 0 and NP // tq == T and M_pad % _LANE == 0
    refs_blk = refs_sorted.astype(jnp.float32).reshape(
        M_pad // _LANE, _LANE, 3).transpose(0, 2, 1)  # [NB, 3, 128]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((tq, 3), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M_pad // _LANE, 3, _LANE), lambda t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tq, k), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, k), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq, S * blocks_per_slot * _LANE), jnp.float32),
            pltpu.VMEM((tq, S * blocks_per_slot * _LANE), jnp.int32),
        ],
    )
    d, i = pl.pallas_call(
        functools.partial(_grid_topk_kernel, k=k, tq=tq, n_slots=S,
                          blocks_per_slot=blocks_per_slot),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((NP, k), jnp.float32),
            jax.ShapeDtypeStruct((NP, k), jnp.int32),
        ],
        interpret=interpret,
    )(stb.reshape(-1), st.reshape(-1), en.reshape(-1),
      q_pad.astype(jnp.float32), refs_blk)
    return d, jnp.clip(i, 0, M_pad - 1)
