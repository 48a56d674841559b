"""Pairwise point-distance primitives (jnp reference implementations).

These are the memory-safe, XLA-friendly building blocks shared by the Chamfer
loss, kNN upsampling, ball query and evaluation metrics. Semantics follow the
reference implementation:

* ``square_distance`` — |src - dst|^2 via the matmul expansion
  (reference: models/pointnet2_encoder.py:8-15).
* ``chamfer_distance`` — chunked bidirectional squared-L2 Chamfer returning one
  value per batch element (reference: models/losses.py:8-63). The reference
  chunks over the query axis to avoid materialising the full N x M matrix; we
  do the same with a ``lax.scan`` so everything stays on device and jittable.
* ``knn`` — k smallest (squared) distances + indices, chunked the same way.

All distance math runs in float32 regardless of the surrounding compute dtype:
nearest-neighbour argmins are brittle in bf16 and the matmuls here are small
relative to HBM traffic.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp


_PALLAS_ENABLED = True


def set_pallas_enabled(enabled: bool) -> None:
    """Process-wide kernel switch backing ``Config.use_pallas``: entry points
    (trainer, CLIs) call this with the config value so a checkpoint-embedded
    ``use_pallas=False`` actually disables kernel dispatch."""
    global _PALLAS_ENABLED
    _PALLAS_ENABLED = bool(enabled)


def use_pallas_default() -> bool:
    """Pallas kernels are used automatically on TPU backends; set
    PCST_DISABLE_PALLAS=1 (or Config.use_pallas=False via
    ``set_pallas_enabled``) to force the chunked jnp path everywhere."""
    if os.environ.get("PCST_DISABLE_PALLAS") or not _PALLAS_ENABLED:
        return False
    return jax.default_backend() != "cpu"


def square_distance(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Squared Euclidean distance between two point sets.

    Args:
        src: [..., N, C]
        dst: [..., M, C]
    Returns:
        [..., N, M] squared distances (may be slightly negative from rounding;
        callers that need non-negativity should clamp, as the reference does in
        its chunked Chamfer, models/losses.py:39).
    """
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    d = -2.0 * jnp.einsum("...nc,...mc->...nm", src, dst,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
    d = d + jnp.sum(src**2, axis=-1)[..., :, None]
    d = d + jnp.sum(dst**2, axis=-1)[..., None, :]
    return d


def _pad_to_multiple(x: jnp.ndarray, axis: int, multiple: int) -> tuple[jnp.ndarray, int]:
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad:
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        x = jnp.pad(x, widths)
    return x, pad


@partial(jax.jit, static_argnames=("chunk_size",))
def min_sq_dist_jnp(query: jnp.ndarray, ref: jnp.ndarray,
                    chunk_size: int = 2048) -> jnp.ndarray:
    """For each query point, the min squared distance to any ref point.

    Chunked over the query axis so peak memory is B*chunk*M instead of B*N*M
    (reference chunking idea: models/losses.py:28-42).

    Args:
        query: [B, N, 3]; ref: [B, M, 3]
    Returns:
        [B, N] float32 minimum squared distances (clamped at 0).
    """
    query = query.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    B, N, _ = query.shape
    ref_sq = jnp.sum(ref**2, axis=-1)  # [B, M]

    qp, _ = _pad_to_multiple(query, 1, chunk_size)
    n_chunks = qp.shape[1] // chunk_size
    # [n_chunks, B, chunk, 3]
    qc = jnp.moveaxis(qp.reshape(B, n_chunks, chunk_size, 3), 1, 0)

    def body(_, q):
        d = -2.0 * jnp.einsum("bnc,bmc->bnm", q, ref,
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)
        d = d + jnp.sum(q**2, axis=-1)[..., None] + ref_sq[:, None, :]
        return None, jnp.maximum(jnp.min(d, axis=-1), 0.0)

    _, mins = jax.lax.scan(body, None, qc)  # [n_chunks, B, chunk]
    return jnp.moveaxis(mins, 0, 1).reshape(B, -1)[:, :N]


def chamfer_distance(pred: jnp.ndarray, target: jnp.ndarray,
                     chunk_size: int = 2048,
                     backend: str | None = None) -> jnp.ndarray:
    """Bidirectional squared-L2 Chamfer distance, one value per batch element.

    mean_n min_m |p_n - t_m|^2  +  mean_m min_n |t_m - p_n|^2
    (reference training loss: models/losses.py:8-63). Dispatches the row-min
    pass to the Pallas kernel on TPU.
    """
    d_pt = min_sq_dist(pred, target, chunk_size, backend)
    d_tp = min_sq_dist(target, pred, chunk_size, backend)
    return jnp.mean(d_pt, axis=1) + jnp.mean(d_tp, axis=1)


def chamfer_distance_l2(pred: jnp.ndarray, target: jnp.ndarray,
                        chunk_size: int = 2048,
                        backend: str | None = None) -> jnp.ndarray:
    """Evaluation-flavoured Chamfer: *unsquared* L2, averaged over both
    directions and divided by 2 (reference eval metric semantics — cdist p=2,
    evaluation/metrics.py:20-44 — which differ from the squared training loss)."""
    d_pt = jnp.sqrt(min_sq_dist(pred, target, chunk_size, backend))
    d_tp = jnp.sqrt(min_sq_dist(target, pred, chunk_size, backend))
    return (jnp.mean(d_pt, axis=1) + jnp.mean(d_tp, axis=1)) / 2.0


@partial(jax.jit, static_argnames=("k", "chunk_size"))
def knn_jnp(query: jnp.ndarray, ref: jnp.ndarray, k: int,
            chunk_size: int = 2048) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest ref points for each query point (squared distances).

    Args:
        query: [B, N, 3]; ref: [B, M, 3]
    Returns:
        (sq_dists [B, N, k], indices [B, N, k]) sorted ascending by distance.
    """
    query = query.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    B, N, _ = query.shape
    ref_sq = jnp.sum(ref**2, axis=-1)

    qp, _ = _pad_to_multiple(query, 1, chunk_size)
    n_chunks = qp.shape[1] // chunk_size
    qc = jnp.moveaxis(qp.reshape(B, n_chunks, chunk_size, 3), 1, 0)

    def body(_, q):
        d = -2.0 * jnp.einsum("bnc,bmc->bnm", q, ref,
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)
        d = d + jnp.sum(q**2, axis=-1)[..., None] + ref_sq[:, None, :]
        d = jnp.maximum(d, 0.0)
        neg_top, idx = jax.lax.top_k(-d, k)
        return None, (-neg_top, idx)

    _, (dists, idxs) = jax.lax.scan(body, None, qc)
    dists = jnp.moveaxis(dists, 0, 1).reshape(B, -1, k)[:, :N]
    idxs = jnp.moveaxis(idxs, 0, 1).reshape(B, -1, k)[:, :N]
    return dists, idxs


def min_sq_dist(query: jnp.ndarray, ref: jnp.ndarray,
                chunk_size: int = 2048, backend: str | None = None
                ) -> jnp.ndarray:
    """Per-query min squared distance; dispatches to the Pallas TPU kernel
    (ops/pallas/distance_topk.py) on TPU, chunked-jnp elsewhere."""
    if backend is None:
        backend = "pallas" if use_pallas_default() else "jnp"
    if backend == "pallas":
        from .pallas.distance_topk import pallas_min_sq_dist
        return pallas_min_sq_dist(query, ref)
    return min_sq_dist_jnp(query, ref, chunk_size)


def knn(query: jnp.ndarray, ref: jnp.ndarray, k: int,
        chunk_size: int = 2048, backend: str | None = None
        ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest refs per query; Pallas TPU kernel on TPU, chunked jnp +
    top_k elsewhere. Both return ascending (sq_dists, indices)."""
    if backend is None:
        backend = "pallas" if use_pallas_default() else "jnp"
    if backend == "pallas":
        from .pallas.distance_topk import pallas_knn
        return pallas_knn(query, ref, k)
    if backend == "pallas_pruned":
        from .pallas.pruned_knn import pallas_knn_pruned
        return pallas_knn_pruned(query, ref, k)
    if backend == "pallas_f32packed":
        from .pallas.distance_topk import pallas_knn_f32packed
        return pallas_knn_f32packed(query, ref, k)
    if backend == "grid":
        from .grid_knn import grid_knn
        return grid_knn(query, ref, k)
    return knn_jnp(query, ref, k, chunk_size)
