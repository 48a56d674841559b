"""kNN inverse-distance upsampling (coarse -> full resolution), on device.

The reference does this on CPU with sklearn inside the sampling loop —
a device->host->device round trip per diffusion step
(reference: models/diffusion_model.py:127-153 and data/preprocessing.py:114-127).
Here the whole interpolation is a chunked on-device kNN so the sampler can run
as a single compiled `lax.scan`.

Semantics preserved exactly:
* known points (the coarse indices) receive their coarse value verbatim;
* unknown points are interpolated from their k=3 nearest *known* points,
  measured in the ORIGINAL point geometry (fit on original[known], query
  original[unknown]), weighted by 1/(euclidean_dist + 1e-8), normalised.

Implementation note: instead of dynamically partitioning known/unknown points
(dynamic shapes), we interpolate ALL N query points against the M known
references, then scatter-overwrite the known slots with their exact coarse
values. For unknown points this is identical to the reference computation; for
known points the overwrite restores exactness.

The weight computation (`knn_interpolate_weights`) is exposed separately from
the application (`apply_interpolation`) so callers that upsample several value
fields over the same geometry — e.g. the CFG sampler's cond/uncond noise pair —
pay for the N x M distance pass once.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .distance import knn
from .sampling import index_points


@partial(jax.jit, static_argnames=("k", "chunk_size", "backend"))
def knn_interpolate_weights(original_points: jnp.ndarray,
                            coarse_indices: jnp.ndarray, k: int = 3,
                            chunk_size: int = 4096, backend: str | None = None):
    """Neighbour indices + normalised inverse-distance weights for upsampling.

    Args:
        original_points: [B, N, 3] full-resolution geometry.
        coarse_indices: [B, M] indices of the known points within the original.
    Returns:
        (nbr [B, N, k] indices into the coarse set, w [B, N, k] weights).
    """
    M = coarse_indices.shape[1]
    k = min(k, M)
    ref_xyz = index_points(original_points, coarse_indices)  # [B, M, 3]
    sq_d, nbr = knn(original_points, ref_xyz, k, chunk_size, backend)
    dist = jnp.sqrt(jnp.maximum(sq_d, 0.0))
    w = 1.0 / (dist + 1e-8)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    return nbr, w


def apply_interpolation(coarse_values: jnp.ndarray, nbr: jnp.ndarray,
                        w: jnp.ndarray,
                        coarse_indices: jnp.ndarray) -> jnp.ndarray:
    """Apply precomputed kNN weights, then restore exact values at known slots."""
    N = nbr.shape[1]
    nbr_vals = index_points(coarse_values, nbr)  # [B, N, k, C]
    out = jnp.sum(nbr_vals * w[..., None], axis=2)  # [B, N, C]

    def scatter_one(res, idx, vals):
        return res.at[idx].set(vals, mode="drop")

    out = jax.vmap(scatter_one)(out, jnp.clip(coarse_indices, 0, N - 1),
                                coarse_values)
    return out.astype(coarse_values.dtype)


@partial(jax.jit, static_argnames=("k", "chunk_size", "backend"))
def knn_interpolate(coarse_values: jnp.ndarray, original_points: jnp.ndarray,
                    coarse_indices: jnp.ndarray, k: int = 3,
                    chunk_size: int = 4096,
                    backend: str | None = None) -> jnp.ndarray:
    """Scatter coarse values to their original slots and kNN-interpolate the rest.

    Args:
        coarse_values: [B, M, C] values (e.g. predicted noise) at coarse points.
        original_points: [B, N, 3] full-resolution geometry.
        coarse_indices: [B, M] indices of the coarse points within the original.
        k: neighbours for inverse-distance interpolation (reference uses 3).
    Returns:
        [B, N, C] upsampled values.
    """
    nbr, w = knn_interpolate_weights(original_points, coarse_indices, k,
                                     chunk_size, backend)
    return apply_interpolation(coarse_values, nbr, w, coarse_indices)
