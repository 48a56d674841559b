"""Point-cloud augmentation as jittable pure functions of a PRNG key.

Reference semantics (data/augmentation.py:5-66): random Z-rotation within
+-rotation_range radians, gaussian jitter, uniform isotropic scale, optional
point-order shuffle. The reference defines these but never wires them into the
training path (dead code, see SURVEY C20); here they are available and the
trainer enables them via ``Config.use_augmentation``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("rotation_range", "jitter_std",
                                   "scale_min", "scale_max", "shuffle"))
def augment_points(points: jnp.ndarray, key: jax.Array,
                   rotation_range: float = 0.05, jitter_std: float = 0.005,
                   scale_min: float = 0.98, scale_max: float = 1.02,
                   shuffle: bool = False) -> jnp.ndarray:
    """Apply rotation -> jitter -> scale (-> shuffle) to [B, N, 3]."""
    B, N, _ = points.shape
    k_rot, k_jit, k_scale, k_shuf = jax.random.split(key, 4)
    x = points

    if rotation_range > 0:
        ang = jax.random.uniform(k_rot, (B,),
                                 minval=-rotation_range,
                                 maxval=rotation_range)
        c, s = jnp.cos(ang), jnp.sin(ang)
        zeros = jnp.zeros_like(c)
        ones = jnp.ones_like(c)
        # rows of R stacked: matches torch.bmm(points, R) with
        # R = [[c, -s, 0], [s, c, 0], [0, 0, 1]] (reference :22-29)
        R = jnp.stack([
            jnp.stack([c, -s, zeros], -1),
            jnp.stack([s, c, zeros], -1),
            jnp.stack([zeros, zeros, ones], -1)], -2)  # [B, 3, 3]
        x = jnp.einsum("bnc,bcd->bnd", x, R)

    if jitter_std > 0:
        x = x + jax.random.normal(k_jit, x.shape) * jitter_std

    if not (scale_min == 1.0 and scale_max == 1.0):
        scale = jax.random.uniform(k_scale, (B, 1, 1), minval=scale_min,
                                   maxval=scale_max)
        x = x * scale

    if shuffle:
        perm = jax.vmap(lambda k: jax.random.permutation(k, N))(
            jax.random.split(k_shuf, B))
        x = jnp.take_along_axis(x, perm[..., None], axis=1)

    return x
