"""PointCloudDiffusionModel: the Flax network composed with hierarchical ops.

Reproduces the reference forward semantics (models/diffusion_model.py:165-190):

1. if hierarchical and cond has more than `global_points` points, voxel
   downsample the condition cloud before the style encoder;
2. classifier-free-guidance condition drop: zero whole style rows with
   probability `cond_drop_prob` (models/diffusion_model.py:176-178);
3. if hierarchical and the noisy cloud is larger than `global_points`,
   voxel-downsample it, predict coarse noise and return (pred, indices);
   otherwise predict at full resolution and return (pred, None).

This wrapper is a plain Python object (not an nn.Module): the learned parts
live in DiffusionNet, the voxel/kNN processing is stateless ops, and the
forward below is a pure jittable function of (variables, inputs, rng).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..ops import voxel_downsample
from .networks import DiffusionNet


def _dtype_of(config: Config):
    return jnp.bfloat16 if (config.use_amp
                            and config.compute_dtype == "bfloat16") else jnp.float32


class PointCloudDiffusionModel:
    """Bundles config, the DiffusionNet module, and hierarchical processing."""

    def __init__(self, config: Config):
        self.config = config
        self.net = DiffusionNet(feature_dim=config.feature_dim,
                                time_embed_dim=config.time_embed_dim,
                                dtype=_dtype_of(config))

    # -- init ---------------------------------------------------------------
    def init(self, key: jax.Array, example_points: int = 1024) -> Dict[str, Any]:
        """Initialise variables ({'params', 'batch_stats'})."""
        kp, ks, kd = jax.random.split(key, 3)
        dummy_pts = jnp.zeros((1, example_points, 3), jnp.float32)
        dummy_t = jnp.zeros((1,), jnp.int32)
        return self.net.init(
            {"params": kp, "sampling": ks, "dropout": kd},
            dummy_pts, dummy_t, dummy_pts, False)

    # -- submodule applies --------------------------------------------------
    def encode_style(self, variables, cond_points, *, key, train=False,
                     mutable=False):
        """Style features [B, feature_dim]; returns (style, updates|None)."""
        ks, kd = jax.random.split(key)
        rngs = {"sampling": ks, "dropout": kd}
        out = self.net.apply(
            variables, cond_points, train, rngs=rngs,
            method=DiffusionNet.encode_style,
            mutable=["batch_stats"] if mutable else False)
        if mutable:
            return out  # (style, updates)
        return out, None

    def predict_noise(self, variables, noisy_points, t, style_feat, *,
                      key=None, train=False):
        rngs = {"dropout": key} if key is not None else None
        return self.net.apply(variables, noisy_points, t, style_feat, train,
                              rngs=rngs, method=DiffusionNet.predict_noise)

    # -- full forward (reference semantics) ---------------------------------
    def forward(self, variables, noisy_points: jnp.ndarray, t: jnp.ndarray,
                condition_points: jnp.ndarray, *, key: jax.Array,
                cond_drop_prob: float = 0.0, use_hierarchical: bool = True,
                train: bool = False, mutable: bool = False
                ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[Dict]]:
        """Returns (predicted_noise, coarse_indices | None, batch_stats updates
        | None). Shapes are static, so the hierarchical branches resolve at
        trace time."""
        cfg = self.config
        k_vox_c, k_style, k_drop, k_vox_x, k_pred = jax.random.split(key, 5)

        cond = condition_points
        if use_hierarchical and cond.shape[1] > cfg.global_points:
            cond, _ = voxel_downsample(cond, cfg.global_points, k_vox_c)
        style, updates = self.encode_style(
            variables, cond, key=k_style, train=train, mutable=mutable)

        if cond_drop_prob > 0:
            keep = (jax.random.uniform(k_drop, (style.shape[0], 1))
                    > cond_drop_prob)
            style = style * keep.astype(style.dtype)

        if use_hierarchical and noisy_points.shape[1] > cfg.global_points:
            noisy_ds, idx = voxel_downsample(noisy_points, cfg.global_points,
                                             k_vox_x)
            pred = self.predict_noise(variables, noisy_ds, t, style,
                                      key=k_pred, train=train)
            return pred, idx, updates
        pred = self.predict_noise(variables, noisy_points, t, style,
                                  key=k_pred, train=train)
        return pred, None, updates

    @property
    def param_count(self):
        return None  # computed from variables by callers
