"""Training losses: L1 noise loss + chunked Chamfer regulariser.

total = noise_weight * L1(pred_noise, noise)
      + chamfer_weight * mean_B Chamfer(pred_x0_coarse, x0_coarse)

(reference: models/losses.py:66-103; weights wired at training/trainer.py:44
with noise_weight=1.0 and chamfer_weight=config.lambda_chamfer=0.1).

Returns the loss dict as jnp scalars (no host sync inside the train step —
the reference's ``.item()`` calls force a device sync every batch,
models/losses.py:93-102).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from ..ops import chamfer_distance


def diffusion_loss(
    predicted_noise: jnp.ndarray,
    actual_noise: jnp.ndarray,
    predicted_points_coarse: Optional[jnp.ndarray] = None,
    target_points_coarse: Optional[jnp.ndarray] = None,
    noise_weight: float = 1.0,
    chamfer_weight: float = 0.1,
    chamfer_chunk: int = 2048,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    noise_loss = jnp.mean(jnp.abs(predicted_noise.astype(jnp.float32)
                                  - actual_noise.astype(jnp.float32)))
    total = noise_weight * noise_loss
    loss_dict = {"noise_loss": noise_loss}

    if (chamfer_weight > 0 and predicted_points_coarse is not None
            and target_points_coarse is not None):
        cd = jnp.mean(chamfer_distance(predicted_points_coarse,
                                       target_points_coarse,
                                       chunk_size=chamfer_chunk))
        total = total + chamfer_weight * cd
        loss_dict["chamfer_loss"] = cd

    loss_dict["total_loss"] = total
    return total, loss_dict
