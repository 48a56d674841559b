"""Experiment configuration.

One flat dataclass holding every hyperparameter. Field names and default values
mirror the reference implementation's config (reference: config/config.py:7-62)
because those defaults *are* the experiment spec — checkpoints embed this config
and inference/test reconstruct the model from it.

TPU-specific additions are grouped at the bottom and default to values that
reproduce reference behaviour on one chip.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict


@dataclass
class Config:
    # -- experiment bookkeeping (reference: config/config.py:10-16) --
    experiment_name: str = "train"
    data_root: str = "datasets"
    processed_data_dir: str = os.path.join("datasets", "processed_hierarchical")
    log_dir: str = "logs"
    checkpoint_dir: str = "checkpoints"
    result_dir: str = "results"

    # -- hierarchical data (reference: config/config.py:19-20) --
    total_points: int = 120000
    global_points: int = 30000

    # -- model (reference: config/config.py:23-25) --
    time_embed_dim: int = 128
    feature_dim: int = 256
    global_feature_dim: int = 256

    # -- diffusion (reference: config/config.py:28-30) --
    num_timesteps: int = 1000
    beta_schedule: str = "cosine"
    noise_schedule_offset: float = 0.0008

    # -- training (reference: config/config.py:33-37) --
    num_epochs: int = 200
    learning_rate: float = 1e-4
    weight_decay: float = 1e-4
    ema_decay: float = 0.999
    gradient_clip: float = 1.0

    # -- classifier-free guidance (reference: config/config.py:40-41) --
    cond_drop_prob: float = 0.1
    guidance_scale: float = 7.5

    # -- LR schedule (reference: config/config.py:44-46) --
    lr_scheduler: str = "cosine_with_warmup"
    warmup_epochs: int = 20
    min_lr_ratio: float = 0.01

    # -- batching (reference: config/config.py:49-52) --
    batch_size: int = 1
    num_workers: int = 2
    use_amp: bool = True  # on TPU this selects bf16 compute (no grad scaler needed)
    gradient_accumulation_steps: int = 3

    # -- validation / saving (reference: config/config.py:55-56) --
    val_interval: int = 5
    save_interval: int = 10

    # -- losses (reference: config/config.py:59-62) --
    loss_scale_factor: float = 1.0
    use_hierarchical: bool = True
    lambda_chamfer: float = 0.1
    chamfer_loss_on_full_points: bool = False

    # -- TPU-native additions (no reference equivalent) --
    seed: int = 42
    mesh_shape: Dict[str, int] = field(default_factory=dict)  # e.g. {"data": 8}
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"  # used when use_amp is True
    # kernels: applied process-wide via ops.distance.set_pallas_enabled at
    # every entry point (trainer init, checkpoint load_for_inference)
    use_pallas: bool = True  # enable Pallas kernels on TPU (jnp fallback otherwise)
    knn_backend: str = "auto"  # auto | jnp | pallas | pallas_f32packed | pallas_pruned | grid
    target_range: float = 1.8  # geometric constraint / normalization range
    # augmentation (OFF by default: the reference defines augmentation but
    # never wires it into training — dead code, data/augmentation.py:69-76)
    use_augmentation: bool = False
    augmentation_rotation_range: float = 0.05
    augmentation_jitter_std: float = 0.005
    augmentation_scale_min: float = 0.98
    augmentation_scale_max: float = 1.02
    content_anchor: float = 0.1  # reference: models/diffusion_model.py:256

    def make_dirs(self) -> None:
        """Create output directories (reference Config.__post_init__ behaviour,
        config/config.py:64-67), but explicit rather than on construction so that
        merely instantiating a Config (e.g. in tests) has no side effects."""
        exp_ckpt = os.path.join(self.checkpoint_dir, self.experiment_name)
        for d in (self.log_dir, self.result_dir, self.processed_data_dir, exp_ckpt):
            os.makedirs(d, exist_ok=True)

    # -- serialization (checkpoints embed the config; reference stores the pickled
    #    Config object inside .pth, utils/checkpoint.py:34-47) --
    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        return cls.from_dict(json.loads(s))

    def replace(self, **kwargs) -> "Config":
        return dataclasses.replace(self, **kwargs)
