from .diffusion import (DiffusionSchedule, ddim_step, ddim_timesteps,
                        geometric_constraint, make_beta_schedule,
                        make_schedule, q_sample)
from .losses import diffusion_loss
from .model import PointCloudDiffusionModel
from .networks import (DiffusionNet, NoisePredictor, PointNet2Encoder,
                       SetAbstraction, StyleEncoder, time_embedding)
from .samplers import (ddim_sample_loop, guided_sample_loop,
                       guided_sample_loop_coarse)

__all__ = [
    "DiffusionSchedule", "make_schedule", "make_beta_schedule", "q_sample",
    "geometric_constraint", "ddim_step", "ddim_timesteps", "diffusion_loss",
    "PointCloudDiffusionModel", "DiffusionNet", "NoisePredictor",
    "PointNet2Encoder", "SetAbstraction", "StyleEncoder", "time_embedding",
    "ddim_sample_loop", "guided_sample_loop", "guided_sample_loop_coarse",
]
