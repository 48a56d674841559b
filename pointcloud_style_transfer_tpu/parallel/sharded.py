"""Sharded (multi-chip) train/eval/sampling step factories.

Data-parallel DDPM training over a `data` mesh axis with optional point-axis
sharding — BASELINE config #4 ("data-parallel DDPM training on a TPU mesh").
The steps are the SAME pure functions as the single-chip ones
(training/trainer.py); only the jit shardings differ. GSPMD inserts the
gradient psum (params replicated + batch sharded) and any point-axis
collectives automatically.
"""

from __future__ import annotations

import jax
import optax
from jax.sharding import Mesh

from ..config import Config
from ..models import PointCloudDiffusionModel
from ..training.trainer import make_eval_step_fn, make_train_step_fn
from .mesh import batch_sharding, replicated


def make_sharded_train_step(model: PointCloudDiffusionModel, schedule,
                            tx: optax.GradientTransformation, config: Config,
                            mesh: Mesh, shard_points: bool = False):
    """Jit the train step with explicit shardings: state replicated, batch
    sharded over `data` (and optionally `points`)."""

    raw = make_train_step_fn(model, schedule, tx, config)
    rep = replicated(mesh)
    bsh = batch_sharding(mesh, shard_points)
    return jax.jit(
        raw,
        in_shardings=(rep, bsh, bsh, rep, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_sharded_eval_step(model: PointCloudDiffusionModel, schedule,
                           config: Config, mesh: Mesh,
                           shard_points: bool = False):
    raw = make_eval_step_fn(model, schedule, config)
    rep = replicated(mesh)
    bsh = batch_sharding(mesh, shard_points)
    return jax.jit(
        raw,
        in_shardings=(rep, rep, bsh, bsh, rep),
        out_shardings=rep,
    )
