"""DiffusionTrainer: jitted train/val steps, EMA, checkpoints, early stop.

Orchestration parity with the reference trainer (training/trainer.py:36-232):
AdamW(b1=0.9, b2=0.95, wd=1e-4) with global-norm clip 1.0, gradient
accumulation (3), per-epoch warmup-cosine LR, EMA 0.999 updated on real
optimizer steps, validation under EMA weights every val_interval epochs
(L1-only val loss), best-model tracking with early-stop patience 20, periodic
qualitative sample dumps via the guided sampler, TensorBoard scalars.

TPU-first differences:
* one compiled train step (forward+loss+grad+update+EMA) — no Python in the
  hot path, no per-batch host sync (the reference's loss-dict ``.item()``
  calls sync every batch, models/losses.py:93-102);
* bf16 compute via the model dtype instead of AMP+GradScaler (no scaler needed
  on TPU, loss/grads stay fp32);
* gradient accumulation via ``optax.MultiSteps`` (averaged accumulated grads,
  clipped at the real step — same math as the reference's scaled backward);
* optional data-parallel sharding over a device mesh (see parallel/mesh.py);
  the train step is written sharding-agnostic and jit partitions it.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..models import (PointCloudDiffusionModel, guided_sample_loop,
                      make_schedule, q_sample)
from ..models.losses import diffusion_loss
from ..ops import index_points
from ..utils.checkpoint import CheckpointManager
from ..utils.logger import get_logger
from .ema import ema_init
from .lr_schedule import lr_for_epoch


def make_optimizer(config: Config) -> optax.GradientTransformation:
    """clip -> adam(0.9, 0.95) -> weight decay -> -1, wrapped in MultiSteps.
    The learning rate is applied separately inside the train step (epoch-
    granular schedule, reference training/trainer.py:20-34)."""
    inner = optax.chain(
        optax.clip_by_global_norm(config.gradient_clip),
        optax.scale_by_adam(b1=0.9, b2=0.95),
        optax.add_decayed_weights(config.weight_decay),
        optax.scale(-1.0),
    )
    k = max(1, config.gradient_accumulation_steps)
    return optax.MultiSteps(inner, every_k_schedule=k)


def compute_losses(model: PointCloudDiffusionModel, schedule, variables,
                   batch_sim: jnp.ndarray, batch_real: jnp.ndarray,
                   key: jax.Array, *, train: bool, cond_drop_prob: float,
                   chamfer_weight: float):
    """q_sample -> forward -> (L1 on gathered coarse noise + Chamfer on
    pred_x0_coarse) — reference training/trainer.py:70-113."""
    cfg = model.config
    B, N, C = batch_sim.shape
    k_t, k_noise, k_fwd, k_aug = jax.random.split(key, 4)
    if train and cfg.use_augmentation:
        # jittable augmentation (rotation/jitter/scale), applied to both
        # clouds with independent keys — fixes the reference's dead wiring
        from ..data.augmentation import augment_points
        ka, kb = jax.random.split(k_aug)
        batch_sim = augment_points(
            batch_sim, ka, rotation_range=cfg.augmentation_rotation_range,
            jitter_std=cfg.augmentation_jitter_std,
            scale_min=cfg.augmentation_scale_min,
            scale_max=cfg.augmentation_scale_max)
        batch_real = augment_points(
            batch_real, kb, rotation_range=cfg.augmentation_rotation_range,
            jitter_std=cfg.augmentation_jitter_std,
            scale_min=cfg.augmentation_scale_min,
            scale_max=cfg.augmentation_scale_max)
    t = jax.random.randint(k_t, (B,), 0, cfg.num_timesteps)
    noise = jax.random.normal(k_noise, batch_sim.shape, jnp.float32)
    noisy = q_sample(schedule, batch_sim, t, noise)

    pred, idx, updates = model.forward(
        variables, noisy, t, batch_real, key=k_fwd,
        cond_drop_prob=cond_drop_prob,
        use_hierarchical=cfg.use_hierarchical, train=train, mutable=train)

    if idx is not None:  # hierarchical path
        noise_coarse = index_points(noise, idx)
        pred_x0_coarse = None
        sim_coarse = None
        if chamfer_weight > 0:
            noisy_coarse = index_points(noisy, idx)
            sim_coarse = index_points(batch_sim, idx)
            a = schedule.sqrt_alphas_cumprod[t][:, None, None]
            b = schedule.sqrt_one_minus_alphas_cumprod[t][:, None, None]
            pred_x0_coarse = (noisy_coarse - b * pred.astype(jnp.float32)) \
                / (a + 1e-8)
        loss, loss_dict = diffusion_loss(
            pred, noise_coarse, pred_x0_coarse, sim_coarse,
            chamfer_weight=chamfer_weight)
    else:
        loss, loss_dict = diffusion_loss(pred, noise,
                                         chamfer_weight=0.0)
    return loss, loss_dict, updates


def make_train_step_fn(model: PointCloudDiffusionModel, schedule,
                       tx: optax.GradientTransformation, config: Config):
    """Build the raw (unjitted) train step: (state, sim, real, key, lr) ->
    (state, loss_dict). ``state`` = {params, batch_stats, opt_state,
    ema_params}. Pure function — jit it directly (single chip) or with
    explicit shardings (parallel/sharded.py)."""

    def train_step(state, batch_sim, batch_real, key, lr):
        def loss_fn(params):
            variables = {"params": params,
                         "batch_stats": state["batch_stats"]}
            loss, loss_dict, updates = compute_losses(
                model, schedule, variables, batch_sim, batch_real, key,
                train=True, cond_drop_prob=config.cond_drop_prob,
                chamfer_weight=config.lambda_chamfer)
            return loss, (loss_dict, updates)

        (loss, (loss_dict, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])

        opt_updates, new_opt_state = tx.update(grads, state["opt_state"],
                                               state["params"])
        opt_updates = jax.tree_util.tree_map(lambda u: u * lr, opt_updates)
        new_params = optax.apply_updates(state["params"], opt_updates)

        # EMA advances only on real optimizer steps (reference
        # trainer.py:119-125): MultiSteps wraps mini_step back to 0.
        did_step = new_opt_state.mini_step == 0
        new_ema = jax.tree_util.tree_map(
            lambda e, p: jnp.where(did_step,
                                   config.ema_decay * e
                                   + (1 - config.ema_decay) * p, e),
            state["ema_params"], new_params)

        new_state = {
            "params": new_params,
            "batch_stats": updates["batch_stats"],
            "opt_state": new_opt_state,
            "ema_params": new_ema,
        }
        return new_state, loss_dict

    return train_step


def make_train_step(model: PointCloudDiffusionModel, schedule,
                    tx: optax.GradientTransformation, config: Config):
    return jax.jit(make_train_step_fn(model, schedule, tx, config),
                   donate_argnums=(0,))


def make_eval_step_fn(model: PointCloudDiffusionModel, schedule,
                      config: Config):
    """Raw validation step under EMA weights, L1-only loss
    (reference trainer.py:140-174)."""

    def eval_step(ema_params, batch_stats, batch_sim, batch_real, key):
        variables = {"params": ema_params, "batch_stats": batch_stats}
        loss, loss_dict, _ = compute_losses(
            model, schedule, variables, batch_sim, batch_real, key,
            train=False, cond_drop_prob=0.0, chamfer_weight=0.0)
        return loss_dict

    return eval_step


def make_eval_step(model: PointCloudDiffusionModel, schedule, config: Config):
    return jax.jit(make_eval_step_fn(model, schedule, config))


class DiffusionTrainer:
    def __init__(self, config: Config, resume: bool = True):
        from ..utils.cache import enable_compilation_cache
        enable_compilation_cache()
        from ..ops.distance import set_pallas_enabled
        set_pallas_enabled(config.use_pallas)
        self.config = config
        config.make_dirs()
        self.logger = get_logger("DiffusionTrainer", config.log_dir,
                                 config.experiment_name)
        self.model = PointCloudDiffusionModel(config)
        self.schedule = make_schedule(config)
        self.tx = make_optimizer(config)

        init_key = jax.random.PRNGKey(config.seed)
        variables = self.model.init(init_key,
                                    example_points=min(config.global_points,
                                                       4096))
        params = variables["params"]
        self.state: Dict[str, Any] = {
            "params": params,
            "batch_stats": variables.get("batch_stats", {}),
            "opt_state": self.tx.init(params),
            "ema_params": ema_init(params),
        }
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree_util.tree_leaves(params))
        self.logger.info("Model parameters: %s", f"{n_params:,}")

        self.checkpoint_manager = CheckpointManager(config.checkpoint_dir,
                                                    config.experiment_name)
        self.best_val_loss = float("inf")
        self.start_epoch = 0
        self.patience_counter = 0
        self.max_patience = 20
        if resume:
            restored, meta, next_epoch = \
                self.checkpoint_manager.load_latest(self.state)
            if restored is not None:
                self.state = restored
                self.start_epoch = next_epoch
                self.best_val_loss = meta.get("best_val_loss", float("inf"))
                self.logger.info("Resumed from epoch %d", next_epoch)

        # multi-chip: config.mesh_shape (e.g. {"data": 8}) turns on sharded
        # steps — params replicated, batch sharded, gradients psum'd by GSPMD
        self.mesh = None
        if config.mesh_shape:
            from ..parallel import (make_mesh, make_sharded_eval_step,
                                    make_sharded_train_step, replicate)
            self.mesh = make_mesh(dict(config.mesh_shape))
            self.state = replicate(self.state, self.mesh)
            self.train_step = make_sharded_train_step(
                self.model, self.schedule, self.tx, config, self.mesh)
            self.eval_step = make_sharded_eval_step(
                self.model, self.schedule, config, self.mesh)
            self.logger.info("Sharded training over mesh %s",
                             dict(self.mesh.shape))
        else:
            self.train_step = make_train_step(self.model, self.schedule,
                                              self.tx, config)
            self.eval_step = make_eval_step(self.model, self.schedule, config)
        self._writer = None
        self._key = jax.random.PRNGKey(config.seed + 1)

    # -- helpers -------------------------------------------------------------
    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _device_put(self, x):
        x = jnp.asarray(x)
        if self.mesh is not None:
            from ..parallel import shard_batch
            from ..parallel.mesh import DATA_AXIS
            d = self.mesh.shape.get(DATA_AXIS, 1)
            pad = (-x.shape[0]) % d
            if pad:  # ragged final batch: repeat the last sample (slightly
                # overweights it in the val mean — logged, not silent)
                self.logger.debug("padding ragged batch %d -> %d",
                                  x.shape[0], x.shape[0] + pad)
                x = jnp.concatenate([x] + [x[-1:]] * pad, axis=0)
            return shard_batch(x, self.mesh)
        return x

    @property
    def writer(self):
        if self._writer is None:
            # dependency-free event-file writer (utils/tensorboard.py): the
            # reference guarantees TB scalars (training/trainer.py:52) and a
            # torch-free TPU VM must not silently lose them
            from ..utils.tensorboard import SummaryWriter
            self._writer = SummaryWriter(log_dir=os.path.join(
                self.config.log_dir, self.config.experiment_name))
        return self._writer

    def _tb_scalar(self, tag, value, step):
        if self.writer:
            self.writer.add_scalar(tag, value, step)

    # -- epoch loops ---------------------------------------------------------
    def train_one_epoch(self, loader, epoch: int) -> float:
        lr = lr_for_epoch(epoch, self.config.learning_rate,
                          self.config.warmup_epochs, self.config.num_epochs,
                          self.config.min_lr_ratio)
        if hasattr(loader, "set_epoch"):
            loader.set_epoch(epoch)
        totals, count = None, 0
        t0 = time.time()
        for batch in loader:
            sim = self._device_put(batch["sim_full"])
            real = self._device_put(batch["real_full"])
            self.state, loss_dict = self.train_step(
                self.state, sim, real, self._next_key(),
                jnp.float32(lr))
            # accumulate ON DEVICE (async dispatch): a float() here would
            # host-sync every batch and serialize against the ~28 ms relay
            # latency (docs/PERF_NOTES.md). All terms are accumulated, not
            # just the total — the per-term decomposition is what makes the
            # Chamfer-at-large-t spikes interpretable (see
            # docs/artifacts/e2e_training).
            totals = (dict(loss_dict) if totals is None else
                      {k: totals[k] + v for k, v in loss_dict.items()})
            count += 1
        terms = {k: float(v) / max(count, 1)
                 for k, v in (totals or {}).items()}  # one host sync per term
        self.last_train_terms = terms
        avg = terms.get("total_loss", 0.0)
        self.logger.info(
            "Epoch %d: train loss %.6f (L1 %.4f, CD %.4f) lr %.2e [%.1fs]",
            epoch, avg, terms.get("noise_loss", 0.0),
            terms.get("chamfer_loss", 0.0), lr, time.time() - t0)
        self._tb_scalar("Loss/Train", avg, epoch)
        self._tb_scalar("Loss/Train_L1", terms.get("noise_loss", 0.0), epoch)
        self._tb_scalar("Loss/Train_Chamfer",
                        terms.get("chamfer_loss", 0.0), epoch)
        return avg

    def validate_one_epoch(self, loader, epoch: int) -> float:
        total, count = 0.0, 0
        for batch in loader:
            sim = self._device_put(batch["sim_full"])
            real = self._device_put(batch["real_full"])
            loss_dict = self.eval_step(self.state["ema_params"],
                                       self.state["batch_stats"], sim, real,
                                       self._next_key())
            val = float(loss_dict["total_loss"])
            if np.isfinite(val):
                total += val
                count += 1
        avg = total / max(count, 1)
        self.logger.info("Epoch %d: val loss %.6f", epoch, avg)
        self._tb_scalar("Loss/Validation", avg, epoch)
        return avg

    def save_sample_results(self, loader, epoch: int, num_samples: int = 2):
        """Dump (original, reference, transferred) npy triplets using the EMA
        weights (reference trainer.py:176-196)."""
        batch = next(iter(loader))
        sim = jnp.asarray(batch["sim_full"][:num_samples])
        real = jnp.asarray(batch["real_full"][:num_samples])
        variables = {"params": self.state["ema_params"],
                     "batch_stats": self.state["batch_stats"]}
        out = guided_sample_loop(
            self.model, self.schedule, variables, sim, real,
            self._next_key(), num_inference_steps=50,
            guidance_scale=self.config.guidance_scale)
        save_dir = os.path.join(self.config.result_dir,
                                self.config.experiment_name,
                                f"epoch_{epoch:04d}")
        os.makedirs(save_dir, exist_ok=True)
        for i in range(min(num_samples, sim.shape[0])):
            np.save(os.path.join(save_dir, f"original_sim_{i}.npy"),
                    np.asarray(sim[i]))
            np.save(os.path.join(save_dir, f"reference_real_{i}.npy"),
                    np.asarray(real[i]))
            np.save(os.path.join(save_dir, f"transferred_{i}.npy"),
                    np.asarray(out[i]))
        self.logger.info("Sample results saved to %s", save_dir)

    def train(self, train_loader, val_loader) -> float:
        cfg = self.config
        for epoch in range(self.start_epoch, cfg.num_epochs):
            self.train_one_epoch(train_loader, epoch)

            if epoch % cfg.val_interval == 0:
                val_loss = self.validate_one_epoch(val_loader, epoch)
                is_best = val_loss < self.best_val_loss
                if is_best:
                    self.best_val_loss = val_loss
                    self.patience_counter = 0
                    self.logger.info("New best model (val %.6f)", val_loss)
                else:
                    self.patience_counter += 1

                self.checkpoint_manager.save(
                    self.state, epoch, cfg, is_best=is_best,
                    best_val_loss=self.best_val_loss)

                if self.patience_counter >= self.max_patience:
                    self.logger.info("Early stop: no improvement for %d "
                                     "validations", self.patience_counter)
                    break

                if epoch > 0 and epoch % (cfg.save_interval * 2) == 0:
                    self.save_sample_results(val_loader, epoch)

        self.logger.info("Training done. Best val loss: %.6f",
                         self.best_val_loss)
        if self.writer:
            self.writer.close()
        return self.best_val_loss
