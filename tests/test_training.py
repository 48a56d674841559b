import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_style_transfer_tpu.config import Config
from pointcloud_style_transfer_tpu.data import PointCloudPreprocessor
from pointcloud_style_transfer_tpu.training import (DiffusionTrainer,
                                                    ema_init, ema_update,
                                                    lr_scale_for_epoch)
from pointcloud_style_transfer_tpu.utils.checkpoint import (
    CheckpointManager, load_checkpoint_config)


def test_ema_update():
    p = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    e = ema_init(p)
    p2 = {"a": jnp.full(3, 2.0), "b": {"c": jnp.ones(2)}}
    e2 = ema_update(e, p2, decay=0.9)
    np.testing.assert_allclose(np.asarray(e2["a"]), 0.9 * 1 + 0.1 * 2)
    np.testing.assert_allclose(np.asarray(e2["b"]["c"]), 0.1)


def test_lr_schedule_reference_quirks():
    # epoch 0 runs at full LR (no step() yet); warmup then ramps 1/W..1
    assert lr_scale_for_epoch(0, 20, 200) == 1.0
    assert lr_scale_for_epoch(1, 20, 200) == pytest.approx(1 / 20)
    assert lr_scale_for_epoch(20, 20, 200) == pytest.approx(1.0)
    # cosine decay after warmup, ending at min_lr_ratio
    assert lr_scale_for_epoch(200, 20, 200) == pytest.approx(0.01)
    mid = lr_scale_for_epoch(110, 20, 200)
    assert 0.01 < mid < 1.0
    want = 0.01 + 0.5 * 0.99 * (1 + math.cos(math.pi * 0.5))
    assert mid == pytest.approx(want)


def test_checkpoint_roundtrip(tmp_path):
    cfg = Config(checkpoint_dir=str(tmp_path), experiment_name="exp")
    mgr = CheckpointManager(str(tmp_path), "exp")
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "opt_state": {"m": jnp.zeros(3)}}
    mgr.save(state, epoch=3, config=cfg, is_best=True, best_val_loss=0.5)
    mgr.save(state, epoch=8, config=cfg, is_best=False, best_val_loss=0.5)

    restored, meta, next_epoch = mgr.load_latest(state)
    assert next_epoch == 9
    assert meta["epoch"] == 8
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    # best copy exists and config is embedded
    cfg2 = load_checkpoint_config(mgr.best_dir)
    assert cfg2.experiment_name == "exp"


def test_checkpoint_empty_dir(tmp_path):
    mgr = CheckpointManager(str(tmp_path), "none")
    state, meta, next_epoch = mgr.load_latest({"x": jnp.zeros(1)})
    assert state is None and next_epoch == 0


def _make_toy_data(tmp_path, n_train=4, n_val=2, total=256, gpts=64):
    rng = np.random.default_rng(0)
    pre = PointCloudPreprocessor(total_points=total, global_points=gpts,
                                 seed=0)
    for split, n in (("train", n_train), ("val", n_val)):
        d = os.path.join(tmp_path, "processed", split)
        for i in range(n):
            sim = rng.uniform(-3, 3, size=(total, 3)).astype(np.float32)
            real = rng.uniform(-3, 3, size=(total, 3)).astype(np.float32)
            pre.save_hierarchical_data(sim, real, d, f"{split}_{i:04d}")
    return os.path.join(tmp_path, "processed")


@pytest.mark.slow
def test_tiny_end_to_end_training(tmp_path):
    """2-epoch toy training run: loss finite + decreasing-ish, checkpoint
    written, resume works (BASELINE config #3 shape)."""
    data_dir = _make_toy_data(tmp_path)
    cfg = Config(
        experiment_name="toytest",
        processed_data_dir=data_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
        result_dir=str(tmp_path / "results"),
        total_points=256, global_points=64,
        feature_dim=32, time_embed_dim=16, num_timesteps=20,
        num_epochs=2, val_interval=1, warmup_epochs=1,
        gradient_accumulation_steps=2, use_amp=False, batch_size=2,
    )
    from pointcloud_style_transfer_tpu.data import create_dataloaders
    train_loader, val_loader = create_dataloaders(cfg)
    trainer = DiffusionTrainer(cfg, resume=False)
    p_before = np.asarray(
        jax.tree_util.tree_leaves(trainer.state["params"])[0]).copy()
    best = trainer.train(train_loader, val_loader)
    assert np.isfinite(best)
    p_after = np.asarray(
        jax.tree_util.tree_leaves(trainer.state["params"])[0])
    assert not np.allclose(p_before, p_after), "params must update"
    # checkpoint exists; resume picks it up
    trainer2 = DiffusionTrainer(cfg, resume=True)
    assert trainer2.start_epoch == 2
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(trainer2.state["params"])[0]),
        p_after, atol=1e-6)


def test_grad_accum_steps_optimizer_every_k(tmp_path):
    """Params must only change on every k-th call (MultiSteps semantics)."""
    cfg = Config(total_points=64, global_points=32, feature_dim=16,
                 time_embed_dim=8, num_timesteps=10, use_amp=False,
                 gradient_accumulation_steps=3,
                 checkpoint_dir=str(tmp_path / "c"),
                 log_dir=str(tmp_path / "l"),
                 result_dir=str(tmp_path / "r"),
                 processed_data_dir=str(tmp_path / "p"))
    trainer = DiffusionTrainer(cfg, resume=False)
    rng = np.random.default_rng(0)
    sim = jnp.asarray(rng.standard_normal((1, 64, 3)).astype(np.float32))
    real = jnp.asarray(rng.standard_normal((1, 64, 3)).astype(np.float32))
    p0 = np.asarray(jax.tree_util.tree_leaves(trainer.state["params"])[0]).copy()
    for i in range(2):
        trainer.state, _ = trainer.train_step(
            trainer.state, sim, real, jax.random.PRNGKey(i),
            jnp.float32(1e-3))
    p2 = np.asarray(jax.tree_util.tree_leaves(trainer.state["params"])[0])
    np.testing.assert_array_equal(p0, p2)  # no real step yet
    trainer.state, _ = trainer.train_step(
        trainer.state, sim, real, jax.random.PRNGKey(2), jnp.float32(1e-3))
    p3 = np.asarray(jax.tree_util.tree_leaves(trainer.state["params"])[0])
    assert not np.allclose(p0, p3)  # 3rd call applies the update


@pytest.mark.slow
def test_training_reduces_loss(tmp_path):
    """Learning sanity: on a small structured dataset, the train loss after
    ~20 epochs must be clearly below the first-epoch loss."""
    data_dir = _make_toy_data(tmp_path, n_train=6, n_val=2, total=256,
                              gpts=64)
    cfg = Config(
        experiment_name="sanity",
        processed_data_dir=data_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
        result_dir=str(tmp_path / "results"),
        total_points=256, global_points=64,
        feature_dim=32, time_embed_dim=16, num_timesteps=50,
        num_epochs=20, val_interval=50,  # no val / ckpt during this run
        warmup_epochs=2, learning_rate=3e-4,
        gradient_accumulation_steps=1, use_amp=False, batch_size=2,
    )
    from pointcloud_style_transfer_tpu.data import create_dataloaders
    train_loader, _ = create_dataloaders(cfg)
    trainer = DiffusionTrainer(cfg, resume=False)
    first = trainer.train_one_epoch(train_loader, 0)
    last = None
    for epoch in range(1, cfg.num_epochs):
        last = trainer.train_one_epoch(train_loader, epoch)
    assert last < first * 0.8, (first, last)


@pytest.mark.slow
def test_training_improves_val_loss(tmp_path):
    """End-to-end training proof in miniature (the full artifact lives in
    docs/artifacts/e2e_training, produced by examples/e2e_training_proof.py
    on TPU): EMA val loss after ~20 epochs must clearly beat the untrained
    val loss. Val uses the EMA params + eval loss, so this gates the whole
    train step + EMA + validation pipeline, not just the optimizer."""
    data_dir = _make_toy_data(tmp_path, n_train=6, n_val=2, total=256,
                              gpts=64)
    cfg = Config(
        experiment_name="valproof",
        processed_data_dir=data_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
        result_dir=str(tmp_path / "results"),
        total_points=256, global_points=64,
        feature_dim=32, time_embed_dim=16, num_timesteps=50,
        num_epochs=30, val_interval=50,
        warmup_epochs=2, learning_rate=3e-4,
        # default EMA decay (0.999, half-life ~700 steps) barely moves in a
        # ~90-step toy run; 0.9 makes the EMA val params track the training
        ema_decay=0.9,
        gradient_accumulation_steps=1, use_amp=False, batch_size=2,
    )
    from pointcloud_style_transfer_tpu.data import create_dataloaders
    train_loader, val_loader = create_dataloaders(cfg)
    trainer = DiffusionTrainer(cfg, resume=False)
    val_before = trainer.validate_one_epoch(val_loader, 0)
    for epoch in range(cfg.num_epochs):
        trainer.train_one_epoch(train_loader, epoch)
    val_after = trainer.validate_one_epoch(val_loader, cfg.num_epochs)
    assert val_after < val_before * 0.8, (val_before, val_after)


def test_augmentation_wiring(tmp_path, key):
    """use_augmentation changes the training loss path deterministically."""
    from pointcloud_style_transfer_tpu.models import (
        PointCloudDiffusionModel, make_schedule)
    from pointcloud_style_transfer_tpu.training import compute_losses

    base = dict(total_points=64, global_points=32, feature_dim=16,
                time_embed_dim=8, num_timesteps=10, use_amp=False)
    rng = np.random.default_rng(0)
    sim = jnp.asarray(rng.standard_normal((1, 64, 3)).astype(np.float32))
    real = jnp.asarray(rng.standard_normal((1, 64, 3)).astype(np.float32))

    outs = {}
    for aug in (False, True):
        cfg = Config(**base, use_augmentation=aug)
        model = PointCloudDiffusionModel(cfg)
        variables = model.init(key, example_points=64)
        loss, _, _ = compute_losses(
            model, make_schedule(cfg), variables, sim, real,
            jax.random.PRNGKey(5), train=True, cond_drop_prob=0.0,
            chamfer_weight=0.1)
        outs[aug] = float(loss)
    assert np.isfinite(outs[False]) and np.isfinite(outs[True])
    assert outs[False] != outs[True]
