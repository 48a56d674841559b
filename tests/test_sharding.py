"""Multi-device tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_style_transfer_tpu.config import Config
from pointcloud_style_transfer_tpu.models import (PointCloudDiffusionModel,
                                                  make_schedule)
from pointcloud_style_transfer_tpu.parallel import (make_mesh, replicate,
                                                    make_sharded_train_step,
                                                    shard_batch)
from pointcloud_style_transfer_tpu.training import ema_init, make_optimizer


def small_config(**kw):
    base = dict(total_points=256, global_points=64, feature_dim=16,
                time_embed_dim=8, num_timesteps=10, use_amp=False,
                gradient_accumulation_steps=1)
    base.update(kw)
    return Config(**base)


def make_state(model, tx, key):
    variables = model.init(key, example_points=64)
    params = variables["params"]
    return {"params": params, "batch_stats": variables["batch_stats"],
            "opt_state": tx.init(params), "ema_params": ema_init(params)}


def test_mesh_construction():
    assert jax.device_count() == 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh()
    assert mesh.shape == {"data": 8}
    mesh2 = make_mesh({"data": 4, "points": 2})
    assert mesh2.shape == {"data": 4, "points": 2}
    with pytest.raises(ValueError):
        make_mesh({"data": 16})


def test_data_parallel_grads_match_single_device(key):
    """Loss and gradients from the sharded step over 4 devices must match the
    single-device computation (GSPMD psum == serial batch). Gradients (not
    post-Adam params) are compared: Adam normalises near-zero grads to +-lr,
    so reduction-order noise would flip signs there."""
    from pointcloud_style_transfer_tpu.training import compute_losses

    cfg = small_config()
    model = PointCloudDiffusionModel(cfg)
    schedule = make_schedule(cfg)
    tx = make_optimizer(cfg)
    state = make_state(model, tx, key)

    rng = np.random.default_rng(0)
    sim = rng.standard_normal((4, 256, 3)).astype(np.float32)
    real = rng.standard_normal((4, 256, 3)).astype(np.float32)
    k = jax.random.PRNGKey(5)

    def loss_and_grad(params, batch_stats, s, r, kk):
        def loss_fn(p):
            loss, _, _ = compute_losses(
                model, schedule, {"params": p, "batch_stats": batch_stats},
                s, r, kk, train=False, cond_drop_prob=0.0,
                chamfer_weight=cfg.lambda_chamfer)
            return loss
        return jax.value_and_grad(loss_fn)(params)

    l1, g1 = jax.jit(loss_and_grad)(
        state["params"], state["batch_stats"], jnp.asarray(sim),
        jnp.asarray(real), k)

    from pointcloud_style_transfer_tpu.parallel import (batch_sharding,
                                                        replicated)
    mesh = make_mesh({"data": 4})
    sharded_fn = jax.jit(
        loss_and_grad,
        in_shardings=(replicated(mesh), replicated(mesh),
                      batch_sharding(mesh), batch_sharding(mesh),
                      replicated(mesh)),
        out_shardings=replicated(mesh))
    l2, g2 = sharded_fn(
        replicate(state["params"], mesh),
        replicate(state["batch_stats"], mesh),
        shard_batch(jnp.asarray(sim), mesh),
        shard_batch(jnp.asarray(real), mesh), k)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-3)


def test_point_sharded_step_runs(key):
    """2D mesh (data x points): full train step compiles and executes with the
    point axis sharded."""
    cfg = small_config()
    model = PointCloudDiffusionModel(cfg)
    schedule = make_schedule(cfg)
    tx = make_optimizer(cfg)
    state = make_state(model, tx, key)

    mesh = make_mesh({"data": 2, "points": 4})
    step = make_sharded_train_step(model, schedule, tx, cfg, mesh,
                                   shard_points=True)
    rng = np.random.default_rng(0)
    sim = shard_batch(jnp.asarray(
        rng.standard_normal((2, 256, 3)).astype(np.float32)), mesh,
        shard_points=True)
    real = shard_batch(jnp.asarray(
        rng.standard_normal((2, 256, 3)).astype(np.float32)), mesh,
        shard_points=True)
    st = replicate(state, mesh)
    new_state, loss_dict = step(st, sim, real, jax.random.PRNGKey(1),
                                jnp.float32(1e-3))
    assert np.isfinite(float(loss_dict["total_loss"]))
    leaves = jax.tree_util.tree_leaves(new_state["params"])
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_ring_chamfer_matches_single_device(key):
    """Ring ppermute Chamfer over a 4-way point-sharded mesh must equal the
    single-device chunked Chamfer."""
    from pointcloud_style_transfer_tpu.ops import chamfer_distance
    from pointcloud_style_transfer_tpu.parallel import ring_chamfer_distance
    from pointcloud_style_transfer_tpu.parallel.mesh import POINTS_AXIS

    rng = np.random.default_rng(3)
    a = rng.standard_normal((2, 256, 3)).astype(np.float32)
    b = rng.standard_normal((2, 512, 3)).astype(np.float32)
    mesh = make_mesh({POINTS_AXIS: 4})
    got = ring_chamfer_distance(jnp.asarray(a), jnp.asarray(b), mesh)
    want = chamfer_distance(jnp.asarray(a), jnp.asarray(b), backend="jnp")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_ring_min_dist_sharded_inputs(key):
    """Works with inputs actually device_put onto the sharded layout."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from pointcloud_style_transfer_tpu.ops import min_sq_dist
    from pointcloud_style_transfer_tpu.parallel import ring_min_sq_dist
    from pointcloud_style_transfer_tpu.parallel.mesh import POINTS_AXIS

    rng = np.random.default_rng(4)
    a = rng.standard_normal((1, 512, 3)).astype(np.float32)
    b = rng.standard_normal((1, 256, 3)).astype(np.float32)
    mesh = make_mesh({POINTS_AXIS: 8})
    sh = NamedSharding(mesh, P(None, POINTS_AXIS, None))
    aj = jax.device_put(jnp.asarray(a), sh)
    bj = jax.device_put(jnp.asarray(b), sh)
    got = ring_min_sq_dist(aj, bj, mesh)
    want = min_sq_dist(jnp.asarray(a), jnp.asarray(b), backend="jnp")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_ring_knn_matches_single_device(key):
    """Ring top-k across rotating ref shards == single-device kNN."""
    from pointcloud_style_transfer_tpu.ops import knn
    from pointcloud_style_transfer_tpu.parallel.ring import ring_knn
    from pointcloud_style_transfer_tpu.parallel.mesh import POINTS_AXIS

    rng = np.random.default_rng(7)
    q = (rng.standard_normal((1, 256, 3)) * 5).astype(np.float32)
    r = (rng.standard_normal((1, 512, 3)) * 5).astype(np.float32)
    mesh = make_mesh({POINTS_AXIS: 4})
    d_ring, i_ring = ring_knn(jnp.asarray(q), jnp.asarray(r), 3, mesh)
    d_one, i_one = knn(jnp.asarray(q), jnp.asarray(r), 3, backend="jnp")
    np.testing.assert_allclose(np.asarray(d_ring), np.asarray(d_one),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(i_ring), np.asarray(i_one))


def test_sharded_sampler_matches_single_device(key):
    """Point-sharded parity-mode sampler == single-device sampler (same
    keys), on the 8-way virtual mesh."""
    from pointcloud_style_transfer_tpu.models import guided_sample_loop
    from pointcloud_style_transfer_tpu.parallel.sharded_sampler import \
        guided_sample_loop_sharded

    cfg = small_config()  # total 256, global 64 -> hierarchical path
    model = PointCloudDiffusionModel(cfg)
    schedule = make_schedule(cfg)
    variables = model.init(key, example_points=64)

    src = jax.random.normal(jax.random.PRNGKey(1), (1, 256, 3))
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 256, 3))
    k = jax.random.PRNGKey(3)

    want = guided_sample_loop(model, schedule, variables, src, cond, k,
                              num_inference_steps=3, guidance_scale=7.5)
    mesh = make_mesh({"points": 8})
    got = guided_sample_loop_sharded(model, schedule, variables, src, cond,
                                     k, mesh, num_inference_steps=3,
                                     guidance_scale=7.5)
    got, want = np.asarray(got), np.asarray(want)
    # identical math modulo reduction order; rare near-tie kNN flips can
    # shift single points slightly after several DDIM steps (measured: ~2.5%
    # of coords differ >1e-5 with max ~1.3e-3 from genuinely-tied neighbours)
    np.testing.assert_allclose(got, want, atol=5e-3)
    assert (np.abs(got - want) < 1e-4).mean() > 0.99

    # negative control: the SAME assertions must catch a wrong-shard bug.
    # The module-level _TEST_SHARD_OFFSET hook (monkeypatched here; not a
    # function parameter a production caller could pass) makes every device
    # read its neighbour's query slice (the classic off-by-one-shard
    # indexing bug); measured effect is max|d| > 2 across >90% of coords —
    # far outside both bounds above.
    import pointcloud_style_transfer_tpu.parallel.sharded_sampler as _ss
    old = _ss._TEST_SHARD_OFFSET
    try:
        _ss._TEST_SHARD_OFFSET = 1
        bug = guided_sample_loop_sharded(model, schedule, variables, src,
                                         cond, k, mesh,
                                         num_inference_steps=3,
                                         guidance_scale=7.5)
    finally:
        _ss._TEST_SHARD_OFFSET = old
    bug = np.asarray(bug)
    assert not ((np.abs(bug - want) <= 5e-3).all()
                and (np.abs(bug - want) < 1e-4).mean() > 0.99), \
        "equivalence assertions failed to detect an off-by-one-shard bug"


def test_sharded_sampler_grid_backend(key, monkeypatch):
    """The PRODUCTION multi-chip config — the fused grid kNN+interp backend
    inside shard_map — must match the jnp-backend sharded sampler on the
    virtual mesh (interpret mode; the real-hardware composition proof lives
    in examples/verify_grid_tpu.py). Grid parameters are shrunk so the tiny
    test refs (64) actually route through the grid path, not the
    too-sparse brute escape hatch."""
    import functools
    import importlib

    from pointcloud_style_transfer_tpu.parallel.sharded_sampler import \
        guided_sample_loop_sharded

    G = importlib.import_module("pointcloud_style_transfer_tpu.ops.grid_knn")
    monkeypatch.setattr(G, "grid_knn_interpolate", functools.partial(
        G.grid_knn_interpolate, interpret=True, grid_shape=(2, 2, 2), tq=32,
        slot_cap=128, fallback_cap=64))

    cfg = small_config()  # total 256, global 64 -> hierarchical path
    model = PointCloudDiffusionModel(cfg)
    schedule = make_schedule(cfg)
    variables = model.init(key, example_points=64)

    src = jax.random.normal(jax.random.PRNGKey(1), (1, 256, 3))
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 256, 3))
    k = jax.random.PRNGKey(3)
    mesh = make_mesh({"points": 8})

    want = guided_sample_loop_sharded(model, schedule, variables, src, cond,
                                      k, mesh, num_inference_steps=3,
                                      guidance_scale=7.5, knn_backend="jnp")
    got = guided_sample_loop_sharded(model, schedule, variables, src, cond,
                                     k, mesh, num_inference_steps=3,
                                     guidance_scale=7.5, knn_backend="grid")
    got, want = np.asarray(got), np.asarray(want)
    np.testing.assert_allclose(got, want, atol=5e-3)
    assert (np.abs(got - want) < 1e-4).mean() > 0.99


def test_trainer_with_mesh_config(tmp_path):
    """DiffusionTrainer trains data-parallel when config.mesh_shape is set."""
    from pointcloud_style_transfer_tpu.data import (PointCloudPreprocessor,
                                                    create_dataloaders)
    from pointcloud_style_transfer_tpu.training import DiffusionTrainer

    rng = np.random.default_rng(0)
    pre = PointCloudPreprocessor(total_points=128, global_points=32, seed=0)
    for split, n in (("train", 4), ("val", 2)):
        for i in range(n):
            pts = rng.uniform(-3, 3, (128, 3)).astype(np.float32)
            pre.save_hierarchical_data(
                pts, pts, str(tmp_path / "p" / split), f"{split}_{i:04d}")

    cfg = Config(experiment_name="meshtrain",
                 processed_data_dir=str(tmp_path / "p"),
                 checkpoint_dir=str(tmp_path / "c"),
                 log_dir=str(tmp_path / "l"),
                 result_dir=str(tmp_path / "r"),
                 total_points=128, global_points=32, feature_dim=16,
                 time_embed_dim=8, num_timesteps=10, num_epochs=1,
                 val_interval=1, warmup_epochs=1, use_amp=False,
                 gradient_accumulation_steps=1, batch_size=4,
                 mesh_shape={"data": 4})
    train_loader, val_loader = create_dataloaders(cfg)
    trainer = DiffusionTrainer(cfg, resume=False)
    assert trainer.mesh is not None
    best = trainer.train(train_loader, val_loader)
    assert np.isfinite(best)


def test_sharded_eval_step_runs(key):
    from pointcloud_style_transfer_tpu.parallel import make_sharded_eval_step

    cfg = small_config()
    model = PointCloudDiffusionModel(cfg)
    schedule = make_schedule(cfg)
    tx = make_optimizer(cfg)
    state = make_state(model, tx, key)
    mesh = make_mesh({"data": 4})
    step = make_sharded_eval_step(model, schedule, cfg, mesh)
    rng = np.random.default_rng(0)
    sim = shard_batch(jnp.asarray(
        rng.standard_normal((4, 256, 3)).astype(np.float32)), mesh)
    real = shard_batch(jnp.asarray(
        rng.standard_normal((4, 256, 3)).astype(np.float32)), mesh)
    ld = step(replicate(state["ema_params"], mesh),
              replicate(state["batch_stats"], mesh), sim, real,
              jax.random.PRNGKey(1))
    assert np.isfinite(float(ld["total_loss"]))


def test_sharded_sampler_direct_path(key):
    """Small clouds (<= global_points) take the direct path in the sharded
    sampler too."""
    from pointcloud_style_transfer_tpu.parallel.sharded_sampler import \
        guided_sample_loop_sharded

    cfg = small_config()
    model = PointCloudDiffusionModel(cfg)
    schedule = make_schedule(cfg)
    variables = model.init(key, example_points=64)
    src = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 3))
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 3))
    mesh = make_mesh({"points": 8})
    out = guided_sample_loop_sharded(model, schedule, variables, src, cond,
                                     jax.random.PRNGKey(3), mesh,
                                     num_inference_steps=2)
    assert np.asarray(out).shape == (1, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_eval_chamfer_ring_matches_dense(rng):
    """The test CLI's sharded eval path: metrics.chamfer_distance with a
    multi-device points mesh must match the dense single-device value."""
    from pointcloud_style_transfer_tpu.evaluation.metrics import \
        chamfer_distance
    from pointcloud_style_transfer_tpu.parallel import make_mesh
    from pointcloud_style_transfer_tpu.parallel.mesh import POINTS_AXIS

    pred = jnp.asarray(rng.standard_normal((2, 512, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.standard_normal((2, 768, 3)).astype(np.float32))
    mesh = make_mesh({POINTS_AXIS: 8})
    got = chamfer_distance(pred, tgt, mesh=mesh)
    want = chamfer_distance(pred, tgt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-6)
    # indivisible point counts fall back to the dense path (still correct)
    got2 = chamfer_distance(pred[:, :509], tgt, mesh=mesh)
    want2 = chamfer_distance(pred[:, :509], tgt)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=1e-5, atol=1e-6)


def test_dp_sampler_matches_per_group_single_device(key):
    """Data-parallel batched sampling: each device's cloud group must equal
    a single-device guided_sample_loop run on that group with the folded
    key (the documented device-count-reproducible contract), and the whole
    call must carry zero cross-group contamination."""
    from pointcloud_style_transfer_tpu.models import guided_sample_loop
    from pointcloud_style_transfer_tpu.parallel.sharded_sampler import \
        guided_sample_loop_dp

    cfg = small_config()  # total 256, global 64 -> hierarchical path
    model = PointCloudDiffusionModel(cfg)
    schedule = make_schedule(cfg)
    variables = model.init(key, example_points=64)

    B, n_dev = 8, 4
    src = jax.random.normal(jax.random.PRNGKey(1), (B, 256, 3))
    cond = jax.random.normal(jax.random.PRNGKey(2), (B, 256, 3))
    k = jax.random.PRNGKey(3)
    mesh = make_mesh({"data": n_dev})
    got = np.asarray(guided_sample_loop_dp(
        model, schedule, variables, src, cond, k, mesh,
        num_inference_steps=3, guidance_scale=7.5))
    assert got.shape == (B, 256, 3)
    g = B // n_dev
    for d in range(n_dev):
        want = np.asarray(guided_sample_loop(
            model, schedule, variables, src[d * g:(d + 1) * g],
            cond[d * g:(d + 1) * g], jax.random.fold_in(k, d),
            num_inference_steps=3, guidance_scale=7.5))
        np.testing.assert_allclose(got[d * g:(d + 1) * g], want, atol=1e-5)

    import pytest

    with pytest.raises(ValueError, match="not divisible"):
        guided_sample_loop_dp(model, schedule, variables, src[:6], cond[:6],
                              k, mesh, num_inference_steps=3)
