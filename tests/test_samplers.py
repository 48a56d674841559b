import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_style_transfer_tpu.config import Config
from pointcloud_style_transfer_tpu.models import (PointCloudDiffusionModel,
                                                  ddim_sample_loop,
                                                  guided_sample_loop,
                                                  make_schedule)


def small_config(**kw):
    base = dict(total_points=256, global_points=128, feature_dim=32,
                time_embed_dim=16, num_timesteps=20, use_amp=False)
    base.update(kw)
    return Config(**base)


def setup_model(key, cfg):
    model = PointCloudDiffusionModel(cfg)
    variables = model.init(key, example_points=64)
    return model, variables


def test_guided_sample_hierarchical(key):
    cfg = small_config()
    model, variables = setup_model(key, cfg)
    src = jax.random.normal(jax.random.PRNGKey(1), (1, 256, 3))
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 256, 3))
    out = guided_sample_loop(model, make_schedule(cfg), variables, src, cond,
                             jax.random.PRNGKey(3), num_inference_steps=3,
                             guidance_scale=7.5)
    out = np.asarray(out)
    assert out.shape == (1, 256, 3)
    assert np.isfinite(out).all()
    # tanh geometric constraint + final DDIM step keep output in [-1.8, 1.8]
    assert np.abs(out).max() <= 1.8 + 1e-4


def test_guided_sample_direct_small_cloud(key):
    """Clouds <= global_points must take the direct path (the reference's
    guided loop crashes/degrades here — fixed by design)."""
    cfg = small_config()
    model, variables = setup_model(key, cfg)
    src = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 3))
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 3))
    out = guided_sample_loop(model, make_schedule(cfg), variables, src, cond,
                             jax.random.PRNGKey(3), num_inference_steps=2)
    assert np.asarray(out).shape == (1, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_guided_sample_deterministic(key):
    cfg = small_config()
    model, variables = setup_model(key, cfg)
    src = jax.random.normal(jax.random.PRNGKey(1), (1, 256, 3))
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 256, 3))
    s = make_schedule(cfg)
    o1 = guided_sample_loop(model, s, variables, src, cond,
                            jax.random.PRNGKey(3), num_inference_steps=2)
    o2 = guided_sample_loop(model, s, variables, src, cond,
                            jax.random.PRNGKey(3), num_inference_steps=2)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_guidance_scale_changes_output(key):
    cfg = small_config()
    model, variables = setup_model(key, cfg)
    src = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 3))
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 3))
    s = make_schedule(cfg)
    o1 = guided_sample_loop(model, s, variables, src, cond,
                            jax.random.PRNGKey(3), num_inference_steps=2,
                            guidance_scale=0.0)
    o2 = guided_sample_loop(model, s, variables, src, cond,
                            jax.random.PRNGKey(3), num_inference_steps=2,
                            guidance_scale=7.5)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_ddim_sample_loop(key):
    cfg = small_config()
    model, variables = setup_model(key, cfg)
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 256, 3))
    shape_like = jnp.zeros((1, 256, 3))
    out = ddim_sample_loop(model, make_schedule(cfg), variables, shape_like,
                           cond, jax.random.PRNGKey(3), num_inference_steps=3)
    assert np.asarray(out).shape == (1, 256, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_coarse_mode_sampler(key):
    from pointcloud_style_transfer_tpu.models import guided_sample_loop_coarse
    cfg = small_config()
    model, variables = setup_model(key, cfg)
    src = jax.random.normal(jax.random.PRNGKey(1), (1, 256, 3))
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 256, 3))
    out = guided_sample_loop_coarse(model, make_schedule(cfg), variables, src,
                                    cond, jax.random.PRNGKey(3),
                                    num_inference_steps=3)
    out = np.asarray(out)
    assert out.shape == (1, 256, 3)
    assert np.isfinite(out).all()


def test_coarse_mode_small_cloud_no_hierarchy(key):
    from pointcloud_style_transfer_tpu.models import guided_sample_loop_coarse
    cfg = small_config()
    model, variables = setup_model(key, cfg)
    src = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 3))
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 3))
    out = guided_sample_loop_coarse(model, make_schedule(cfg), variables, src,
                                    cond, jax.random.PRNGKey(3),
                                    num_inference_steps=2)
    assert np.asarray(out).shape == (1, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_coarse_vs_reference_mode_similar(key):
    """The displacement-field fast mode must land close to the reference-mode
    output in Chamfer terms (same model, same seed)."""
    from pointcloud_style_transfer_tpu.evaluation import chamfer_distance
    from pointcloud_style_transfer_tpu.models import guided_sample_loop_coarse
    cfg = small_config()
    model, variables = setup_model(key, cfg)
    src = jax.random.normal(jax.random.PRNGKey(1), (1, 256, 3))
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 256, 3))
    s = make_schedule(cfg)
    ref = guided_sample_loop(model, s, variables, src, cond,
                             jax.random.PRNGKey(3), num_inference_steps=5)
    fast = guided_sample_loop_coarse(model, s, variables, src, cond,
                                     jax.random.PRNGKey(3),
                                     num_inference_steps=5)
    cd = float(chamfer_distance(ref, fast)[0])
    # untrained net, but both trajectories share the source anchor: outputs
    # should be geometrically close (sanity bound, not a tight parity claim)
    assert cd < 1.0, cd


def test_guided_sample_grid_backend_matches_jnp(key, monkeypatch):
    """The grid backend's fused kNN-interpolation path must reproduce the
    jnp path through the full sampler (neighbour selection is exact; only
    weighted-sum reduction order differs). Kernels run in interpret mode on
    CPU via a monkeypatched wrapper."""
    import functools
    import importlib

    # ops/__init__ re-exports the grid_knn FUNCTION under the module's name
    G = importlib.import_module("pointcloud_style_transfer_tpu.ops.grid_knn")

    orig = G.grid_knn_interpolate
    monkeypatch.setattr(G, "grid_knn_interpolate",
                        functools.partial(orig, interpret=True))
    # B=1 routes through the layout variant + composed assembly
    monkeypatch.setattr(G, "grid_knn_interpolate_layout",
                        functools.partial(G.grid_knn_interpolate_layout,
                                          interpret=True))

    src = jax.random.normal(jax.random.PRNGKey(1), (1, 256, 3))
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 256, 3))
    outs = {}
    for backend in ("jnp", "grid"):
        cfg = small_config(knn_backend=backend)
        model, variables = setup_model(key, cfg)
        outs[backend] = np.asarray(guided_sample_loop(
            model, make_schedule(cfg), variables, src, cond,
            jax.random.PRNGKey(3), num_inference_steps=3,
            guidance_scale=7.5))
    np.testing.assert_allclose(outs["grid"], outs["jnp"], atol=1e-3)
    assert (np.abs(outs["grid"] - outs["jnp"]) < 1e-4).mean() > 0.99


def test_upsample_unknown_composed_assembly_real_grid(key, monkeypatch):
    """The B=1 grid branch of _upsample_unknown (layout-order interp +
    composed inverse-permutation assembly) must match the jnp backend at a
    geometry that takes the REAL padded-layout grid path (not the tiny-ref
    brute guard): selection is exact, only weighted-sum order differs."""
    import functools
    import importlib

    import numpy as onp

    from pointcloud_style_transfer_tpu.models.samplers import \
        _upsample_unknown

    G = importlib.import_module("pointcloud_style_transfer_tpu.ops.grid_knn")
    monkeypatch.setattr(G, "grid_knn_interpolate_layout", functools.partial(
        G.grid_knn_interpolate_layout, interpret=True, grid_shape=(4, 4, 4),
        tq=32, slot_cap=256, fallback_cap=512))

    rng = onp.random.default_rng(0)
    N, M = 3000, 1024  # M >= 4*cells and M_pad >= slot_cap: real grid path
    x = jnp.asarray(rng.standard_normal((1, N, 3)).astype(onp.float32) * 2)
    perm = rng.permutation(N).astype(onp.int32)
    idx = jnp.asarray(perm[:M][None])
    unknown = jnp.asarray(perm[M:][None])
    coarse_vals = jnp.asarray(rng.standard_normal((1, M, 3)).astype(
        onp.float32))

    got = _upsample_unknown(x, idx, coarse_vals, "grid", unknown=unknown)
    want = _upsample_unknown(x, idx, coarse_vals, "jnp", unknown=unknown)
    got, want = onp.asarray(got), onp.asarray(want)
    # coarse slots receive their exact values in both paths
    onp.testing.assert_array_equal(
        onp.take_along_axis(got[0], onp.asarray(idx[0])[:, None], 0),
        onp.asarray(coarse_vals[0]))
    onp.testing.assert_allclose(got, want, atol=1e-3)
    assert (onp.abs(got - want) < 1e-4).mean() > 0.99


def test_upsample_unknown_flat_batched_grid(key, monkeypatch):
    """The B>1 grid branch (flat-batched layout interp + ONE composite-key
    inverse-permutation sort over all clouds) must match per-cloud B=1
    calls of the same backend bit-for-bit at selection level (same kernel
    math; only fallback-tier composition can differ at float level)."""
    import functools
    import importlib

    import numpy as onp

    from pointcloud_style_transfer_tpu.models.samplers import \
        _upsample_unknown

    G = importlib.import_module("pointcloud_style_transfer_tpu.ops.grid_knn")
    for name in ("grid_knn_interpolate_layout",
                 "grid_knn_interpolate_layout_batched",
                 "grid_knn_interpolate"):
        monkeypatch.setattr(G, name, functools.partial(
            getattr(G, name), interpret=True, grid_shape=(4, 4, 4),
            tq=32, slot_cap=256, fallback_cap=512))
    # the defaults predicate must agree with the patched geometry: (4,4,4)
    # at M=1024 is full-z at slot_cap 256
    monkeypatch.setattr(G, "grid_batched_defaults_ok",
                        lambda B, Nq, M, k=3: G._batched_grid_ok(
                            B, Nq, M, (4, 4, 4), 256, k))
    # opt into the flat path (lax.map is the e2e default since round 5)
    import pointcloud_style_transfer_tpu.models.samplers as S
    monkeypatch.setattr(S, "_SAMPLER_FLAT_BATCH", True)

    rng = onp.random.default_rng(1)
    B, N, M = 3, 3000, 1024
    x = jnp.asarray(rng.standard_normal((B, N, 3)).astype(onp.float32) * 2)
    idx_l, unk_l = [], []
    for _ in range(B):
        perm = rng.permutation(N).astype(onp.int32)
        idx_l.append(perm[:M])
        unk_l.append(perm[M:])
    idx = jnp.asarray(onp.stack(idx_l))
    unknown = jnp.asarray(onp.stack(unk_l))
    coarse_vals = jnp.asarray(
        rng.standard_normal((B, M, 3)).astype(onp.float32))

    got = _upsample_unknown(x, idx, coarse_vals, "grid", unknown=unknown)
    got = onp.asarray(got)
    assert got.shape == (B, N, 3)
    # coarse slots receive their exact values
    for b in range(B):
        onp.testing.assert_array_equal(
            onp.take_along_axis(got[b], onp.asarray(idx[b])[:, None], 0),
            onp.asarray(coarse_vals[b]))
    for b in range(B):
        want_b = onp.asarray(_upsample_unknown(
            x[b:b + 1], idx[b:b + 1], coarse_vals[b:b + 1], "grid",
            unknown=unknown[b:b + 1]))
        onp.testing.assert_allclose(got[b:b + 1], want_b,
                                    atol=1e-6, rtol=1e-6)
    want = onp.asarray(_upsample_unknown(x, idx, coarse_vals, "jnp",
                                         unknown=unknown))
    onp.testing.assert_allclose(got, want, atol=1e-3)
    assert (onp.abs(got - want) < 1e-4).mean() > 0.99


def test_upsample_unknown_empty_unknown(key):
    """N == M with hierarchical forced: the unknown set is empty and the
    coarse values must come back as the (un-permuted) field without
    touching any interpolation path (advisor round-4 guard)."""
    import numpy as onp

    from pointcloud_style_transfer_tpu.models.samplers import \
        _upsample_unknown

    rng = onp.random.default_rng(2)
    N = 256
    x = jnp.asarray(rng.standard_normal((1, N, 3)).astype(onp.float32))
    perm = rng.permutation(N).astype(onp.int32)
    idx = jnp.asarray(perm[None])
    unknown = jnp.zeros((1, 0), jnp.int32)
    coarse_vals = jnp.asarray(
        rng.standard_normal((1, N, 3)).astype(onp.float32))
    for backend in ("grid", "jnp"):
        got = onp.asarray(_upsample_unknown(x, idx, coarse_vals, backend,
                                            unknown=unknown))
        onp.testing.assert_array_equal(
            onp.take_along_axis(got[0], onp.asarray(perm)[:, None], 0),
            onp.asarray(coarse_vals[0]))
