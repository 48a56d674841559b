import numpy as np
import pytest

from pointcloud_style_transfer_tpu.data import (
    Batcher, HierarchicalPointCloudDataset, PointCloudPreprocessor, collate,
    consistent_upsample, denormalize_point_cloud, normalize_point_cloud,
    voxel_grid_downsample)


def test_normalize_roundtrip(rng):
    pts = rng.uniform(-50, 50, size=(1000, 3)).astype(np.float32) + 100
    norm, params = normalize_point_cloud(pts)
    assert abs(np.abs(norm).max() - 1.8) < 1e-3
    np.testing.assert_allclose(np.abs(norm.mean(0)), 0, atol=1e-3)
    back = denormalize_point_cloud(norm, params)
    np.testing.assert_allclose(back, pts, atol=1e-3)


def test_normalize_degenerate():
    pts = np.zeros((10, 3), np.float32)
    norm, params = normalize_point_cloud(pts)
    assert params["scale"] == 1.0
    assert np.isfinite(norm).all()


def test_voxel_downsample_exact_count(rng):
    pts = rng.uniform(-10, 10, size=(5000, 3)).astype(np.float32)
    ds, idx = voxel_grid_downsample(pts, 1000, rng)
    assert ds.shape == (1000, 3)
    assert len(set(idx.tolist())) == 1000
    np.testing.assert_array_equal(ds, pts[idx])


def test_voxel_downsample_small_identity(rng):
    pts = rng.standard_normal((50, 3)).astype(np.float32)
    ds, idx = voxel_grid_downsample(pts, 100, rng)
    np.testing.assert_array_equal(idx, np.arange(50))


def test_consistent_upsample_roundtrip(rng):
    pts = rng.standard_normal((200, 3)).astype(np.float32)
    coarse, idx = voxel_grid_downsample(pts, 50, rng)
    up = consistent_upsample(coarse, pts, idx)
    assert up.shape == (200, 3)
    np.testing.assert_array_equal(up[idx], coarse)
    assert np.isfinite(up).all()


def test_preprocessor_save_and_dataset(tmp_path, rng):
    pre = PointCloudPreprocessor(total_points=500, global_points=100, seed=0)
    for i in range(3):
        sim = rng.uniform(-5, 5, size=(620, 3)).astype(np.float32)
        real = rng.uniform(-5, 5, size=(430, 3)).astype(np.float32)
        pre.save_hierarchical_data(sim, real, str(tmp_path), f"train_{i:04d}")

    ds = HierarchicalPointCloudDataset(str(tmp_path))
    assert len(ds) == 3
    item = ds[0]
    assert item["sim_full"].shape == (500, 3)
    assert item["real_full"].shape == (500, 3)
    assert item["sim_global"].shape == (100, 3)
    assert item["sim_global_indices"].shape == (100,)
    # global points must be a subset of full points via the stored indices
    np.testing.assert_array_equal(
        item["sim_global"], item["sim_full"][item["sim_global_indices"]])
    assert abs(np.abs(item["sim_full"]).max() - 1.8) < 1e-2


def test_resample_up_and_down(rng):
    pre = PointCloudPreprocessor(total_points=300, global_points=50, seed=0)
    up = pre._resample_to_total(rng.standard_normal((100, 3)).astype(np.float32))
    assert up.shape == (300, 3)
    down = pre._resample_to_total(
        rng.standard_normal((900, 3)).astype(np.float32))
    assert down.shape == (300, 3)


def test_batcher_deterministic_and_drop_last(tmp_path, rng):
    pre = PointCloudPreprocessor(total_points=100, global_points=20, seed=0)
    for i in range(5):
        pts = rng.standard_normal((100, 3)).astype(np.float32)
        pre.save_hierarchical_data(pts, pts, str(tmp_path), f"x_{i:04d}")
    ds = HierarchicalPointCloudDataset(str(tmp_path))
    b = Batcher(ds, batch_size=2, shuffle=True, drop_last=True, seed=7)
    batches = list(b)
    assert len(batches) == 2  # 5 // 2
    assert batches[0]["sim_full"].shape == (2, 100, 3)
    again = list(b)
    np.testing.assert_array_equal(batches[0]["sim_full"],
                                  again[0]["sim_full"])
    b.set_epoch(1)
    shuffled = list(b)
    assert not np.array_equal(batches[0]["sim_full"],
                              shuffled[0]["sim_full"])


def test_corrupt_file_raises(tmp_path, rng):
    pre = PointCloudPreprocessor(total_points=100, global_points=20, seed=0)
    pts = rng.standard_normal((100, 3)).astype(np.float32)
    pre.save_hierarchical_data(pts, pts, str(tmp_path), "ok_0000")
    bad = tmp_path / "bad_0001_hierarchical.npz"
    bad.write_bytes(b"not an npz")
    ds = HierarchicalPointCloudDataset(str(tmp_path))
    with pytest.raises(RuntimeError):
        _ = ds[0]  # sorted order puts 'bad' first
    ds2 = HierarchicalPointCloudDataset(str(tmp_path), on_error="zeros")
    item = ds2[0]
    assert (item["sim_full"] == 0).all()


def test_collate_mixed_types(rng):
    items = [{"a": rng.standard_normal((4, 3)).astype(np.float32),
              "meta": {"scale": i}} for i in range(3)]
    out = collate(items)
    assert out["a"].shape == (3, 4, 3)
    assert isinstance(out["meta"], list) and len(out["meta"]) == 3


def test_batcher_threaded_prefetch_same_contents(tmp_path, rng):
    """num_workers > 0 must produce identical batches in identical order."""
    pre = PointCloudPreprocessor(total_points=100, global_points=20, seed=0)
    for i in range(7):
        pts = rng.standard_normal((100, 3)).astype(np.float32)
        pre.save_hierarchical_data(pts, pts, str(tmp_path), f"x_{i:04d}")
    ds = HierarchicalPointCloudDataset(str(tmp_path))
    sync = Batcher(ds, batch_size=2, shuffle=True, drop_last=False, seed=3)
    threaded = Batcher(ds, batch_size=2, shuffle=True, drop_last=False,
                       seed=3, num_workers=3)
    for a, b in zip(sync, threaded):
        np.testing.assert_array_equal(a["sim_full"], b["sim_full"])
        np.testing.assert_array_equal(a["sim_global_indices"],
                                      b["sim_global_indices"])
