import json
import os

import numpy as np
import pytest

from pointcloud_style_transfer_tpu.cli import compare as compare_cli
from pointcloud_style_transfer_tpu.cli import preprocess as preprocess_cli
from pointcloud_style_transfer_tpu.cli.preprocess import split_indices


def _write_cloud_dirs(tmp_path, n_files=5, n_points=300):
    rng = np.random.default_rng(0)
    sim_dir = tmp_path / "sim"
    real_dir = tmp_path / "real"
    sim_dir.mkdir(); real_dir.mkdir()
    for i in range(n_files):
        np.save(sim_dir / f"cloud_{i:03d}.npy",
                rng.uniform(-5, 5, (n_points, 3)).astype(np.float32))
        np.save(real_dir / f"cloud_{i:03d}.npy",
                rng.uniform(-5, 5, (n_points, 3)).astype(np.float32))
    return str(sim_dir), str(real_dir)


def test_split_indices_deterministic():
    s1 = split_indices(10, 0.8, 42)
    s2 = split_indices(10, 0.8, 42)
    assert s1 == s2
    all_idx = sorted(s1["train"] + s1["val"] + s1["test"])
    assert all_idx == list(range(10))
    assert len(s1["train"]) == 8


def test_preprocess_cli_end_to_end(tmp_path):
    sim_dir, real_dir = _write_cloud_dirs(tmp_path)
    out = tmp_path / "out"
    rc = preprocess_cli.main([
        "--sim_dir", sim_dir, "--real_dir", real_dir,
        "--output_dir", str(out),
        "--total_points", "200", "--global_points", "50"])
    assert rc == 0
    cfg = json.loads((out / "preprocessing_config.json").read_text())
    assert cfg["train_files"] == 4
    assert cfg["val_files"] + cfg["test_files"] == 1
    train_files = list((out / "train").glob("*_hierarchical.npz"))
    assert len(train_files) == 4
    with np.load(train_files[0]) as z:
        assert z["sim_full"].shape == (200, 3)
        assert z["sim_global"].shape == (50, 3)


def test_compare_cli(tmp_path, capsys):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((100, 3)).astype(np.float32)
    np.save(tmp_path / "a.npy", a)
    np.save(tmp_path / "b.npy", a + 0.001)
    rc = compare_cli.main([str(tmp_path / "a.npy"), str(tmp_path / "b.npy"),
                           "--json"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["f1"] == 1.0
    assert out["chamfer_distance"] < 0.01


def test_visualize_cli(tmp_path):
    pytest.importorskip("matplotlib")
    from pointcloud_style_transfer_tpu.cli import visualize as vis_cli
    rng = np.random.default_rng(0)
    for name in ("o", "g", "r"):
        np.save(tmp_path / f"{name}.npy",
                rng.standard_normal((200, 3)).astype(np.float32))
    png = tmp_path / "out.png"
    ply = tmp_path / "out.ply"
    rc = vis_cli.main(["--original", str(tmp_path / "o.npy"),
                       "--generated", str(tmp_path / "g.npy"),
                       "--reference", str(tmp_path / "r.npy"),
                       "--output", str(png), "--export_ply", str(ply),
                       "--sample_size", "100"])
    assert rc == 0
    assert png.exists() and png.stat().st_size > 0
    header = ply.read_text().splitlines()
    assert header[0] == "ply" and "element vertex 200" in header[2]


@pytest.mark.slow
def test_train_and_inference_cli_roundtrip(tmp_path, monkeypatch):
    """preprocess -> train 1 epoch -> inference from best checkpoint."""
    from pointcloud_style_transfer_tpu.cli import inference as infer_cli
    from pointcloud_style_transfer_tpu.cli import train as train_cli

    sim_dir, real_dir = _write_cloud_dirs(tmp_path, n_files=4, n_points=300)
    data_out = tmp_path / "processed"
    preprocess_cli.main([
        "--sim_dir", sim_dir, "--real_dir", real_dir,
        "--output_dir", str(data_out),
        "--total_points", "256", "--global_points", "64"])

    monkeypatch.chdir(tmp_path)
    import pointcloud_style_transfer_tpu.cli.train as tc
    from pointcloud_style_transfer_tpu.config import Config

    # tiny model via monkeypatched default config
    tiny = dict(total_points=256, global_points=64, feature_dim=16,
                time_embed_dim=8, num_timesteps=10, num_epochs=1,
                val_interval=1, use_amp=False, warmup_epochs=1,
                gradient_accumulation_steps=1)
    monkeypatch.setattr(tc, "Config", lambda: Config(**tiny))

    rc = train_cli.main(["--experiment_name", "clitest",
                         "--data_dir", str(data_out), "--batch_size", "1"])
    assert rc == 0
    best = tmp_path / "checkpoints" / "clitest" / "best_model"
    assert best.exists()

    src = tmp_path / "src.npy"
    ref = tmp_path / "ref.npy"
    rng = np.random.default_rng(1)
    np.save(src, rng.uniform(-3, 3, (256, 3)).astype(np.float32))
    np.save(ref, rng.uniform(-3, 3, (256, 3)).astype(np.float32))
    out = tmp_path / "transferred.npy"
    rc = infer_cli.main(["--checkpoint", str(best), "--source", str(src),
                         "--reference", str(ref), "--output", str(out),
                         "--num_steps", "2"])
    assert rc == 0
    result = np.load(out)
    assert result.shape == (256, 3)
    assert np.isfinite(result).all()

    # --fast routes through the coarse displacement-field sampler
    out_fast = tmp_path / "transferred_fast.npy"
    rc = infer_cli.main(["--checkpoint", str(best), "--source", str(src),
                         "--reference", str(ref), "--output", str(out_fast),
                         "--num_steps", "2", "--fast"])
    assert rc == 0
    result_fast = np.load(out_fast)
    assert result_fast.shape == (256, 3)
    assert np.isfinite(result_fast).all()
    # different sampler => different output (guards against --fast being
    # silently ignored)
    assert not np.allclose(result_fast, result)

    # streaming directory mode: N pairs through one compiled sampler,
    # incl. a ragged final batch and input resampling to total_points
    src_dir = tmp_path / "batch_src"
    src_dir.mkdir()
    for i in range(3):
        np.save(src_dir / f"scene_{i}.npy",
                rng.uniform(-3, 3, (200 + 40 * i, 3)).astype(np.float32))
    out_dir = tmp_path / "batch_out"
    rc = infer_cli.main(["--checkpoint", str(best),
                         "--source_dir", str(src_dir),
                         "--reference", str(ref),
                         "--output_dir", str(out_dir),
                         "--batch_size", "2", "--num_steps", "2"])
    assert rc == 0
    outs = sorted(os.listdir(out_dir))
    assert outs == [f"scene_{i}_transferred.npy" for i in range(3)]
    for f in outs:
        arr = np.load(out_dir / f)
        assert arr.shape == (256, 3) and np.isfinite(arr).all()


@pytest.mark.slow
def test_progress_cli(tmp_path, monkeypatch):
    """Progress CLI renders a grid across checkpoints."""
    pytest.importorskip("matplotlib")
    from pointcloud_style_transfer_tpu.cli import progress as progress_cli
    from pointcloud_style_transfer_tpu.config import Config
    from pointcloud_style_transfer_tpu.training import DiffusionTrainer
    from pointcloud_style_transfer_tpu.data import create_dataloaders

    sim_dir, real_dir = _write_cloud_dirs(tmp_path, n_files=4, n_points=300)
    data_out = tmp_path / "processed"
    preprocess_cli.main([
        "--sim_dir", sim_dir, "--real_dir", real_dir,
        "--output_dir", str(data_out),
        "--total_points", "128", "--global_points", "32"])

    monkeypatch.chdir(tmp_path)
    cfg = Config(experiment_name="prog", processed_data_dir=str(data_out),
                 checkpoint_dir=str(tmp_path / "ckpt"),
                 log_dir=str(tmp_path / "logs"),
                 result_dir=str(tmp_path / "res"),
                 total_points=128, global_points=32, feature_dim=16,
                 time_embed_dim=8, num_timesteps=10, num_epochs=2,
                 val_interval=1, warmup_epochs=1, use_amp=False,
                 gradient_accumulation_steps=1, batch_size=1)
    train_loader, val_loader = create_dataloaders(cfg)
    DiffusionTrainer(cfg, resume=False).train(train_loader, val_loader)

    src = tmp_path / "s.npy"
    ref = tmp_path / "r.npy"
    rng = np.random.default_rng(0)
    np.save(src, rng.uniform(-3, 3, (128, 3)).astype(np.float32))
    np.save(ref, rng.uniform(-3, 3, (128, 3)).astype(np.float32))
    out_png = tmp_path / "prog.png"
    rc = progress_cli.main([
        "--checkpoint_dir", str(tmp_path / "ckpt" / "prog"),
        "--source", str(src), "--reference", str(ref),
        "--output", str(out_png), "--num_steps", "2",
        "--max_checkpoints", "2"])
    assert rc == 0
    assert out_png.exists() and out_png.stat().st_size > 0
