"""End-to-end demo on synthetic LiDAR-like data (no dataset required).

Generates paired sim/real scenes, preprocesses them, trains for a few epochs,
then runs style-transfer inference and the bidirectional evaluation — the
full framework surface in one script. With the compilation cache warm this
runs in a few minutes on a TPU v5e chip (first run pays one-time compiles).

  python examples/demo_synthetic.py --workdir /tmp/pcst_demo --epochs 10

This is the script used to validate the round-1 framework end-to-end on
hardware (see docs/PERF_NOTES.md).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def lidar_like(rng, n, noise):
    """Ground plane + boxes + sensor noise."""
    n_ground = n // 2
    ground = np.stack([rng.uniform(-50, 50, n_ground),
                       rng.uniform(-50, 50, n_ground),
                       rng.normal(0, 0.05 + noise, n_ground)], 1)
    rest = n - n_ground
    boxes = []
    for _ in range(12):
        c = rng.uniform(-40, 40, 2)
        w, d, h = rng.uniform(2, 8, 3)
        m = rest // 12
        boxes.append(np.stack([rng.uniform(c[0], c[0] + w, m),
                               rng.uniform(c[1], c[1] + d, m),
                               rng.uniform(0, h, m)], 1))
    pts = np.concatenate([ground] + boxes)[:n]
    return (pts + rng.normal(0, noise, pts.shape)).astype(np.float32)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", default="/tmp/pcst_demo")
    parser.add_argument("--pairs", type=int, default=8)
    parser.add_argument("--points", type=int, default=130000)
    parser.add_argument("--epochs", type=int, default=5)
    parser.add_argument("--steps", type=int, default=50)
    args = parser.parse_args()

    from pointcloud_style_transfer_tpu.cli import preprocess as pre_cli
    from pointcloud_style_transfer_tpu.cli.inference import DiffusionInference
    from pointcloud_style_transfer_tpu.config import Config
    from pointcloud_style_transfer_tpu.data import create_dataloaders
    from pointcloud_style_transfer_tpu.training import DiffusionTrainer

    wd = args.workdir
    rng = np.random.default_rng(0)
    for d in ("raw/sim", "raw/real"):
        os.makedirs(os.path.join(wd, d), exist_ok=True)
    print(f"[1/4] generating {args.pairs} synthetic pairs ...")
    for i in range(args.pairs):
        np.save(f"{wd}/raw/sim/cloud_{i:03d}.npy",
                lidar_like(rng, args.points, 0.01))
        np.save(f"{wd}/raw/real/cloud_{i:03d}.npy",
                lidar_like(rng, args.points - 12000, 0.08))

    print("[2/4] preprocessing ...")
    pre_cli.main(["--sim_dir", f"{wd}/raw/sim", "--real_dir", f"{wd}/raw/real",
                  "--output_dir", f"{wd}/processed"])

    print(f"[3/4] training {args.epochs} epochs ...")
    config = Config(experiment_name="demo",
                    processed_data_dir=f"{wd}/processed",
                    checkpoint_dir=f"{wd}/checkpoints",
                    log_dir=f"{wd}/logs", result_dir=f"{wd}/results",
                    num_epochs=args.epochs, val_interval=max(1, args.epochs // 3),
                    warmup_epochs=1)
    train_loader, val_loader = create_dataloaders(config)
    DiffusionTrainer(config, resume=True).train(train_loader, val_loader)

    print("[4/4] inference ...")
    engine = DiffusionInference(f"{wd}/checkpoints/demo/best_model")
    engine.process_file(f"{wd}/raw/sim/cloud_000.npy",
                        f"{wd}/raw/real/cloud_000.npy",
                        f"{wd}/out/transferred.npy", visualize=True,
                        num_steps=args.steps)
    print(f"done — outputs in {wd}/out/")


if __name__ == "__main__":
    main()
