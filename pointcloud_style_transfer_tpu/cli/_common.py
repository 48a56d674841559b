"""Shared CLI helpers."""

from __future__ import annotations

import argparse

import numpy as np


def load_point_cloud(path: str) -> np.ndarray:
    """Load .npy / .txt / .npz point clouds (reference:
    scripts/preprocess_data.py:18-37, minus torch formats)."""
    if path.endswith(".npy"):
        return np.load(path)
    if path.endswith(".npz"):
        with np.load(path) as z:
            return z[list(z.keys())[0]]
    if path.endswith(".txt"):
        try:
            return np.loadtxt(path, delimiter=",")
        except ValueError:
            return np.loadtxt(path, delimiter=" ")
    if path.endswith(".pt"):
        import torch
        data = torch.load(path, weights_only=False)
        if hasattr(data, "numpy"):
            return data.numpy()
        return np.asarray(data)
    raise ValueError(f"Unsupported point cloud format: {path}")


def add_config_overrides(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--experiment_name", type=str, default=None)
    parser.add_argument("--data_dir", type=str, default=None,
                        help="processed data dir override")
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--num_epochs", type=int, default=None)
    parser.add_argument("--seed", type=int, default=None)


def apply_overrides(config, args):
    """CLI flags that ACTUALLY override config (the reference's --batch_size
    writes a dead attribute, scripts/train.py:44-45 — fixed here)."""
    if getattr(args, "experiment_name", None):
        config = config.replace(experiment_name=args.experiment_name)
    if getattr(args, "data_dir", None):
        config = config.replace(processed_data_dir=args.data_dir)
    if getattr(args, "batch_size", None):
        config = config.replace(batch_size=args.batch_size)
    if getattr(args, "num_epochs", None):
        config = config.replace(num_epochs=args.num_epochs)
    if getattr(args, "seed", None) is not None:
        config = config.replace(seed=args.seed)
    return config
