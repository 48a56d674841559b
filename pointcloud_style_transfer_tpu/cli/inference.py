"""Inference CLI: hierarchical CFG style transfer for one source/reference pair.

Contract parity with the reference (scripts/inference.py:63-203): loads the
checkpoint's embedded config + EMA weights, normalizes both clouds, runs the
guided sampler, denormalizes with the SOURCE's params, saves float32 .npy,
optional 3-panel visualization.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.preprocessing import (denormalize_point_cloud,
                                  normalize_point_cloud)
from ..models import guided_sample_loop, make_schedule
from ..utils.checkpoint import load_for_inference
from ..utils.logger import get_logger
from ..utils.visualization import plot_style_transfer_result
from ._common import load_point_cloud


class DiffusionInference:
    """Reference-API-compatible inference engine (scripts/inference.py:63)."""

    def __init__(self, checkpoint_path: str, seed: int = 0):
        self.logger = get_logger("Inference")
        self.config, self.model, self.variables = \
            load_for_inference(checkpoint_path)
        self.schedule = make_schedule(self.config)
        self._key = jax.random.PRNGKey(seed)
        self.logger.info("Inference engine ready (config from checkpoint)")

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def transfer_style_hierarchical(self, source_points: np.ndarray,
                                    reference_points: np.ndarray,
                                    num_steps: int = 50,
                                    guidance_scale: float = 7.5) -> np.ndarray:
        t0 = time.time()
        src_norm, src_params = normalize_point_cloud(source_points)
        ref_norm, _ = normalize_point_cloud(reference_points)
        src = jnp.asarray(src_norm)[None]
        ref = jnp.asarray(ref_norm)[None]
        out = guided_sample_loop(
            self.model, self.schedule, self.variables, src, ref,
            self._next_key(), num_inference_steps=num_steps,
            guidance_scale=guidance_scale)
        out = np.asarray(out[0])
        result = denormalize_point_cloud(out, src_params)
        self.logger.info("Style transfer finished in %.2fs (%d points)",
                         time.time() - t0, len(result))
        return result.astype(np.float32)

    def process_file(self, source_path: str, reference_path: str,
                     output_path: str, visualize: bool = False,
                     num_steps: int = 50, guidance_scale: float = 7.5):
        sim = load_point_cloud(source_path)
        real = load_point_cloud(reference_path)
        transferred = self.transfer_style_hierarchical(
            sim, real, num_steps, guidance_scale)
        os.makedirs(os.path.dirname(os.path.abspath(output_path)),
                    exist_ok=True)
        np.save(output_path, transferred.astype(np.float32))
        self.logger.info("Saved transferred cloud to %s", output_path)
        if visualize:
            vis_path = os.path.splitext(output_path)[0] + ".png"
            if plot_style_transfer_result(sim, transferred, real,
                                          title="Style Transfer Result",
                                          save_path=vis_path):
                self.logger.info("Visualization saved to %s", vis_path)


def main(argv=None) -> int:
    from ..utils.cache import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser(
        description="Hierarchical point-cloud style transfer inference")
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="checkpoint directory (e.g. .../best_model)")
    parser.add_argument("--source", type=str, required=True)
    parser.add_argument("--reference", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--visualize", action="store_true")
    parser.add_argument("--num_steps", type=int, default=50)
    parser.add_argument("--guidance_scale", type=float, default=7.5)
    args = parser.parse_args(argv)

    try:
        engine = DiffusionInference(args.checkpoint)
        engine.process_file(args.source, args.reference, args.output,
                            args.visualize, args.num_steps,
                            args.guidance_scale)
        print("Inference completed successfully!")
        return 0
    except Exception as e:
        print(f"Inference failed: {e}", file=sys.stderr)
        import traceback
        traceback.print_exc()
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
