"""Test CLI: bidirectional evaluation over a test split.

Protocol parity with the reference (scripts/test.py:77-168): per batch run
sim->real AND real->sim guided sampling, compute Chamfer both directions +
content preservation, aggregate means, write ``test_results.json``. The
reference's ``guidance_strength=`` kwarg bug (scripts/test.py:110,120 — a
guaranteed TypeError) is fixed: the flag is ``--guidance_scale`` and it is
passed correctly.

Intentional default deviation: the reference CLI defaults
``--guidance_strength 0.7`` (scripts/test.py:186), but that flag never
reached the sampler (the TypeError above fired first), so no reference run
ever evaluated at 0.7. This CLI defaults ``--guidance_scale 7.5`` — the
Config default (config/config.py:47) that every WORKING reference path
(inference, trainer sample dumps) actually uses. Pass ``--guidance_scale
0.7`` to reproduce what the reference's test CLI *intended*.
"""

from __future__ import annotations

import argparse
import json
import os
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from ..data import Batcher, HierarchicalPointCloudDataset
from ..evaluation import (chamfer_distance, coverage_score,
                          earth_mover_distance, fidelity_score,
                          hausdorff_distance, uniformity_score)
from ..models import (guided_sample_loop, guided_sample_loop_coarse,
                      make_schedule)
from ..utils.checkpoint import load_for_inference
from ..utils.logger import get_logger
from ..utils.visualization import plot_style_transfer_result


class Tester:
    def __init__(self, checkpoint_path: str, output_dir: str = "test_results",
                 seed: int = 0, fast: bool = False):
        self.logger = get_logger("Tester")
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        self.config, self.model, self.variables = \
            load_for_inference(checkpoint_path)
        self.schedule = make_schedule(self.config)
        self._key = jax.random.PRNGKey(seed)
        # fast mode evaluates the coarse displacement-field sampler
        # (approximate; see cli/inference.py --fast)
        self._sampler = guided_sample_loop_coarse if fast \
            else guided_sample_loop
        # multi-chip: the full-resolution eval Chamfer (120k x 120k) runs
        # point-sharded over a ring (parallel/ring.py); single chip: dense
        self.mesh = None
        if jax.device_count() > 1:
            from ..parallel import make_mesh
            from ..parallel.mesh import POINTS_AXIS
            self.mesh = make_mesh({POINTS_AXIS: jax.device_count()})

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def test(self, loader, guidance_scale: float = 7.5,
             num_inference_steps: int = 50, compute_all_metrics: bool = True,
             save_generated: bool = False,
             save_visualizations: bool = False) -> dict:
        all_metrics = []
        gen_dir = os.path.join(self.output_dir, "generated")
        vis_dir = os.path.join(self.output_dir, "visualizations")
        if save_generated:
            os.makedirs(gen_dir, exist_ok=True)
        if save_visualizations:
            os.makedirs(vis_dir, exist_ok=True)

        for batch_idx, batch in enumerate(loader):
            sim = jnp.asarray(batch["sim_full"])
            real = jnp.asarray(batch["real_full"])
            B = sim.shape[0]

            sim_to_real = self._sampler(
                self.model, self.schedule, self.variables, sim, real,
                self._next_key(), num_inference_steps=num_inference_steps,
                guidance_scale=guidance_scale)
            real_to_sim = self._sampler(
                self.model, self.schedule, self.variables, real, sim,
                self._next_key(), num_inference_steps=num_inference_steps,
                guidance_scale=guidance_scale)

            m = {}
            if compute_all_metrics:
                cd_s2r = chamfer_distance(sim_to_real, real, mesh=self.mesh)
                cd_r2s = chamfer_distance(real_to_sim, sim, mesh=self.mesh)
                content_s2r = chamfer_distance(sim_to_real, sim,
                                               mesh=self.mesh)
                content_r2s = chamfer_distance(real_to_sim, real,
                                               mesh=self.mesh)
                m["chamfer_sim_to_real"] = float(jnp.mean(cd_s2r))
                m["chamfer_real_to_sim"] = float(jnp.mean(cd_r2s))
                m["content_preservation"] = (
                    float(jnp.mean(content_s2r))
                    + float(jnp.mean(content_r2s))) / 2
                # extended metrics in BOTH directions, matching the CD
                # protocol (reference runs both directions too,
                # scripts/test.py:105-133)
                for tag, gen, tgt in (("sim_to_real", sim_to_real, real),
                                      ("real_to_sim", real_to_sim, sim)):
                    m[f"hausdorff_{tag}"] = float(jnp.mean(
                        hausdorff_distance(gen, tgt)))
                    m[f"coverage_{tag}"] = float(coverage_score(gen, tgt))
                    m[f"uniformity_{tag}"] = float(uniformity_score(gen))
                    m[f"emd_{tag}"] = float(jnp.mean(earth_mover_distance(
                        gen, tgt, key=self._next_key())))
                    m[f"fidelity_{tag}"] = fidelity_score(gen, tgt)
            all_metrics.append(m)
            self.logger.info("batch %d: %s", batch_idx,
                             {k: round(v, 5) for k, v in m.items()})

            if save_generated:
                for i in range(B):
                    idx = batch_idx * B + i
                    np.save(os.path.join(gen_dir,
                                         f"sim_to_real_{idx:04d}.npy"),
                            np.asarray(sim_to_real[i]))
                    np.save(os.path.join(gen_dir,
                                         f"real_to_sim_{idx:04d}.npy"),
                            np.asarray(real_to_sim[i]))
                    np.save(os.path.join(gen_dir,
                                         f"original_sim_{idx:04d}.npy"),
                            np.asarray(sim[i]))
                    np.save(os.path.join(gen_dir,
                                         f"original_real_{idx:04d}.npy"),
                            np.asarray(real[i]))

            if save_visualizations and batch_idx < 5:
                for i in range(min(B, 2)):
                    idx = batch_idx * B + i
                    plot_style_transfer_result(
                        np.asarray(sim[i]), np.asarray(sim_to_real[i]),
                        np.asarray(real[i]),
                        title=f"Test Sample {idx} - Sim to Real",
                        save_path=os.path.join(vis_dir,
                                               f"sample_{idx:04d}_s2r.png"))

        average_metrics = {}
        if all_metrics:
            for k in all_metrics[0]:
                vals = [m[k] for m in all_metrics if k in m]
                if vals:
                    average_metrics[k] = float(np.mean(vals))
        return {"average_metrics": average_metrics}


def main(argv=None) -> int:
    from ..utils.cache import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser(
        description="Test point-cloud style transfer model")
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--test_data", type=str, required=True)
    parser.add_argument("--output_dir", type=str, default="test_results")
    parser.add_argument("--save_generated", action="store_true")
    parser.add_argument("--save_visualizations", action="store_true")
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--num_samples", type=int, default=-1)
    parser.add_argument("--num_inference_steps", type=int, default=50)
    parser.add_argument("--guidance_scale", type=float, default=7.5)
    parser.add_argument("--compute_all_metrics", action="store_true")
    parser.add_argument("--fast", action="store_true",
                        help="evaluate the coarse displacement-field fast "
                             "sampler instead of the reference-parity one "
                             "(approximate; ~9x faster)")
    args = parser.parse_args(argv)

    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    output_dir = os.path.join(args.output_dir, f"test_{timestamp}")
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "test_config.json"), "w") as f:
        json.dump(vars(args), f, indent=2)

    tester = Tester(args.checkpoint, output_dir, fast=args.fast)
    ds = HierarchicalPointCloudDataset(args.test_data, use_hierarchical=True)
    if args.num_samples > 0:
        ds.file_paths = ds.file_paths[:args.num_samples]
    loader = Batcher(ds, batch_size=args.batch_size, shuffle=False,
                     drop_last=False)

    results = tester.test(
        loader, guidance_scale=args.guidance_scale,
        num_inference_steps=args.num_inference_steps,
        compute_all_metrics=args.compute_all_metrics,
        save_generated=args.save_generated,
        save_visualizations=args.save_visualizations)

    print("\n" + "=" * 60 + "\nTEST RESULTS SUMMARY\n" + "=" * 60)
    for k, v in results["average_metrics"].items():
        print(f"{k}: {v:.6f}")
    print("=" * 60)
    with open(os.path.join(output_dir, "test_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(f"\nDetailed results saved to: "
          f"{os.path.join(output_dir, 'test_results.json')}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
