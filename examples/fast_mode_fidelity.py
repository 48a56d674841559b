"""Fast-mode fidelity vs the reference-parity sampler with TRAINED weights.

Loads the end-to-end training-proof checkpoint (examples/
e2e_training_proof.py — a real 60-epoch run, not a random init), runs both
samplers from the same seed on held-out val pairs, and reports the Chamfer
distance between their outputs, against the distances to the input clouds
as scale references. This replaces the round-1 claim (measured after a
short ad-hoc run) with the committed proof model.

Usage: python examples/fast_mode_fidelity.py [--workdir /tmp/pcst_proof2]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_style_transfer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", default="/tmp/pcst_proof2")
    parser.add_argument("--pairs", type=int, default=3)
    args = parser.parse_args()

    from pointcloud_style_transfer_tpu.data import (
        HierarchicalPointCloudDataset)
    from pointcloud_style_transfer_tpu.models import (
        guided_sample_loop, guided_sample_loop_coarse, make_schedule)
    from pointcloud_style_transfer_tpu.ops.distance import chamfer_distance
    from pointcloud_style_transfer_tpu.utils.checkpoint import (
        load_for_inference)

    ckpt = f"{args.workdir}/checkpoints/e2e_proof/best_model"
    config, model, variables = load_for_inference(ckpt)
    schedule = make_schedule(config)

    ds = HierarchicalPointCloudDataset(f"{args.workdir}/processed/val",
                                       use_hierarchical=True)
    cds = []
    for i in range(min(args.pairs, len(ds.file_paths))):
        item = ds[i]
        src = jnp.asarray(item["sim_full"])[None]
        cond = jnp.asarray(item["real_full"])[None]
        key = jax.random.PRNGKey(100 + i)
        parity = guided_sample_loop(model, schedule, variables, src, cond,
                                    key, num_inference_steps=50,
                                    guidance_scale=config.guidance_scale)
        fast = guided_sample_loop_coarse(model, schedule, variables, src,
                                         cond, key, num_inference_steps=50,
                                         guidance_scale=config.guidance_scale)
        cd_ff = float(jnp.mean(chamfer_distance(fast, parity)))
        cd_src = float(jnp.mean(chamfer_distance(parity, src)))
        cd_cond = float(jnp.mean(chamfer_distance(parity, cond)))
        cds.append((cd_ff, cd_src, cd_cond))
        print(f"pair {i}: CD(fast, parity)={cd_ff:.5f}  "
              f"CD(parity, source)={cd_src:.4f}  "
              f"CD(parity, style)={cd_cond:.4f}", flush=True)
    a = np.array(cds)
    print(f"\nmean CD(fast, parity) = {a[:, 0].mean():.5f} "
          f"(vs {a[:, 1].mean():.3f} / {a[:, 2].mean():.3f} to inputs)")


if __name__ == "__main__":
    main()
