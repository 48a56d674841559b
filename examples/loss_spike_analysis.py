"""Quantify the train-loss spike mechanism: the Chamfer term vs timestep.

The training loss (reference models/losses.py:66-103 + trainer.py:94-101;
ours: training/trainer.py::compute_losses) adds 0.1 * Chamfer(pred_x0,
x0_coarse) where pred_x0 = (noisy - b*pred_noise) / a with
a = sqrt(alpha_bar_t), b = sqrt(1 - alpha_bar_t). As t -> T the
amplification factor b/a explodes (cosine schedule: ~580 at t=999), so a
batch that happens to sample large t produces a Chamfer term orders of
magnitude above the mean EVEN AT A FIXED, WELL-TRAINED PARAMETER POINT.
The spikes in the e2e proof's train curve are therefore a property of the
inherited loss formulation, not an optimization failure — the L1 term and
the (L1-only) val loss are the convergence signals.

This script measures E[L1], E[Chamfer(pred_x0)] and b/a on a fixed val
batch across a grid of timesteps, writing spike_analysis.json (+ plot)
that makes the mechanism directly visible: chamfer(t) tracks (b/a)^2
while l1(t) stays flat.

  python examples/loss_spike_analysis.py \
      --checkpoint /tmp/pcst_proof/checkpoints/e2e_proof/best_model \
      --data /tmp/pcst_proof/processed/val \
      --outdir docs/artifacts/e2e_training
"""

import argparse
import json
import os
import sys


sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint",
                        default="/tmp/pcst_proof/checkpoints/e2e_proof/"
                                "best_model")
    parser.add_argument("--data", default="/tmp/pcst_proof/processed/val")
    parser.add_argument("--outdir", default="docs/artifacts/e2e_training")
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--t_step", type=int, default=50)
    args = parser.parse_args()

    from pointcloud_style_transfer_tpu.utils.cache import \
        enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from pointcloud_style_transfer_tpu.data import (
        Batcher, HierarchicalPointCloudDataset)
    from pointcloud_style_transfer_tpu.models import make_schedule
    from pointcloud_style_transfer_tpu.models.diffusion import q_sample
    from pointcloud_style_transfer_tpu.models.losses import diffusion_loss
    from pointcloud_style_transfer_tpu.ops import index_points
    from pointcloud_style_transfer_tpu.utils.checkpoint import \
        load_for_inference

    config, model, variables = load_for_inference(args.checkpoint)
    schedule = make_schedule(config)

    ds = HierarchicalPointCloudDataset(
        args.data, use_hierarchical=config.use_hierarchical)
    loader = Batcher(ds, batch_size=min(args.batch, len(ds)), shuffle=False,
                     drop_last=False)
    batch = next(iter(loader))
    sim = jnp.asarray(batch["sim_full"])
    real = jnp.asarray(batch["real_full"])

    @jax.jit
    def terms_at_t(t_scalar, key):
        """The EXACT per-term computation of compute_losses, at a fixed t."""
        B = sim.shape[0]
        k_noise, k_fwd = jax.random.split(key)
        t = jnp.full((B,), t_scalar, jnp.int32)
        noise = jax.random.normal(k_noise, sim.shape, jnp.float32)
        noisy = q_sample(schedule, sim, t, noise)
        pred, idx, _ = model.forward(
            variables, noisy, t, real, key=k_fwd, cond_drop_prob=0.0,
            use_hierarchical=config.use_hierarchical, train=False,
            mutable=False)
        noisy_coarse = index_points(noisy, idx)
        sim_coarse = index_points(sim, idx)
        noise_coarse = index_points(noise, idx)
        a = schedule.sqrt_alphas_cumprod[t][:, None, None]
        b = schedule.sqrt_one_minus_alphas_cumprod[t][:, None, None]
        pred_x0 = (noisy_coarse - b * pred.astype(jnp.float32)) / (a + 1e-8)
        _, loss_dict = diffusion_loss(pred, noise_coarse, pred_x0,
                                      sim_coarse,
                                      chamfer_weight=config.lambda_chamfer)
        amp = (schedule.sqrt_one_minus_alphas_cumprod[t_scalar]
               / schedule.sqrt_alphas_cumprod[t_scalar])
        return loss_dict["noise_loss"], loss_dict["chamfer_loss"], amp

    ts = list(range(0, config.num_timesteps, args.t_step))
    if ts[-1] != config.num_timesteps - 1:
        ts.append(config.num_timesteps - 1)
    rows = []
    for i, t in enumerate(ts):
        l1, cd, amp = terms_at_t(jnp.int32(t), jax.random.PRNGKey(100 + i))
        rows.append({"t": int(t), "l1": float(l1), "chamfer": float(cd),
                     "amplification_b_over_a": float(amp)})
        print(f"t={t:4d}  L1={rows[-1]['l1']:.4f}  "
              f"Chamfer(pred_x0)={rows[-1]['chamfer']:.4g}  "
              f"b/a={rows[-1]['amplification_b_over_a']:.4g}", flush=True)

    os.makedirs(args.outdir, exist_ok=True)
    payload = {
        "explanation": (
            "Chamfer(pred_x0, x0) with pred_x0 = (noisy - b*pred)/a "
            "amplifies prediction error by (b/a)(t); batches sampling "
            "large t therefore spike the train total while the L1 term "
            "stays flat. Inherited from the reference loss "
            "(models/losses.py:66-103 + training/trainer.py:94-101)."),
        "checkpoint": args.checkpoint,
        "rows": rows,
    }
    with open(os.path.join(args.outdir, "spike_analysis.json"), "w") as f:
        json.dump(payload, f, indent=2)

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(7, 4))
        t_arr = [r["t"] for r in rows]
        ax.plot(t_arr, [r["l1"] for r in rows], "o-", label="L1 (noise)")
        ax.plot(t_arr, [r["chamfer"] for r in rows], "s-",
                label="Chamfer(pred_x0)")
        ax.plot(t_arr, [r["amplification_b_over_a"] ** 2 for r in rows],
                "--", label="(b/a)^2 (amplification)")
        ax.set_xlabel("timestep t")
        ax.set_yscale("log")
        ax.legend()
        ax.set_title("loss terms vs t at a fixed trained parameter point")
        fig.tight_layout()
        fig.savefig(os.path.join(args.outdir, "spike_analysis.png"), dpi=110)
    except Exception as e:
        print("plot skipped:", e)
    print(f"done — {args.outdir}/spike_analysis.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
