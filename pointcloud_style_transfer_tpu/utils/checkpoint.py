"""Checkpoint manager (orbax) with the reference's directory contract.

Contract preserved (reference: utils/checkpoint.py:12-150):
* layout ``{checkpoint_dir}/{experiment_name}/ckpt_epoch_{epoch:04d}`` plus a
  ``best_model`` copy updated on improvement;
* payload: model params, optimizer state, EMA shadow params, batch stats,
  AND the config (inference/test rebuild the model from the checkpointed
  config — reference scripts/inference.py:95, scripts/test.py:42);
* ``load()`` auto-detects the latest checkpoint by parsing the epoch number
  from the directory name and returns the next epoch to run.

Array pytrees go through orbax; the epoch / config / best-val-loss metadata
lives in a ``meta.json`` sidecar (orbax restore templates must be arrays).
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from ..config import Config

_EPOCH_RE = re.compile(r"ckpt_epoch_(\d+)$")


class CheckpointManager:
    def __init__(self, checkpoint_dir: str, experiment_name: str,
                 max_to_keep: Optional[int] = None):
        self.base_dir = os.path.abspath(
            os.path.join(checkpoint_dir, experiment_name))
        os.makedirs(self.base_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self.max_to_keep = max_to_keep

    # -- paths ---------------------------------------------------------------
    def _epoch_dir(self, epoch: int) -> str:
        return os.path.join(self.base_dir, f"ckpt_epoch_{epoch:04d}")

    @property
    def best_dir(self) -> str:
        return os.path.join(self.base_dir, "best_model")

    def list_epochs(self):
        out = []
        if not os.path.isdir(self.base_dir):
            return out
        for name in os.listdir(self.base_dir):
            m = _EPOCH_RE.match(name)
            if m and os.path.isdir(os.path.join(self.base_dir, name)):
                out.append(int(m.group(1)))
        return sorted(out)

    # -- save / load ---------------------------------------------------------
    def save(self, state: Dict[str, Any], epoch: int, config: Config,
             is_best: bool = False, best_val_loss: float = float("inf")
             ) -> str:
        """state: pytree of arrays only (params/opt_state/ema/batch_stats)."""
        path = self._epoch_dir(epoch)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, state)
        self._ckptr.wait_until_finished()
        meta = {"epoch": epoch, "config": config.to_dict(),
                "best_val_loss": best_val_loss}
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2)
        if is_best:
            if os.path.exists(self.best_dir):
                shutil.rmtree(self.best_dir)
            shutil.copytree(path, self.best_dir)
        if self.max_to_keep:
            for old in self.list_epochs()[:-self.max_to_keep]:
                shutil.rmtree(self._epoch_dir(old), ignore_errors=True)
        return path

    def restore(self, path: str, state_template: Dict[str, Any]
                ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        """Restore (state, meta) from an explicit checkpoint directory."""
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state_template)
        state = self._ckptr.restore(path, abstract)
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        return state, meta

    def load_latest(self, state_template: Dict[str, Any]
                    ) -> Tuple[Optional[Dict[str, Any]], Dict[str, Any], int]:
        """Find + restore the newest checkpoint; returns
        (state | None, meta, next_epoch) — next_epoch is 0 when nothing is
        found (reference: utils/checkpoint.py:69-144)."""
        epochs = self.list_epochs()
        if not epochs:
            return None, {}, 0
        state, meta = self.restore(self._epoch_dir(epochs[-1]),
                                   state_template)
        return state, meta, epochs[-1] + 1


def load_checkpoint_config(path: str) -> Config:
    """Read the Config embedded in a checkpoint directory."""
    with open(os.path.join(path, "meta.json")) as f:
        return Config.from_dict(json.load(f)["config"])


def load_for_inference(ckpt_dir: str):
    """Rebuild (config, model, eval variables) from a checkpoint directory.

    EMA weights are preferred, falling back to the raw params (reference:
    scripts/inference.py:98-113). Returns variables suitable for eval
    ({'params', 'batch_stats'}).
    """
    from ..models import PointCloudDiffusionModel
    from ..ops.distance import set_pallas_enabled
    from ..training.ema import ema_init
    from ..training.trainer import make_optimizer

    config = load_checkpoint_config(ckpt_dir)
    set_pallas_enabled(config.use_pallas)
    model = PointCloudDiffusionModel(config)
    variables = model.init(jax.random.PRNGKey(config.seed),
                           example_points=min(config.global_points, 4096))
    params = variables["params"]
    tx = make_optimizer(config)
    template = {
        "params": params,
        "batch_stats": variables.get("batch_stats", {}),
        "opt_state": tx.init(params),
        "ema_params": ema_init(params),
    }
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), template)
    state = ocp.StandardCheckpointer().restore(ckpt_dir, abstract)
    eval_vars = {"params": state.get("ema_params") or state["params"],
                 "batch_stats": state["batch_stats"]}
    return config, model, eval_vars
