"""Orbax checkpointing with best-metric export and partial restores.

Re-provides the reference's checkpoint surface (SURVEY section 5 /
section 3.5):

* periodic save with ``max_to_keep`` (TFM controller behavior),
* best-checkpoint export on an eval metric with higher/lower comparator
  (``best_checkpoint_export_subdir`` yaml keys),
* pretrain -> finetune partial restore: only the ``encoder`` subtree and
  name-matched ``cls_head_*`` subtrees are mapped
  (``src/tasks/classification.py:229-253``),
* whole-model warm start with expect_partial semantics
  (``src/tasks/pretraining.py:341-351``).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import flax
import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 32,
                 async_save: bool = False):
        """``async_save=True`` lets Orbax serialize in a background
        thread so the training loop resumes immediately (the save
        overlaps the next steps_per_loop window); callers must
        ``wait_until_finished()`` before process exit / reading the
        checkpoint back.  Orbax itself barriers a new save on the
        previous one, so back-to-back saves stay ordered."""
        self.directory = os.path.abspath(directory)
        self.async_save = async_save
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, params: Any, opt_state: Any = None) -> None:
        payload = {"params": params}
        if opt_state is not None:
            payload["opt_state"] = opt_state
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        if not self.async_save:
            self._mgr.wait_until_finished()

    def wait_until_finished(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, step: Optional[int] = None, template: Any = None) -> Dict:
        """Restores a checkpoint; a template narrower than the on-disk tree
        (e.g. params-only against a {params, opt_state} training ckpt, the
        predict-after-train flow) restores just the requested subtree."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        if template is not None:
            try:
                return self._mgr.restore(step, args=ocp.args.StandardRestore(template))
            except ValueError:
                # Narrower template than on disk (e.g. params-only vs a
                # {params, opt_state} training checkpoint): restore the
                # full tree untyped and take the requested subtrees.
                full = self._mgr.restore(step)
                return {k: full[k] for k in template}
        return self._mgr.restore(step)


class BestCheckpointExporter:
    """Keeps the best checkpoint by an eval metric (TFM parity)."""

    def __init__(self, export_dir: str, metric_name: str, comp: str = "higher"):
        self.export_dir = os.path.abspath(export_dir)
        self.metric_name = metric_name
        self.comp = comp
        os.makedirs(self.export_dir, exist_ok=True)
        self._info_path = os.path.join(self.export_dir, "best_info.json")

    def _best_so_far(self) -> Optional[float]:
        if os.path.exists(self._info_path):
            with open(self._info_path) as f:
                return json.load(f)["metric_value"]
        return None

    def maybe_export(self, step: int, metrics: Dict[str, float], params: Any) -> bool:
        value = metrics.get(self.metric_name)
        if value is None:
            return False
        best = self._best_so_far()
        better = (
            best is None
            or (self.comp == "higher" and value > best)
            or (self.comp == "lower" and value < best)
        )
        if not better:
            return False
        ckptr = ocp.StandardCheckpointer()
        path = os.path.join(self.export_dir, "best_ckpt")
        ckptr.save(path, {"params": params}, force=True)
        ckptr.wait_until_finished()
        with open(self._info_path, "w") as f:
            json.dump({"step": step, "metric_name": self.metric_name,
                       "metric_value": float(value)}, f)
        return True


def restore_encoder_and_heads(target_params: Any, pretrain_params: Any) -> Any:
    """Pretrain -> finetune partial restore.

    Maps the ``encoder`` subtree plus any ``cls_head_<name>`` subtrees
    whose names match between the two models; everything else keeps the
    target's (fresh) initialization.  Parity:
    ``src/tasks/classification.py:229-253``.
    """
    src = flax.traverse_util.flatten_dict(
        pretrain_params["params"] if "params" in pretrain_params else pretrain_params
    )
    tgt_tree = target_params["params"] if "params" in target_params else target_params
    tgt = flax.traverse_util.flatten_dict(tgt_tree)

    restored = {}
    for path, value in tgt.items():
        if path[0] == "encoder" or str(path[0]).startswith("cls_head_"):
            if path in src:
                if np.shape(src[path]) != np.shape(value):
                    raise ValueError(
                        f"shape mismatch restoring {path}: "
                        f"{np.shape(src[path])} vs {np.shape(value)}"
                    )
                restored[path] = src[path]
                continue
        restored[path] = value
    out = flax.traverse_util.unflatten_dict(restored)
    return {"params": out} if "params" in target_params else out


def count_restored(target_params: Any, pretrain_params: Any) -> int:
    src = flax.traverse_util.flatten_dict(
        pretrain_params["params"] if "params" in pretrain_params else pretrain_params
    )
    tgt = flax.traverse_util.flatten_dict(
        target_params["params"] if "params" in target_params else target_params
    )
    return sum(
        1
        for path in tgt
        if (path[0] == "encoder" or str(path[0]).startswith("cls_head_"))
        and path in src
    )
