"""Training checkpoints (orbax-backed) with the reference's resume semantics.

The reference's ArcFace checkpoints carry model/optimizer/scheduler/scaler
state, epoch, best metrics, config, history, and global step, saved as
best/last/periodic with keep_last_n GC (train_arcface.py:753-806); resume
restores everything and can auto-extend epochs (:949-1024). This manager
reproduces that on orbax:

- ``save(tag, state_tree, metadata)`` where tag ∈ {'best', 'last',
  'epoch_<N>'}; periodic checkpoints are GC'd beyond ``keep_last_n``.
- ``restore(tag, target)`` returns (state_tree, metadata).
- metadata (epoch, best metrics, config, history, rng seeds, controller
  states) rides in a JSON sidecar so it stays human-inspectable.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep_last_n: int = 3):
        self.directory = os.path.abspath(directory)
        self.keep_last_n = keep_last_n
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def _path(self, tag: str) -> str:
        return os.path.join(self.directory, f"ckpt_{tag}")

    def _meta_path(self, tag: str) -> str:
        return os.path.join(self.directory, f"ckpt_{tag}.meta.json")

    def save(self, tag: str, state_tree: Any, metadata: Optional[dict] = None) -> None:
        # Write-then-rename: deleting the old checkpoint before writing the
        # new one would destroy BOTH if the process dies mid-save (the axon
        # session can wedge — CLAUDE.md). os.replace of the tmp dir over
        # the old path is atomic on one filesystem.
        path = self._path(tag)
        tmp = path + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        host_tree = jax.tree_util.tree_map(jax.device_get, state_tree)
        self._ckpt.save(tmp, host_tree)
        self._ckpt.wait_until_finished()
        if os.path.exists(path):
            shutil.rmtree(path)
        os.replace(tmp, path)
        with open(self._meta_path(tag), "w") as f:
            json.dump(metadata or {}, f, indent=2, default=str)
        if tag.startswith("epoch_"):
            self._gc_periodic()

    def restore(self, tag: str, target: Optional[Any] = None):
        """Returns (state_tree, metadata dict). target = example pytree for
        safe typed restore (orbax StandardCheckpointer contract)."""
        path = self._path(tag)
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        tree = self._ckpt.restore(path, target)
        meta = {}
        if os.path.exists(self._meta_path(tag)):
            with open(self._meta_path(tag)) as f:
                meta = json.load(f)
        return tree, meta

    def exists(self, tag: str) -> bool:
        return os.path.exists(self._path(tag))

    def latest_epoch_tag(self) -> Optional[str]:
        epochs = self._epoch_tags()
        return f"epoch_{epochs[-1]}" if epochs else None

    def _epoch_tags(self) -> list[int]:
        out = []
        for name in os.listdir(self.directory):
            m = re.fullmatch(r"ckpt_epoch_(\d+)", name)
            if m and os.path.isdir(os.path.join(self.directory, name)):
                out.append(int(m.group(1)))
        return sorted(out)

    def _gc_periodic(self) -> None:
        epochs = self._epoch_tags()
        for e in epochs[: max(len(epochs) - self.keep_last_n, 0)]:
            shutil.rmtree(self._path(f"epoch_{e}"), ignore_errors=True)
            try:
                os.remove(self._meta_path(f"epoch_{e}"))
            except FileNotFoundError:
                pass
