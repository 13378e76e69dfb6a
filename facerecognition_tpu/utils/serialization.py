"""Flax variable (de)serialization — msgpack on disk.

Lightweight checkpoint format for model params/batch_stats (the full
training checkpoint with optimizer state and resume metadata lives in
`facerecognition_tpu.training.checkpoint` on orbax). The reference's
equivalent is ``torch.save``/``torch.load`` of state dicts.
"""

from __future__ import annotations

import os
from typing import Any

import flax.serialization
import jax


def save_variables(path: str, variables: Any) -> None:
    """Serialize a variables pytree (params/batch_stats) to msgpack bytes."""
    host = jax.tree_util.tree_map(lambda x: jax.device_get(x), variables)
    data = flax.serialization.msgpack_serialize(host)
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)


def load_variables(path: str) -> Any:
    """Load a variables pytree saved by :func:`save_variables`."""
    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())
