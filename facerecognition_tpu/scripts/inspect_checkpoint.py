"""Checkpoint key inspector (reference scripts/debug_facenet_keys.py).

Prints the tree structure, shapes, and parameter counts of a checkpoint —
flax msgpack, orbax directory, or torch .pth (for porting diagnosis).
"""

from __future__ import annotations

import os
from typing import Any


def summarize_tree(tree: Any, prefix: str = "", lines=None, max_lines: int = 200):
    import numpy as np

    if lines is None:
        lines = []
    if isinstance(tree, dict):
        for k in sorted(tree):
            summarize_tree(tree[k], f"{prefix}/{k}" if prefix else str(k), lines, max_lines)
    else:
        shape = getattr(tree, "shape", None)
        dtype = getattr(tree, "dtype", type(tree).__name__)
        if len(lines) < max_lines:
            lines.append(f"{prefix}  {shape}  {dtype}")
    return lines


def count_params(tree: Any) -> int:
    import numpy as np

    total = 0
    if isinstance(tree, dict):
        return sum(count_params(v) for v in tree.values())
    shape = getattr(tree, "shape", None)
    return int(np.prod(shape)) if shape else 0


def inspect(path: str) -> dict:
    if path.endswith((".pth", ".pt")):
        from facerecognition_tpu.models.port_torch import load_torch_checkpoint

        flat = load_torch_checkpoint(path)
        tree: dict = {}
        for k, v in flat.items():
            node = tree
            parts = k.split(".")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = v
    elif os.path.isdir(path):
        import orbax.checkpoint as ocp

        tree = ocp.StandardCheckpointer().restore(path)
    else:
        from facerecognition_tpu.utils.serialization import load_variables

        tree = load_variables(path)
    return {
        "n_params": count_params(tree),
        "lines": summarize_tree(tree),
    }


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description="Inspect checkpoint keys")
    parser.add_argument("path")
    parser.add_argument("--max-lines", type=int, default=200)
    args = parser.parse_args(argv)
    info = inspect(args.path)
    for line in info["lines"][: args.max_lines]:
        print(line)
    print(f"\ntotal parameters: {info['n_params']:,}")


if __name__ == "__main__":
    main()
