"""PyTorch checkpoint → Flax params porting.

Mechanical key remapping + tensor transposition so reference-trained
checkpoints (ArcFace ResNet50, FaceNet InceptionResnetV1) load into the Flax
models for numeric-parity validation. Plays the role the reference's flexible
checkpoint loader plays (models/facenet/checkpoint_utils.py:46-99 — automatic
key-prefix remap, filtered strict=False load), generalized to the torch→JAX
boundary.

Tensor layout rules:
- Conv2d weight  (O, I, kH, kW) → Flax kernel (kH, kW, I, O)
- Linear weight  (O, I)         → Flax kernel (I, O)
- BatchNorm weight/bias → params scale/bias; running_mean/var → batch_stats

No torch import is required at module load — state dicts are accepted as
any mapping of name → array-like (e.g. ``torch.load(...)`` results are fine;
tensors are converted via ``numpy()``).
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def _to_np(t: Any) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _set(tree: dict, path: list[str], value: np.ndarray) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _convert_entry(flat_key: str, value: np.ndarray):
    """Map one torch state-dict entry to (collection, path, tensor).

    ``flat_key`` uses '/'-separated *flax* module names with a trailing torch
    param name (weight/bias/running_mean/running_var).
    Returns None for entries to drop (num_batches_tracked).
    """
    *mods, leaf = flat_key.split("/")
    if leaf == "num_batches_tracked":
        return None
    if leaf == "running_mean":
        return ("batch_stats", mods + ["mean"], value)
    if leaf == "running_var":
        return ("batch_stats", mods + ["var"], value)
    if leaf == "weight":
        if mods and mods[-1] == "arcface":
            # ArcMargin head: the flax param is literally named 'weight'
            # with torch's (C, D) layout — no rename, no transpose
            # (arc_margin_logits normalizes rows; transposing silently
            # dropped the margin head from ported checkpoints).
            return ("params", mods + ["weight"], value)
        if value.ndim == 4:  # conv OIHW → HWIO
            return ("params", mods + ["kernel"], value.transpose(2, 3, 1, 0))
        if value.ndim == 2:  # linear OI → IO
            return ("params", mods + ["kernel"], value.transpose(1, 0))
        if value.ndim == 1:  # batchnorm scale
            return ("params", mods + ["scale"], value)
    if leaf == "bias":
        return ("params", mods + ["bias"], value)
    # ArcMargin weight kept as-is (C, D) — handled by caller naming.
    return ("params", mods + [leaf], value)


def port_state_dict(
    state_dict: Mapping[str, Any], key_map: "callable[[str], str | None]"
) -> dict:
    """Port a torch state dict into a flax variables dict.

    Args:
      state_dict: torch-style flat mapping.
      key_map: maps a torch key (without param leaf) to a '/'-joined flax
        module path, or None to drop the entry.

    Returns:
      {"params": {...}, "batch_stats": {...}} nested dict of numpy arrays.
    """
    out: dict[str, dict] = {"params": {}, "batch_stats": {}}
    for tk, tv in state_dict.items():
        head, _, leaf = tk.rpartition(".")
        mapped = key_map(head)
        if mapped is None:
            continue
        entry = _convert_entry(f"{mapped}/{leaf}", _to_np(tv))
        if entry is None:
            continue
        coll, path, val = entry
        _set(out[coll], path, val)
    if not out["batch_stats"]:
        del out["batch_stats"]
    return out


# ---------------------------------------------------------------------------
# Key maps for the three reference checkpoint families.
# ---------------------------------------------------------------------------


def resnet50_key_map(torch_key: str) -> str | None:
    """torchvision resnet50 keys → ResNet50Backbone module paths.

    ``layer{s}.{b}.conv1`` → ``layer{s}_{b}/conv1``;
    ``layer{s}.{b}.downsample.0/1`` → ``layer{s}_{b}/downsample_conv|bn``;
    ``fc`` (classifier) dropped.
    """
    if torch_key.startswith("fc"):
        return None
    m = re.fullmatch(r"layer(\d)\.(\d+)\.(.+)", torch_key)
    if m:
        stage, block, rest = m.groups()
        rest = rest.replace("downsample.0", "downsample_conv").replace(
            "downsample.1", "downsample_bn"
        )
        return f"layer{stage}_{block}/" + rest.replace(".", "/")
    return torch_key.replace(".", "/")


def arcface_key_map(torch_key: str) -> str | None:
    """Reference ArcFaceModel checkpoint keys → flax ArcFaceModel paths.

    Reference layout (models/arcface/arcface_model.py:135-202):
    ``backbone.<resnet>``, ``bn1``, ``fc``, ``bn2``, ``arcface.weight``.
    """
    if torch_key.startswith("backbone."):
        inner = resnet50_key_map(torch_key[len("backbone.") :])
        # avgpool has no params; resnet fc dropped by resnet50_key_map
        return None if inner is None else f"backbone/{inner}"
    if torch_key in ("bn1", "bn2", "fc", "arcface"):
        return torch_key
    return torch_key.replace(".", "/")


def inception_resnet_v1_key_map(torch_key: str) -> str | None:
    """facenet-pytorch InceptionResnetV1 keys → flax InceptionResnetV1 paths.

    ``repeat_1.0.branch1.0.conv`` → ``repeat_1_0/branch1_0/conv``;
    ``mixed_7a.branch0.1`` → ``mixed_7a/branch0_1``; ``logits`` dropped
    (classify head, unused — reference loads classify=False,
    models/facenet/facenet_model.py:12-16).
    """
    if torch_key.startswith("logits"):
        return None
    k = re.sub(r"^repeat_(\d)\.(\d+)\.", r"repeat_\1_\2.", torch_key)
    # Sequential branch indices: branchN.M → branchN_M
    k = re.sub(r"branch(\d)\.(\d+)", r"branch\1_\2", k)
    return k.replace(".", "/")


def facenet_wrapper_key_map(torch_key: str) -> str | None:
    """Reference FaceNetModel checkpoints (models/facenet/facenet_model.py):
    ``model.<irv1>`` or remapped ``backbone.<irv1>`` prefixes + optional
    ``projection`` — the prefix tolerance mirrors
    checkpoint_utils.load_facenet_checkpoint_flexible (:46-74)."""
    for prefix in ("model.", "backbone.", "module."):
        if torch_key.startswith(prefix):
            inner = inception_resnet_v1_key_map(torch_key[len(prefix) :])
            return None if inner is None else f"backbone/{inner}"
    if torch_key.startswith("projection"):
        return torch_key.replace(".", "/")
    inner = inception_resnet_v1_key_map(torch_key)
    return None if inner is None else f"backbone/{inner}"


# ---------------------------------------------------------------------------
# Flax → PyTorch export (inverse of the porting path), so weights trained in
# this framework load back into the reference stack (same state-dict layout
# the reference saves: models/arcface/train_arcface.py:755-773 stores
# model_state_dict with backbone./bn1/fc/bn2/arcface.weight keys;
# models/facenet/facenet_model.py wraps InceptionResnetV1 as ``model.``).
# ---------------------------------------------------------------------------


def _flatten(tree: Mapping, prefix: tuple = ()):
    for k in sorted(tree):
        v = tree[k]
        if isinstance(v, Mapping):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), np.asarray(v)


def export_state_dict(
    variables: Mapping,
    inverse_path: "callable[[str], str | None]",
    with_batches_tracked: bool = True,
) -> dict:
    """Flax ``{'params', 'batch_stats'}`` → torch-style flat state dict.

    Exact inverse of :func:`port_state_dict` (layout rules in the module
    docstring, reversed): conv kernels HWIO→OIHW, linear kernels IO→OI, BN
    scale→weight + stats→running_mean/var. ``num_batches_tracked`` (dropped
    on port) is synthesized as 0 so ``load_state_dict(strict=True)`` works.
    The ArcMargin head's ``weight`` param is passed through verbatim (it is
    stored in torch's (C, D) layout on both sides).
    """
    out: dict[str, np.ndarray] = {}
    for path, val in _flatten(variables.get("params", {})):
        mods, leaf = path[:-1], path[-1]
        tpath = inverse_path("/".join(mods))
        if tpath is None:
            continue
        if leaf == "kernel":
            if val.ndim == 4:  # HWIO → OIHW
                out[f"{tpath}.weight"] = val.transpose(3, 2, 0, 1)
            else:  # IO → OI
                out[f"{tpath}.weight"] = val.transpose(1, 0)
        elif leaf == "scale":
            out[f"{tpath}.weight"] = val
        else:  # bias, or the margin head's verbatim 'weight'
            out[f"{tpath}.{leaf}"] = val
    for path, val in _flatten(variables.get("batch_stats", {})):
        mods, leaf = path[:-1], path[-1]
        tpath = inverse_path("/".join(mods))
        if tpath is None:
            continue
        name = {"mean": "running_mean", "var": "running_var"}.get(leaf)
        if name is None:
            continue
        out[f"{tpath}.{name}"] = val
        if with_batches_tracked:
            out.setdefault(
                f"{tpath}.num_batches_tracked", np.asarray(0, np.int64)
            )
    return out


def resnet50_inverse_path(path: str) -> str:
    """Inverse of :func:`resnet50_key_map` on module paths."""
    segs = []
    for s in path.split("/"):
        s = s.replace("downsample_conv", "downsample.0").replace(
            "downsample_bn", "downsample.1"
        )
        m = re.fullmatch(r"layer(\d)_(\d+)", s)
        if m:
            s = f"layer{m.group(1)}.{m.group(2)}"
        segs.append(s)
    return ".".join(segs)


def arcface_inverse_path(path: str) -> str:
    """Inverse of :func:`arcface_key_map` on module paths."""
    if path.startswith("backbone/"):
        return "backbone." + resnet50_inverse_path(path[len("backbone/") :])
    return path.replace("/", ".")


def inception_resnet_v1_inverse_path(path: str) -> str:
    """Inverse of :func:`inception_resnet_v1_key_map` on module paths."""
    segs = []
    for s in path.split("/"):
        m = re.fullmatch(r"repeat_(\d)_(\d+)", s)
        if m:
            s = f"repeat_{m.group(1)}.{m.group(2)}"
        m = re.fullmatch(r"branch(\d)_(\d+)", s)
        if m:
            s = f"branch{m.group(1)}.{m.group(2)}"
        segs.append(s)
    return ".".join(segs)


def facenet_inverse_path(path: str, prefix: str = "model.") -> str:
    """Inverse of :func:`facenet_wrapper_key_map` (reference ``model.``
    prefix on the backbone; ``projection`` stays top-level)."""
    if path.startswith("backbone/"):
        return prefix + inception_resnet_v1_inverse_path(
            path[len("backbone/") :]
        )
    return path.replace("/", ".")


def export_arcface_state_dict(variables: Mapping) -> dict:
    """ArcFaceModel variables → reference-layout torch state dict."""
    return export_state_dict(variables, arcface_inverse_path)


def export_facenet_state_dict(
    variables: Mapping, prefix: str = "model."
) -> dict:
    """FaceNet variables → reference-layout torch state dict (pass
    ``prefix=''`` for a bare InceptionResnetV1 layout)."""
    return export_state_dict(
        variables, lambda p: facenet_inverse_path(p, prefix)
    )


def save_torch_checkpoint(
    path: str, state_dict: Mapping, wrapper_key: str = "model_state_dict"
) -> None:
    """Write a ``.pth`` the reference's loaders accept (tensors under
    ``model_state_dict``, like train_arcface.py:755-773 saves)."""
    import torch  # local import: only needed on the exporting path

    # np.array copies: msgpack-loaded arrays are read-only views, which
    # torch.from_numpy would alias (and warn about)
    tensors = {k: torch.from_numpy(np.array(v)) for k, v in state_dict.items()}
    torch.save({wrapper_key: tensors} if wrapper_key else tensors, path)


def load_torch_checkpoint(path: str) -> dict:
    """Load a .pth/.pt checkpoint into a flat numpy state dict (host-side).

    Handles the reference's nesting conventions: raw state dicts and
    {'model_state_dict': ...} / {'state_dict': ...} wrappers
    (models/arcface/train_arcface.py:755-773 stores model_state_dict).
    """
    import torch  # local import: only needed on the porting path

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model_state_dict", "state_dict", "model"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
            break
    return {k: _to_np(v) for k, v in obj.items()}
