"""PyTorch→JAX weight importer (SURVEY.md §5.4).

The reference relies on torchvision's ImageNet-pretrained ResNets
(SURVEY.md §3.5 ``resnet50(..., pretrained=True)``); torchvision is absent
here [ENV], so pretrained backbones arrive as a user-provided
``state_dict`` file (``.pt``/``.pth`` saved with ``torch.save``) and are
name-mapped into the flax PyTree:

  torch ``conv*.weight [O,I,kH,kW]``      → flax ``kernel [kH,kW,I,O]``
  torch ``bn*.weight/bias``               → flax ``scale/bias``
  torch ``bn*.running_mean/running_var``  → flax ``batch_stats mean/var``
  torch ``layer{s}.{b}.downsample.0/1``   → flax ``downsample_conv/bn``

Also importable: whole-detector checkpoints from the reference lineage, as
long as keys follow the torchvision ResNet naming for the backbone (other
keys are reported, not imported — the FPN/head geometries here are
TPU-native and trained fresh or via detjax checkpoints).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np


def load_state_dict_file(path: str) -> Dict[str, np.ndarray]:
    """Load a ``torch.save``'d state_dict (or module with ``.state_dict()``)
    into plain numpy arrays. Requires torch (CPU build is enough)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: np.asarray(v.detach().cpu().numpy()) if hasattr(v, "detach")
            else np.asarray(v) for k, v in obj.items()}


def _conv(w: np.ndarray) -> np.ndarray:
    """torch OIHW → flax HWIO."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _torch_resnet_key_map(stage_sizes) -> Dict[str, Tuple[str, ...]]:
    """torch state_dict prefix → flax module path under ``backbone``."""
    m: Dict[str, Tuple[str, ...]] = {
        "conv1": ("conv1",),
        "bn1": ("bn1",),
    }
    for s, size in enumerate(stage_sizes):
        for b in range(size):
            flax_block = f"layer{s + 1}_block{b}"
            t = f"layer{s + 1}.{b}"
            for unit in ("conv1", "bn1", "conv2", "bn2", "conv3", "bn3"):
                m[f"{t}.{unit}"] = (flax_block, unit)
            m[f"{t}.downsample.0"] = (flax_block, "downsample_conv")
            m[f"{t}.downsample.1"] = (flax_block, "downsample_bn")
    return m


def _set(tree: dict, path: Tuple[str, ...], leaf: str, value, expect_shape):
    node = tree
    for p in path:
        if p not in node:
            raise KeyError(f"flax tree is missing module {'/'.join(path)}")
        node = node[p]
    if leaf not in node:
        raise KeyError(f"{'/'.join(path)} has no leaf {leaf!r}")
    if tuple(node[leaf].shape) != tuple(expect_shape):
        raise ValueError(
            f"shape mismatch at {'/'.join(path)}/{leaf}: "
            f"flax {tuple(node[leaf].shape)} vs torch {tuple(expect_shape)}")
    node[leaf] = value.astype(np.asarray(node[leaf]).dtype)


def import_resnet_backbone(
    params: Mapping[str, Any],
    batch_stats: Mapping[str, Any],
    state_dict: Mapping[str, np.ndarray],
    depth: int = 50,
    backbone_key: str = "backbone",
    prefix: str = "",
    strict: bool = True,
    stage_sizes: Optional[Tuple[int, ...]] = None,
) -> Tuple[dict, dict, Dict[str, list]]:
    """Copy torchvision-format ResNet weights into detjax params/batch_stats.

    Args:
      params / batch_stats: flax collections (as returned by model init).
      state_dict: torch name → numpy array. ``prefix`` is stripped from keys
        (e.g. ``"module.backbone."`` for lineage whole-model checkpoints).
      strict: raise if any expected backbone weight is missing.

    Returns ``(new_params, new_batch_stats, report)`` where report lists
    ``imported``, ``missing`` (expected but absent) and ``unused`` torch keys.
    """
    import jax
    from flax import core as flax_core

    if stage_sizes is None:
        stage_sizes = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[depth]
    key_map = _torch_resnet_key_map(stage_sizes)

    params = jax.tree.map(
        np.asarray, jax.device_get(flax_core.unfreeze(params)))
    batch_stats = jax.tree.map(
        np.asarray, jax.device_get(flax_core.unfreeze(batch_stats)))
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}

    imported, missing, used = [], [], set()
    p_bb = params.get(backbone_key)
    s_bb = batch_stats.get(backbone_key)
    if p_bb is None:
        raise KeyError(f"params has no {backbone_key!r} subtree")

    for tkey, fpath in key_map.items():
        is_bn = "bn" in fpath[-1] or fpath[-1].endswith("_bn")
        if is_bn:
            pieces = {
                "weight": (p_bb, "scale"),
                "bias": (p_bb, "bias"),
                "running_mean": (s_bb, "mean"),
                "running_var": (s_bb, "var"),
            }
            for suffix, (tree, leaf) in pieces.items():
                k = f"{tkey}.{suffix}"
                if k not in sd:
                    missing.append(k)
                    continue
                _set(tree, fpath, leaf, sd[k], sd[k].shape)
                used.add(k)
                imported.append(k)
        else:
            k = f"{tkey}.weight"
            if k not in sd:
                missing.append(k)
                continue
            w = _conv(sd[k])
            _set(p_bb, fpath, "kernel", w, w.shape)
            used.add(k)
            imported.append(k)

    if strict and missing:
        raise KeyError(
            f"{len(missing)} expected backbone weights missing, e.g. "
            f"{missing[:5]} (pass strict=False to ignore)")
    unused = [k for k in sd
              if k not in used and not k.startswith(("fc.", "head", "fpn"))
              and not k.endswith("num_batches_tracked")]
    report = {"imported": imported, "missing": missing, "unused": unused}
    return params, batch_stats, report


def import_into_variables(variables: Mapping[str, Any],
                          state_dict: Mapping[str, np.ndarray],
                          depth: int = 50, **kw) -> dict:
    """Convenience: variables dict in, variables dict out (jnp arrays)."""
    import jax.numpy as jnp
    import jax

    p, s, _ = import_resnet_backbone(
        variables["params"], variables.get("batch_stats", {}),
        state_dict, depth=depth, **kw)
    out = dict(variables)
    out["params"] = jax.tree.map(jnp.asarray, p)
    out["batch_stats"] = jax.tree.map(jnp.asarray, s)
    return out
