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

Whole-detector lineage checkpoints import completely via
``import_full_detector``: the lineage detector IS a ResNet subclass with
``fpn``/``regressionModel``/``classificationModel`` submodules (SURVEY.md
§1/§2 #2–#4, ``PyramidFeatures``/``RegressionModel``/``ClassificationModel``),
so backbone keys sit at the top level and the neck/heads map 1:1 onto
detjax's ``fpn``/``head`` trees:

  fpn.P{5,4,3}_1          → fpn lateral_p{5,4,3}
  fpn.P{5,4,3}_2          → fpn output_p{5,4,3}
  fpn.P6 / fpn.P7_2       → fpn output_p6 / output_p7
  classificationModel.conv{1..4}/output → head cls_conv{0..3}/cls_out
  regressionModel.conv{1..4}/output     → head box_conv{0..3}/box_out

Channel order needs no permutation: the lineage reshapes its head outputs
(B,H,W,A·K)→(B,·,K) anchor-major, exactly detjax's ``_flatten_level``
order (detjax/models/heads.py).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np


def load_state_dict_file(path: str,
                         allow_pickle: bool = False) -> Dict[str, np.ndarray]:
    """Load a ``torch.save``'d state_dict (or module with ``.state_dict()``)
    into plain numpy arrays. Requires torch (CPU build is enough).

    Loads with ``weights_only=True`` (safe: tensors only). Lineage
    checkpoints saved as whole pickled modules need ``allow_pickle=True``,
    which executes arbitrary code from the file — only enable for trusted
    checkpoints (surfaced as ``--unsafe-pickle`` in the CLIs).
    """
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:  # pickled module / non-tensor payload
        if not allow_pickle:
            raise ValueError(
                f"{path} is not a plain state_dict loadable with "
                "weights_only=True (likely a whole pickled module, which "
                "the reference lineage's per-epoch torch.save produces). "
                "Unpickling it executes code from the file; pass "
                "allow_pickle=True / --unsafe-pickle if you trust it."
            ) from e
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: np.asarray(v.detach().cpu().numpy()) if hasattr(v, "detach")
            else np.asarray(v) for k, v in obj.items()}


def _conv(w: np.ndarray) -> np.ndarray:
    """torch OIHW → flax HWIO."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _torch_resnet_key_map(stage_sizes,
                          block: str = "bottleneck") -> Dict[str, Tuple[str, ...]]:
    """torch state_dict prefix → flax module path under ``backbone``.

    ``block="basic"`` (R18/34): two 3×3 convs per block, and the projection
    shortcut exists only where the shape changes — i.e. NOT on layer1
    (64→64 stride 1), unlike bottleneck blocks whose 4× expansion always
    projects on block 0.
    """
    units = (("conv1", "bn1", "conv2", "bn2")
             if block == "basic"
             else ("conv1", "bn1", "conv2", "bn2", "conv3", "bn3"))
    m: Dict[str, Tuple[str, ...]] = {
        "conv1": ("conv1",),
        "bn1": ("bn1",),
    }
    for s, size in enumerate(stage_sizes):
        for b in range(size):
            flax_block = f"layer{s + 1}_block{b}"
            t = f"layer{s + 1}.{b}"
            for unit in units:
                m[f"{t}.{unit}"] = (flax_block, unit)
            if b == 0 and (block != "basic" or s > 0):
                # projection shortcut exists only on the first block of a
                # stage with a stride and/or channel change — torchvision
                # and detjax.models.resnet agree on this
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
    block: Optional[str] = None,
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

    if stage_sizes is None or block is None:
        from detjax.models.resnet import RESNET_SPECS

        spec_block, spec_sizes = RESNET_SPECS[depth]
        stage_sizes = stage_sizes if stage_sizes is not None else spec_sizes
        block = block if block is not None else spec_block
    key_map = _torch_resnet_key_map(stage_sizes, block=block)

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


def _fpn_head_key_map(num_head_convs: int = 4,
                      min_level: int = 3) -> Dict[str, Tuple[str, ...]]:
    """Lineage FPN/head torch prefixes → detjax module paths (conv layers:
    ``.weight``/``.bias`` become ``kernel``/``bias``)."""
    m: Dict[str, Tuple[str, ...]] = {}
    for lvl in range(min_level, 6):  # laterals + outputs on C3..C5
        m[f"fpn.P{lvl}_1"] = ("fpn", f"lateral_p{lvl}")
        m[f"fpn.P{lvl}_2"] = ("fpn", f"output_p{lvl}")
    m["fpn.P6"] = ("fpn", "output_p6")
    m["fpn.P7_2"] = ("fpn", "output_p7")
    for i in range(num_head_convs):
        m[f"classificationModel.conv{i + 1}"] = ("head", f"cls_conv{i}")
        m[f"regressionModel.conv{i + 1}"] = ("head", f"box_conv{i}")
    m["classificationModel.output"] = ("head", "cls_out")
    m["regressionModel.output"] = ("head", "box_out")
    return m


def _ssd_head_key_map(min_level: int = 3,
                      max_level: int = 7) -> Dict[str, Tuple[str, ...]]:
    """SSD-style head (benchmark config 2): one independent predictor
    pair per pyramid level, no shared tower (detjax/models/heads.py
    ``SSDHead``). Torch-side naming follows the lineage convention of a
    named submodule per predictor; the reference mount is empty so the
    exact reference names are unverifiable (SURVEY.md §2 #5 "unknown —
    VERIFY") — this map defines detjax's canonical lineage-format layout
    for the family, used by both directions of the weight bridge."""
    m: Dict[str, Tuple[str, ...]] = {}
    for lvl in range(min_level, max_level + 1):
        m[f"ssdHead.cls_p{lvl}"] = ("head", f"cls_p{lvl}")
        m[f"ssdHead.box_p{lvl}"] = ("head", f"box_p{lvl}")
    return m


def _head_key_map(family: str, num_head_convs: int, min_level: int,
                  max_level: int) -> Dict[str, Tuple[str, ...]]:
    """FPN + family-specific head key map (the non-backbone detector part).

    The FPN map hardcodes the lineage's P3–P7 pyramid (laterals on C3–C5
    + stride-2 P6/P7 extras); a config with a different pyramid would get
    a silently inconsistent key map, so reject it loudly (ADVICE r4 #5).
    """
    if max_level != 7 or not 3 <= min_level <= 5:
        raise ValueError(
            f"lineage key map covers the P{min_level}..P7 pyramid with "
            f"min_level in 3..5 only; got min_level={min_level}, "
            f"max_level={max_level} — extend _fpn_head_key_map for this "
            "pyramid before importing/exporting")
    fpn_and_head = _fpn_head_key_map(num_head_convs=num_head_convs,
                                     min_level=min_level)
    if family == "retinanet":
        return fpn_and_head
    if family == "ssd":
        m = {k: v for k, v in fpn_and_head.items() if v[0] == "fpn"}
        m.update(_ssd_head_key_map(min_level, max_level))
        return m
    raise ValueError(f"unknown model family {family!r}")


def import_full_detector(
    params: Mapping[str, Any],
    batch_stats: Mapping[str, Any],
    state_dict: Mapping[str, np.ndarray],
    depth: int = 50,
    prefix: str = "",
    strict: bool = True,
    stage_sizes: Optional[Tuple[int, ...]] = None,
    block: Optional[str] = None,
    num_head_convs: int = 4,
    min_level: int = 3,
    max_level: int = 7,
    family: str = "retinanet",
) -> Tuple[dict, dict, Dict[str, list]]:
    """Import a complete lineage detector checkpoint: backbone + FPN + heads.

    ``prefix`` is stripped first; a ``module.`` DataParallel prefix is also
    handled automatically. Backbone keys are expected at the TOP level of
    the state_dict (the lineage detector subclasses ResNet directly).

    Returns ``(new_params, new_batch_stats, report)``; report keys:
    ``imported``, ``missing``, ``unused``.
    """
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}
    if not any(k.startswith("conv1") for k in sd) and any(
            k.startswith("module.") for k in sd):
        sd = {k[len("module."):]: v for k, v in sd.items()
              if k.startswith("module.")}

    params, batch_stats, report = import_resnet_backbone(
        params, batch_stats, sd, depth=depth, strict=strict,
        stage_sizes=stage_sizes, block=block)

    key_map = _head_key_map(family, num_head_convs, min_level, max_level)
    imported, missing, used = (report["imported"], report["missing"],
                               set(report["imported"]))
    for tkey, fpath in key_map.items():
        for suffix, leaf in (("weight", "kernel"), ("bias", "bias")):
            k = f"{tkey}.{suffix}"
            if k not in sd:
                missing.append(k)
                continue
            v = _conv(sd[k]) if leaf == "kernel" else sd[k]
            _set(params, fpath, leaf, v, v.shape)
            used.add(k)
            imported.append(k)
    if strict and missing:
        raise KeyError(
            f"{len(missing)} expected detector weights missing, e.g. "
            f"{missing[:5]} (pass strict=False to ignore)")
    report["unused"] = [
        k for k in sd if k not in used
        and not k.endswith("num_batches_tracked")
        # anchor/decode helpers the lineage registers as buffers
        and not k.startswith(("anchors.", "regressBoxes.", "clipBoxes."))]
    return params, batch_stats, report


def _get(tree, path: Tuple[str, ...], leaf: str) -> np.ndarray:
    node = tree
    for p in path:
        node = node[p]
    return np.asarray(node[leaf])


def export_full_detector(
    params: Mapping[str, Any],
    batch_stats: Mapping[str, Any],
    depth: int = 50,
    stage_sizes: Optional[Tuple[int, ...]] = None,
    block: Optional[str] = None,
    num_head_convs: int = 4,
    min_level: int = 3,
    max_level: int = 7,
    family: str = "retinanet",
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`import_full_detector`: detjax params/batch_stats →
    a lineage/torchvision-format numpy state_dict (conv kernels HWIO→OIHW,
    BN scale/bias/mean/var → weight/bias/running_mean/running_var).

    Two uses: (1) a user migrating OFF the reference can round-trip weights
    both ways; (2) the torch reference-replica parity harness
    (tests/torch_ref/eval_branch.py) runs detjax-TRAINED weights through a
    faithful torch rebuild of the reference's eval branch and loss loop
    (SURVEY.md §3.1/§3.2), so the two stacks can be diffed end to end on
    this box (VERDICT r3 next-1). Round-trip identity is pinned in
    tests/test_torch_e2e.py.
    """
    import jax
    from flax import core as flax_core

    if stage_sizes is None or block is None:
        from detjax.models.resnet import RESNET_SPECS

        spec_block, spec_sizes = RESNET_SPECS[depth]
        stage_sizes = stage_sizes if stage_sizes is not None else spec_sizes
        block = block if block is not None else spec_block

    params = jax.tree.map(
        np.asarray, jax.device_get(flax_core.unfreeze(params)))
    batch_stats = jax.tree.map(
        np.asarray, jax.device_get(flax_core.unfreeze(batch_stats)))

    sd: Dict[str, np.ndarray] = {}
    p_bb = params["backbone"]
    s_bb = batch_stats["backbone"]
    for tkey, fpath in _torch_resnet_key_map(stage_sizes, block=block).items():
        if "bn" in fpath[-1] or fpath[-1].endswith("_bn"):
            sd[f"{tkey}.weight"] = _get(p_bb, fpath, "scale")
            sd[f"{tkey}.bias"] = _get(p_bb, fpath, "bias")
            sd[f"{tkey}.running_mean"] = _get(s_bb, fpath, "mean")
            sd[f"{tkey}.running_var"] = _get(s_bb, fpath, "var")
        else:
            w = _get(p_bb, fpath, "kernel")  # HWIO
            sd[f"{tkey}.weight"] = np.ascontiguousarray(
                np.transpose(w, (3, 2, 0, 1)))
    for tkey, fpath in _head_key_map(
            family, num_head_convs, min_level, max_level).items():
        w = _get(params, fpath, "kernel")
        sd[f"{tkey}.weight"] = np.ascontiguousarray(
            np.transpose(w, (3, 2, 0, 1)))
        sd[f"{tkey}.bias"] = _get(params, fpath, "bias")
    return sd


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


def import_detector_into_variables(variables: Mapping[str, Any],
                                   state_dict: Mapping[str, np.ndarray],
                                   depth: int = 50, **kw) -> dict:
    """Convenience: full-detector import, variables dict in/out (jnp)."""
    import jax
    import jax.numpy as jnp

    p, s, _ = import_full_detector(
        variables["params"], variables.get("batch_stats", {}),
        state_dict, depth=depth, **kw)
    out = dict(variables)
    out["params"] = jax.tree.map(jnp.asarray, p)
    out["batch_stats"] = jax.tree.map(jnp.asarray, s)
    return out
