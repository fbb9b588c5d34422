"""Checkpointing: orbax for native checkpoints, torch-pkl import for
reference weights.

Rebuilds the reference's checkpoint story (SURVEY.md section 5): per-epoch
state_dict saves (train.py:181-189) become orbax pytree checkpoints, and the
lenient suffix-matching loader (TartanVO.py:49-87) -- which lets flow-only /
pose-only / full-VONet pkls be mixed and matched -- is reproduced against
translated torch key names.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# flax path -> torch state_dict key translation
# ---------------------------------------------------------------------------

def _leaf_to_torch(leaf: str) -> str:
    return {
        "kernel": "weight", "bias": "bias", "scale": "weight",
        "mean": "running_mean", "var": "running_var",
    }[leaf]


_UNC_IDX = {"conv0": "0", "conv1": "2", "conv2": "4"}


def _pwcnet_key(parts: Tuple[str, ...]) -> str:
    # ('conv1a', 'conv') -> conv1a.0 ; ('predict_flow6',) -> predict_flow6
    # uncertainty heads (PWCNet.py:22-33,39-52):
    #   ('unc6', 'conv0') -> predict_flow6.unc.0 ; dc_unc7 -> dc_conv7.unc.*
    m = re.fullmatch(r"unc(\d)", parts[0])
    if m and len(parts) == 2:
        return f"predict_flow{m.group(1)}.unc.{_UNC_IDX[parts[1]]}"
    if parts[0] == "dc_unc7" and len(parts) == 2:
        return f"dc_conv7.unc.{_UNC_IDX[parts[1]]}"
    if len(parts) == 2 and parts[1] == "conv":
        return parts[0] + ".0"
    return ".".join(parts)


def _voflownet_key(parts: Tuple[str, ...]) -> str:
    if parts[0] == "feat_net":
        sub = parts[1]
        m = re.fullmatch(r"head(\d)", sub)
        if m:
            return f"feat_net.{m.group(1)}.0"
        m = re.fullmatch(r"layer(\d+)_block(\d+)", sub)
        if m:
            li, bi = int(m.group(1)), int(m.group(2))
            rest = parts[2:]
            base = f"feat_net.{3 + li}.{bi}"
            if rest[0] == "conv1":
                return base + ".conv1.0"
            if rest[0] == "conv2":
                return base + ".conv2"
            if rest[0] == "downsample":
                return base + ".downsample"
    m = re.fullmatch(r"(trans|rot)_fc(\d)", parts[0])
    if m:
        head = "voflow_trans" if m.group(1) == "trans" else "voflow_rot"
        i = int(m.group(2)) - 1
        return f"{head}.{i}.0" if i < 2 else f"{head}.{i}"
    return ".".join(parts)


def _stereonet_key(parts: Tuple[str, ...]) -> str:
    if parts[0] == "feature_extraction":
        sub = parts[1]
        m = re.fullmatch(r"firstconv_(\d)", sub)
        if m:
            base = f"feature_extraction.firstconv.{2 * int(m.group(1))}"
            return base + (".0" if parts[2] == "conv" else ".1")
        m = re.fullmatch(r"layer(\d)_block(\d+)", sub)
        if m:
            base = f"feature_extraction.layer{m.group(1)}.{m.group(2)}"
            rest = parts[2:]
            if rest[0] == "conv1":
                return base + (".conv1.0.0" if rest[1] == "conv"
                               else ".conv1.0.1")
            if rest[0] == "conv2":
                return base + (".conv2.0" if rest[1] == "conv" else ".conv2.1")
            if rest[0] == "downsample_conv":
                return base + ".downsample.0"
            if rest[0] == "downsample_bn":
                return base + ".downsample.1"
        m = re.fullmatch(r"branch(\d)_conv", sub)
        if m:
            base = f"feature_extraction.branch{m.group(1)}.1"
            return base + (".0" if parts[2] == "conv" else ".1")
        if sub == "lastconv_0":
            return "feature_extraction.lastconv.0" + (
                ".0" if parts[2] == "conv" else ".1")
        if sub == "lastconv_1":
            return "feature_extraction.lastconv.2"
    # SSP branches: conv_c2_SSP/branchN_conv -> conv_c2_SSP.branchN.1
    out = []
    for p in parts:
        m = re.fullmatch(r"branch(\d)_conv", p)
        out.append(f"branch{m.group(1)}.1" if m else p)
    return ".".join(out)


def _psmnet_key(parts: Tuple[str, ...]) -> str:
    """PSMNet alternates (PSM/{basic,stackhourglass}.py) name translation.

    torch containers: dresN/classifN/classify are Sequential(convbn_3d, ReLU,
    <convbn_3d | Conv3d>) -> items 0 and 2; hourglass convK are
    Sequential(convbn_3d, ReLU) / bare convbn_3d / Sequential(ConvTranspose3d,
    BatchNorm3d); convbn_3d itself is Sequential(Conv3d, BatchNorm3d).
    """
    head = parts[0]
    m = re.fullmatch(r"(dres\d|classif\d|classify)_(\d)", head)
    if m:
        base = f"{m.group(1)}.{2 * int(m.group(2))}"
        if len(parts) == 1:  # bare Conv3d (classifN_1 / classify_1)
            return base
        return base + (".0" if parts[1] == "conv" else ".1")
    if re.fullmatch(r"dres\d", head) and len(parts) >= 2:
        sub = parts[1]
        m = re.fullmatch(r"conv(\d)_(conv|bn)", sub)
        if m:  # hourglass deconv: Sequential(ConvTranspose3d, BN3d)
            return f"{head}.conv{m.group(1)}." + (
                "0" if m.group(2) == "conv" else "1")
        if sub == "conv2":  # bare convbn_3d (stackhourglass.py:17)
            return f"{head}.conv2." + ("0" if parts[2] == "conv" else "1")
        return f"{head}.{sub}.0." + ("0" if parts[2] == "conv" else "1")
    return ".".join(parts)


_SUBNET_RULES = {
    "flowNet": _pwcnet_key,
    "stereoNet": _stereonet_key,
    "flowPoseNet": _voflownet_key,
}


def _guess_rule(head: str):
    """Pick the translation rule for a standalone (un-wrapped) model from
    the first module name."""
    if head == "feat_net" or re.fullmatch(r"(trans|rot)_fc\d", head):
        return _voflownet_key
    if re.fullmatch(r"(dres\d|classif\d|classify)(_\d)?", head):
        return _psmnet_key
    if (head == "feature_extraction" or head.startswith("conv_c")
            or head.startswith("deconv_c")):
        return _stereonet_key
    return _pwcnet_key


def flax_path_to_torch_key(path: Tuple[str, ...]) -> Optional[str]:
    """('params'|'batch_stats', subnet, ..., leaf) -> torch key or None."""
    collection, *mods, leaf = path
    if not mods:
        return None
    subnet = mods[0]
    rule = _SUBNET_RULES.get(subnet)
    if rule is None:
        body = _guess_rule(subnet)(tuple(mods))
        return f"{body}.{_leaf_to_torch(leaf)}"
    body = rule(tuple(mods[1:]))
    return f"{subnet}.{body}.{_leaf_to_torch(leaf)}"


def _is_transposed_conv(path: Tuple[str, ...]) -> bool:
    return any(p.startswith("deconv") or p.startswith("upfeat")
               or re.fullmatch(r"conv[56]_conv", p)  # 3-D hourglass deconvs
               for p in path)


def torch_value_to_flax(path: Tuple[str, ...], value: np.ndarray,
                        target_shape: Tuple[int, ...]) -> np.ndarray:
    """Transform a torch tensor into the flax layout for this path."""
    v = np.asarray(value)
    leaf = path[-1]
    if leaf == "kernel":
        if v.ndim == 4:
            if _is_transposed_conv(path):
                # torch ConvTranspose2d (in, out, kh, kw) -> pre-flipped HWIO
                v = v[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
            else:
                # torch Conv2d (out, in, kh, kw) -> HWIO
                v = v.transpose(2, 3, 1, 0)
        elif v.ndim == 5:
            if _is_transposed_conv(path):
                # ConvTranspose3d (in, out, kd, kh, kw) -> pre-flipped DHWIO
                v = v[:, :, ::-1, ::-1, ::-1].transpose(2, 3, 4, 0, 1)
            else:
                # Conv3d (out, in, kd, kh, kw) -> DHWIO
                v = v.transpose(2, 3, 4, 1, 0)
        elif v.ndim == 2:
            v = v.T  # Linear (out, in) -> (in, out)
    return np.ascontiguousarray(v).reshape(target_shape)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a reference .pkl checkpoint into numpy arrays (host-side)."""
    import torch  # CPU torch, only for deserialization

    sd = torch.load(path, map_location="cpu")
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return {k: v.detach().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}


def import_torch_weights(variables: Dict[str, Any],
                         state_dict: Dict[str, np.ndarray],
                         verbose: bool = False) -> Dict[str, Any]:
    """Fill flax ``variables`` from a torch state dict.

    Reproduces the reference's lenient loader (TartanVO.py:49-87): each flax
    parameter's translated torch key is matched against state-dict keys by
    mutual suffix (``k.endswith(kk) or kk.endswith(k)``) with element-count
    equality; unmatched parameters keep their current values and are
    reported.  Raises if NOTHING matches (TartanVO.py:66-67).
    """
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    treedef = jax.tree_util.tree_structure(variables)

    sd_keys = list(state_dict.keys())
    n_loaded = 0
    new_leaves = []
    missing = []
    for keypath, leaf in flat:
        parts = tuple(
            p.key if hasattr(p, "key") else str(p) for p in keypath)
        tkey = flax_path_to_torch_key(parts)
        value = None
        if tkey is not None:
            candidates = [tkey]
            # uncertainty checkpoints wrap the flow conv in PredictFlow:
            # predict_flowN.weight lives at predict_flowN.pred.weight
            m = re.fullmatch(r"((?:flowNet\.)?(?:predict_flow\d|dc_conv7))"
                             r"\.(weight|bias)", tkey)
            if m:
                candidates.append(f"{m.group(1)}.pred.{m.group(2)}")
            for cand in candidates:
                if cand in state_dict:
                    value = state_dict[cand]
                    break
            if value is None:
                for k in sd_keys:
                    if (k.endswith(tkey) or tkey.endswith(k)) and (
                            np.asarray(state_dict[k]).size ==
                            np.asarray(leaf).size):
                        value = state_dict[k]
                        break
        if value is not None:
            try:
                new_leaves.append(jnp.asarray(
                    torch_value_to_flax(parts, value, np.shape(leaf)),
                    dtype=jnp.asarray(leaf).dtype))
                n_loaded += 1
                continue
            except Exception:
                pass
        missing.append("/".join(parts))
        new_leaves.append(leaf)

    if n_loaded == 0:
        raise RuntimeError("Could not match any torch weights.")
    if verbose and missing:
        for m in missing:
            print(f"! [import_torch_weights] no source for {m}")
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


# ---------------------------------------------------------------------------
# orbax native checkpoints (train.py:181-189 equivalent)
# ---------------------------------------------------------------------------

def save_checkpoint(directory: str, step: int, pytree: Any) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, str(step)))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, pytree, force=True)
    return path


def restore_checkpoint(directory: str, step: int,
                       template: Any = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, str(step)))
    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        return ckptr.restore(path, item=template)
    return ckptr.restore(path)


def checkpoint_top_keys(directory: str, step: int) -> Optional[set]:
    """Top-level keys stored in a checkpoint, from orbax metadata (no array
    reads).  Lets callers choose a restore template matching what is actually
    on disk (full state vs params-only) instead of try/except-ing a full
    restore.  Returns None if the metadata cannot be read."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, str(step)))
    try:
        meta = ocp.PyTreeCheckpointer().metadata(path)
        # Unwrap the version-dependent metadata nesting: orbax >= 0.11
        # returns StepMetadata(.item_metadata -> TreeMetadata(.tree -> dict));
        # older versions return the tree (or an object with .tree) directly.
        for attr in ("item_metadata", "tree"):
            if hasattr(meta, attr):
                meta = getattr(meta, attr)
        return set(meta.keys())
    except Exception as e:  # pragma: no cover - depends on orbax version
        print(f"! [checkpoint_top_keys] metadata unreadable for {path}: {e}")
        return None


def latest_checkpoint_step(directory: str, before: int) -> Optional[int]:
    """Scan {dir}/{k} for k in before-1..1, mirroring the reference's resume
    scan (train.py:102-107)."""
    for i in range(before - 1, 0, -1):
        if os.path.isdir(os.path.join(directory, str(i))):
            return i
    return None
