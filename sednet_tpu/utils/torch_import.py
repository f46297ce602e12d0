"""Torch .pth -> flax params importer for released SED-Net checkpoints.

Maps the reference SEDNet state_dict (module attribute names from
src/SEDNet.py:216-290 and the encoder src/SEDNet.py:19-48) onto this
package's flax parameter tree, so real released weights give day-one output
parity (the exact layer correspondence is pinned by
tests/test_torch_parity.py). Handles:

  * `module.` prefix stripping (DataParallel checkpoints,
    generate_predictions_aug.py:191-198);
  * torch Conv1d/Conv2d weight (Cout, Cin, 1[, 1]) -> flax Dense kernel
    (Cin, Cout);
  * GroupNorm weight/bias -> scale/bias;
  * duplicate GN registrations (encoder.bn1 is also visible as
    encoder.conv1.1 through the Sequential) and unused reference buffers
    (encoder.bn4/bn5, pos_enc) are ignored.

The inverse (flax -> torch state_dict) exists for round-trip testing.
No torch import at module load — torch is only needed for .pth files.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

# (torch prefix, flax path) for conv/dense layers; encoder Sequential convs
# are bias-free (src/SEDNet.py:37-45), everything else has biases.
_DENSE = [
    ("encoder.conv1.0", ("encoder", "conv1", "conv"), False),
    ("encoder.conv2.0", ("encoder", "conv2", "conv"), False),
    ("encoder.conv3.0", ("encoder", "conv3", "conv"), False),
    ("encoder.mlp1", ("encoder", "mlp1"), True),
    ("conv1", ("conv1",), True),
    ("conv2", ("conv2",), True),
    ("mlp_prim_prob1", ("mlp_prim_prob1",), True),
    ("mlp_prim_prob2", ("mlp_prim_prob2",), True),
    ("edge_module.0", ("edge_conv1",), True),
    ("edge_module.2", ("edge_conv2",), True),
    ("asis.0", ("asis_conv",), True),
    ("mlp_seg_prob1", ("mlp_seg_prob1",), True),
    ("mlp_seg_prob2", ("mlp_seg_prob2",), True),
    ("prim_encoding.0", ("prim_encoding",), True),
    ("normal_predict_mlps.0", ("normal_conv1",), True),
    ("normal_predict_mlps.2", ("normal_conv2",), True),
]

# (torch prefix, flax path) for GroupNorms.
_GN = [
    ("encoder.bn1", ("encoder", "conv1", "gn")),
    ("encoder.bn2", ("encoder", "conv2", "gn")),
    ("encoder.bn3", ("encoder", "conv3", "gn")),
    ("encoder.bnmlp1", ("encoder", "gn_mlp1")),
    ("bn1", ("gn1",)),
    ("bn2", ("gn2",)),
    ("bn_prim_prob1", ("gn_prim",)),
    ("bn_seg_prob1", ("gn_seg",)),
    ("edge_module.1", ("edge_gn",)),
    ("asis.1", ("asis_gn",)),
    ("normal_predict_mlps.1", ("normal_gn",)),
]


def strip_module_prefix(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Remove DataParallel's `module.` prefix
    (reference: generate_predictions_aug.py:191-198)."""
    return {(k[len("module."):] if k.startswith("module.") else k): v
            for k, v in state_dict.items()}


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def _set(tree: dict, path, leaf):
    for p in path[:-1]:
        tree = tree.setdefault(p, {})
    tree[path[-1]] = leaf


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def torch_state_dict_to_flax(state_dict: Dict[str, Any],
                             strict: bool = False) -> Dict[str, Any]:
    """Convert a reference SEDNet state_dict to this package's flax params.

    strict: raise if an expected key is missing (otherwise skip — matching
    the reference's shape-mismatch-tolerant loader, train_sed_net.py:97-113).
    """
    sd = strip_module_prefix(state_dict)
    params: Dict[str, Any] = {}
    used = set()
    for prefix, path, has_bias in _DENSE:
        wk = prefix + ".weight"
        if wk not in sd:
            if strict:
                raise KeyError(wk)
            continue
        w = _np(sd[wk])
        kernel = w.reshape(w.shape[0], w.shape[1]).T  # (Cin, Cout)
        _set(params, path + ("kernel",), kernel)
        used.add(wk)
        if has_bias:
            bk = prefix + ".bias"
            if bk in sd:
                _set(params, path + ("bias",), _np(sd[bk]))
                used.add(bk)
            elif strict:
                raise KeyError(bk)
    for prefix, path in _GN:
        wk, bk = prefix + ".weight", prefix + ".bias"
        if wk not in sd:
            if strict:
                raise KeyError(wk)
            continue
        _set(params, path + ("scale",), _np(sd[wk]))
        used.add(wk)
        if bk in sd:
            _set(params, path + ("bias",), _np(sd[bk]))
            used.add(bk)
        elif strict:
            raise KeyError(bk)
    leftover = [k for k in sd if k not in used]
    if leftover:
        import logging

        logging.getLogger("sednet_tpu.torch_import").warning(
            "unmatched checkpoint keys (ignored): %s",
            leftover[:20] + (["..."] if len(leftover) > 20 else []))
    return params


def flax_params_to_torch_state_dict(params: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse mapping (flax -> reference state_dict), numpy leaves.

    Conv weights get the trailing singleton kernel dims of Conv1d; the
    encoder edge convs get Conv2d's two (reference src/SEDNet.py:37-45)."""
    sd: Dict[str, Any] = {}
    for prefix, path, has_bias in _DENSE:
        try:
            kernel = np.asarray(_get(params, path + ("kernel",)))
        except (KeyError, TypeError):
            continue
        extra = (1, 1) if prefix.startswith("encoder.conv") else (1,)
        sd[prefix + ".weight"] = kernel.T.reshape(kernel.shape[1],
                                                  kernel.shape[0], *extra)
        if has_bias and _has(params, path + ("bias",)):
            sd[prefix + ".bias"] = np.asarray(_get(params, path + ("bias",)))
    for prefix, path in _GN:
        if not _has(params, path + ("scale",)):
            continue
        sd[prefix + ".weight"] = np.asarray(_get(params, path + ("scale",)))
        sd[prefix + ".bias"] = np.asarray(_get(params, path + ("bias",)))
    return sd


def _has(tree, path) -> bool:
    try:
        _get(tree, path)
        return True
    except (KeyError, TypeError):
        return False


def load_torch_checkpoint(path: str, strict: bool = False) -> Dict[str, Any]:
    """Load a reference .pth checkpoint into flax params."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if isinstance(sd, dict) and "model_state" in sd:
        sd = sd["model_state"]
    return torch_state_dict_to_flax(sd, strict=strict)
