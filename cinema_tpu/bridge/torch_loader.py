"""Load PyTorch (reference CineMA) checkpoints into flax param trees.

The published checkpoints (HuggingFace mathpluscode/CineMA, safetensors)
use the reference module naming (e.g. ``enc_down_dict.sax.conv_blocks.0.
patch_embed.conv.weight``). This module maps those keys onto our flax param
paths and converts tensor layouts:

- Linear: (out, in) -> (in, out) transpose;
- Conv AND ConvTranspose: (o, i, *k)/(i, o, *k) -> (*k, i/o, o/i) — the same
  numpy transpose ``(2.., 1, 0)`` covers both because our ConvTranspose uses
  flax ``transpose_kernel=True`` (kernel layout (*k, out, in));
- norms: weight -> scale;
- frozen sincos pos-embeds are dropped (they are baked constants here).

Also implements the fine-tune transfer semantics of the reference
``load_pretrain_weights`` (convvit.py:616-704): key drops per target model,
patch-embed channel inflation for video/multi-modality transfer, and a
freeze-path list for optax masking.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cinema_tpu.log import get_logger

logger = get_logger(__name__)

# flax dict-attribute prefixes whose next component is a view name / 'cls'
_DICT_PREFIXES = (
    "enc_down_dict",
    "enc_fusion_dict",
    "dec_embed_dict",
    "pred_head_dict",
    "dec_image_conv_block_dict",
    "dec_down_blocks_dict",
    "dec_conv_blocks_dict",
    "decoder_dict",
)
_DICT_KEYS = ("sax", "lax_2c", "lax_3c", "lax_4c", "cls")


def _split_dict_component(part: str) -> Optional[str]:
    """'enc_down_dict_lax_2c' -> 'enc_down_dict.lax_2c'; None if no match."""
    for prefix in _DICT_PREFIXES:
        if part.startswith(prefix + "_"):
            rest = part[len(prefix) + 1 :]
            for key in _DICT_KEYS:
                if rest == key:
                    return f"{prefix}.{key}"
                if rest.startswith(key + "_"):
                    # trailing list index, e.g. dec_down_blocks_dict_sax_0
                    tail = rest[len(key) + 1 :]
                    return f"{prefix}.{key}." + tail.replace("_", ".")
    return None


def _indexify(part: str) -> str:
    """'blocks_3' -> 'blocks.3', 'conv_blocks_0_patch_embed' -> 'conv_blocks.0.patch_embed',
    'blocks_0_conv_1' -> 'blocks.0.conv.1', 'down_convs_2' -> 'down_convs.2'."""
    part = re.sub(r"_(\d+)(?=_|$)", r".\1", part)
    return re.sub(r"(\.\d+)_", r"\1.", part)


def flax_path_to_torch_key(path: Tuple[str, ...]) -> Optional[str]:
    """Map a flax param path to the reference torch state_dict key.

    Our Dense/Conv wrappers insert one module level (named 'linear'/'conv')
    holding the actual nn.Dense/nn.Conv; torch's Linear/Conv params live
    directly on the named module. The inner wrapper level is always the
    component right before the leaf — drop it unconditionally.

    Args:
        path: tuple of path components ending in the leaf name
            ('kernel' | 'bias' | 'scale' | token names).

    Returns:
        torch key, or None if the param has no torch counterpart.
    """
    *parts, leaf = path
    if leaf == "kernel" or leaf == "scale":
        torch_leaf = "weight"
    elif leaf in ("bias", "cls_token", "mask_token", "embed_token"):
        torch_leaf = leaf
    else:
        return None
    if leaf in ("kernel", "bias") and parts and parts[-1] in ("linear", "conv", "bn"):
        parts = parts[:-1]
    out: List[str] = []
    for part in parts:
        dict_split = _split_dict_component(part)
        out.append(dict_split if dict_split is not None else _indexify(part))
    torch_parent = ".".join(out)
    return f"{torch_parent}.{torch_leaf}" if torch_parent else torch_leaf


def _convert_tensor(torch_value: np.ndarray, flax_shape: Tuple[int, ...], path: Tuple[str, ...]) -> np.ndarray:
    """Layout-convert a torch tensor to the flax param layout."""
    v = np.asarray(torch_value)
    leaf = path[-1]
    if leaf == "kernel":
        if v.ndim == 2:
            v = v.T
        elif v.ndim > 2:
            nd = v.ndim - 2
            v = np.transpose(v, tuple(range(2, 2 + nd)) + (1, 0))
    if tuple(v.shape) != tuple(flax_shape):
        raise ValueError(f"Shape mismatch at {'/'.join(path)}: torch {v.shape} vs flax {flax_shape}.")
    return np.ascontiguousarray(v)


def _scanned_block_idx(path: Tuple[str, ...]) -> Optional[int]:
    """Index of the nn.scan marker ('blocks', 'block') in a param path, or None."""
    return next(
        (
            i
            for i in range(len(path) - 1)
            if path[i] == "blocks" and path[i + 1] == "block"
        ),
        None,
    )


def _scanned_layer_paths(path: Tuple[str, ...], depth: int) -> List[Tuple[str, ...]]:
    """Per-layer unrolled paths for an nn.scan-stacked param path."""
    idx = _scanned_block_idx(path)
    assert idx is not None
    return [path[:idx] + (f"blocks_{d}",) + path[idx + 2 :] for d in range(depth)]


def _flatten(params: Any) -> Dict[Tuple[str, ...], jnp.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for keypath, value in flat:
        parts = tuple(getattr(k, "key", str(k)) for k in keypath)
        out[parts] = value
    return out


def load_torch_state_dict(
    params: Any,
    state_dict: Dict[str, np.ndarray],
    strict: bool = True,
    inflate_patch_embed_chans: bool = False,
    expected_frozen: Optional[Dict[str, np.ndarray]] = None,
) -> Tuple[Any, List[str], List[str]]:
    """Fill a flax param tree from a torch state_dict.

    The reference registers its frozen sincos pos-embeds as (requires_grad
    =False) nn.Parameters, so they appear in the published checkpoints
    (reference vit.py:409-418); our models recompute them as baked
    constants. Keys ending in ``.pos_embed`` are therefore consumed without
    loading — and verified against ``expected_frozen`` when provided, which
    pins the sincos table (incl. the np.meshgrid axis-order quirk) to the
    published values.

    Args:
        params: flax params template ({'params': ...} or the inner tree).
        state_dict: torch-named tensors (numpy or torch tensors).
        strict: raise if a flax param has no torch counterpart or vice versa
            (frozen pos-embeds never count).
        inflate_patch_embed_chans: repeat first-conv weights along input
            channels when shapes differ (reference convvit.py:666-682).
        expected_frozen: optional {torch_key: expected array} for frozen
            constants; mismatches raise.

    Returns:
        (new_params, missing_torch_keys, unused_torch_keys)
    """
    wrapped = isinstance(params, dict) and set(params.keys()) == {"params"}
    inner = params["params"] if wrapped else params
    flat = _flatten(inner)

    state = {k: np.asarray(v) for k, v in state_dict.items()}
    used = set()
    new_flat: Dict[Tuple[str, ...], jnp.ndarray] = {}
    missing: List[str] = []

    for path, value in flat.items():
        if _scanned_block_idx(path) is not None:
            # nn.scan-stacked blocks: the checkpoint holds unrolled
            # blocks_{i} keys (see _unstack_scanned) — load each layer's
            # tensor and re-stack along the leading depth axis
            depth = value.shape[0]
            layer_keys = [
                flax_path_to_torch_key(p) for p in _scanned_layer_paths(path, depth)
            ]
            # partial load like the unrolled layout: each present layer's
            # tensor is converted, absent layers keep the template slice
            layers = []
            for d, k in enumerate(layer_keys):
                if k is not None and k in state:
                    layers.append(
                        jnp.asarray(
                            _convert_tensor(state[k], tuple(value.shape[1:]), path),
                            dtype=value.dtype,
                        )
                    )
                    used.add(k)
                else:
                    if k is not None:
                        missing.append(k)
                    layers.append(value[d])
            new_flat[path] = jnp.stack(layers)
            continue
        torch_key = flax_path_to_torch_key(path)
        if torch_key is None or torch_key not in state:
            # try without collapsing wrapper names (rare explicit matches)
            if torch_key is not None and torch_key not in state:
                missing.append(torch_key)
            new_flat[path] = value
            continue
        v = state[torch_key]
        if (
            inflate_patch_embed_chans
            and path[-1] == "kernel"
            and "patch_embed" in torch_key
            and torch_key.endswith("conv.weight")
            and v.ndim > 2
        ):
            want_in = value.shape[-2]
            have_in = v.shape[1]
            if want_in != have_in:
                if want_in % have_in != 0:
                    raise ValueError(f"Cannot inflate {torch_key}: {have_in} -> {want_in}.")
                logger.info(f"Duplicating weights for input channels {want_in} vs {have_in} at {torch_key}.")
                reps = [1, want_in // have_in] + [1] * (v.ndim - 2)
                v = np.tile(v, reps)
        new_flat[path] = jnp.asarray(_convert_tensor(v, tuple(value.shape), path), dtype=value.dtype)
        used.add(torch_key)

    unused = sorted(set(state.keys()) - used)
    frozen = [k for k in unused if k.endswith(".pos_embed") or k == "pos_embed"]
    if frozen:
        for key in frozen:
            if expected_frozen is not None and key in expected_frozen:
                want = np.asarray(expected_frozen[key], dtype=np.float64)
                got = state[key].astype(np.float64)
                if want.shape != got.shape or not np.allclose(want, got, atol=1e-5):
                    raise ValueError(
                        f"Frozen constant {key} in the checkpoint does not match the "
                        f"recomputed sincos table (shape {got.shape} vs {want.shape})."
                    )
        logger.info(
            f"Skipped {len(frozen)} frozen sincos pos-embed keys "
            "(recomputed as constants in this implementation)."
        )
        unused = [k for k in unused if k not in frozen]
    if strict:
        if missing:
            raise ValueError(f"Missing torch keys for flax params: {missing}")
        if unused:
            raise ValueError(f"Unused torch keys: {unused}")

    new_inner = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(inner), [new_flat[p] for p in _flatten(inner).keys()]
    )
    out = {"params": new_inner} if wrapped else new_inner
    return out, missing, unused


def _unstack_scanned(flat: Dict[Tuple[str, ...], Any]) -> Dict[Tuple[str, ...], Any]:
    """Split nn.scan-stacked block params (path .../blocks/block/... with a
    leading depth axis) into per-layer ``blocks_{i}`` paths, so scanned
    models export to the same torch state_dict as the unrolled layout."""
    out: Dict[Tuple[str, ...], Any] = {}
    for path, value in flat.items():
        idx = _scanned_block_idx(path)
        if idx is None:
            out[path] = value
            continue
        v = np.asarray(value)
        for d in range(v.shape[0]):
            out[path[:idx] + (f"blocks_{d}",) + path[idx + 2 :]] = v[d]
    return out


def params_to_torch_state_dict(params: Any) -> Dict[str, np.ndarray]:
    """Export a flax param tree to torch-named/-layouted tensors (inverse bridge).

    Variable dicts with a ``batch_stats`` collection (BatchNorm models, e.g.
    the ResNet baselines) export their running statistics as torch
    ``running_mean``/``running_var`` entries alongside the params.
    """
    wrapped = isinstance(params, dict) and "params" in params and set(params.keys()) <= {
        "params", "batch_stats"
    }
    inner = params["params"] if wrapped else params
    out: Dict[str, np.ndarray] = {}
    for path, value in _unstack_scanned(_flatten(inner)).items():
        torch_key = flax_path_to_torch_key(path)
        if torch_key is None:
            continue
        v = np.asarray(value)
        if path[-1] == "kernel":
            if v.ndim == 2:
                v = v.T
            elif v.ndim > 2:
                nd = v.ndim - 2
                v = np.transpose(v, (nd + 1, nd) + tuple(range(nd)))
        out[torch_key] = np.ascontiguousarray(v)
    if wrapped and "batch_stats" in params:
        stat_names = {"mean": "running_mean", "var": "running_var"}
        for path, value in _flatten(params["batch_stats"]).items():
            # reuse the params key-munging (layer1_0 -> layer1.0, drop
            # wrapper levels) by mapping a fake 'bias' leaf on the parent
            parent = flax_path_to_torch_key((*path[:-1], "bias"))
            prefix = parent[: -len(".bias")] if parent else ""
            key = (prefix + "." if prefix else "") + stat_names.get(path[-1], path[-1])
            out[key] = np.ascontiguousarray(np.asarray(value))
    return out


# keys dropped when transferring MAE weights into a downstream model
# (reference convvit.py:640-651)
_TRANSFER_DROP_SUBSTRINGS = [
    "mask",
    "decoder",
    "_head",
    "sax",
    "lax_2c",
    "lax_3c",
    "lax_4c",
    "fusion",
    "dec_linear",
    "pos_embed",
]


def load_pretrain_weights(
    params: Any,
    views: str | Sequence[str],
    state_dict: Dict[str, np.ndarray],
    keep_fusion: bool = False,
) -> Tuple[Any, List[str]]:
    """MAE -> downstream transfer with the reference's key-surgery semantics.

    Args:
        params: target model flax params template.
        views: view(s) whose stems should be transferred.
        state_dict: pretrained MAE torch state_dict.
        keep_fusion: keep fusion weights (target has enc_fusion_dict, i.e.
            ConvViT; ConvUNetR drops them).

    Returns:
        (new_params, loaded_torch_keys): loaded keys feed the optax freeze
        mask when freeze-pretrained is requested.
    """
    views = [views] if isinstance(views, str) else list(views)
    drops = [d for d in _TRANSFER_DROP_SUBSTRINGS if d not in views]
    if keep_fusion:
        drops.remove("fusion")
    filtered = {
        k: v for k, v in state_dict.items() if not any(d in k for d in drops)
    }
    new_params, _missing, unused = load_torch_state_dict(
        params, filtered, strict=False, inflate_patch_embed_chans=True
    )
    if unused:
        raise ValueError(f"Unexpected keys in checkpoint after filtering: {unused}")
    return new_params, sorted(filtered.keys())


def loaded_freeze_mask(params: Any, loaded_torch_keys: Iterable[str]) -> Any:
    """Boolean pytree: True where the param was loaded (to be frozen)."""
    loaded = set(loaded_torch_keys)
    wrapped = isinstance(params, dict) and set(params.keys()) == {"params"}
    inner = params["params"] if wrapped else params

    def mark(path, value):
        parts = tuple(getattr(k, "key", str(k)) for k in path)
        if _scanned_block_idx(parts) is not None:
            # scan-stacked leaf: freeze only if every unrolled layer loaded
            layer_keys = _scanned_layer_paths(parts, value.shape[0])
            return all(flax_path_to_torch_key(p) in loaded for p in layer_keys)
        torch_key = flax_path_to_torch_key(parts)
        return torch_key in loaded

    marked = jax.tree_util.tree_map_with_path(mark, inner)
    return {"params": marked} if wrapped else marked
