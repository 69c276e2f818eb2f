"""Model factories from config + pretrained/finetuned loading.

Mirrors the reference's per-model ``get_model(config)`` builders so the
published HuggingFace config.yaml files rebuild the same architectures:
- MAE: reference cinema/mae/mae.py:231-282
- ConvViT: reference cinema/convvit.py:294-332
- ConvUNetR: reference cinema/segmentation/convunetr.py:164-210
- UNet: reference cinema/segmentation/train.py:31-74

``from_pretrained``/``from_finetuned`` accept local safetensors+config
paths and, when the environment allows, HuggingFace repo ids.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from cinema_tpu.config import Config, load_config
from cinema_tpu.log import get_logger
from cinema_tpu.models.convunetr import ConvUNetR
from cinema_tpu.models.convvit import ConvViT
from cinema_tpu.models.mae import CineMA
from cinema_tpu.models.unet import UNet
from cinema_tpu.models.vit import get_vit_config

logger = get_logger(__name__)

Dtype = Any
HF_REPO = "mathpluscode/CineMA"


def _views(config: Config) -> list[str]:
    views = config.model.views
    return [views] if isinstance(views, str) else list(views)


def _view_data_config(config: Config, view: str) -> Config:
    if view == "sax":
        return config.data.sax
    if "lax" in config.data:
        return config.data.lax
    return config.data[view]


def get_mae_model(config: Config, dtype: Dtype = jnp.float32, remat: Optional[bool] = None) -> CineMA:
    """Build CineMA from the pretrain config schema (reference mae.py:231-282)."""
    views = list(config.model.get("views", ["sax", "lax_2c", "lax_3c", "lax_4c"]))
    vit = get_vit_config(config.model.size)
    image_size_dict, in_chans_dict, patch_dict, scale_dict = {}, {}, {}, {}
    for v in views:
        data = config.data.sax if v == "sax" else config.data.lax
        nd = 3 if v == "sax" else 2
        image_size_dict[v] = tuple(data.patch_size)
        in_chans_dict[v] = data.in_chans
        patch_dict[v] = tuple(config.model.patch_size[:nd])
        scale_dict[v] = tuple(config.model.scale_factor[:nd])
    return CineMA(
        image_size_dict=image_size_dict,
        in_chans_dict=in_chans_dict,
        enc_patch_size_dict=patch_dict,
        enc_scale_factor_dict=scale_dict,
        enc_conv_chans=tuple(config.model.enc_conv_chans),
        enc_conv_n_blocks=config.model.enc_conv_n_blocks,
        enc_embed_dim=vit["enc_embed_dim"],
        enc_depth=vit["enc_depth"],
        enc_n_heads=vit["enc_n_heads"],
        dec_embed_dim=vit["dec_embed_dim"],
        dec_depth=vit["dec_depth"],
        dec_n_heads=vit["dec_n_heads"],
        remat=config.get("grad_ckpt", False) if remat is None else remat,
        scan_blocks=bool(config.model.get("scan_blocks", False)),
        dtype=dtype,
    )


def get_convvit_model(config: Config, dtype: Dtype = jnp.float32, remat: Optional[bool] = None) -> ConvViT:
    """Build ConvViT from a clf/reg config (reference convvit.py:294-332)."""
    views = _views(config)
    vit = get_vit_config(config.model.convvit.size)
    if "class_column" in config.data:
        out_chans = len(config.data[config.data.class_column])
    elif "regression_column" in config.data:
        out_chans = 1
    else:
        out_chans = config.model.out_chans
    ndim = {v: 3 if v == "sax" else 2 for v in views}
    return ConvViT(
        image_size_dict={v: tuple(_view_data_config(config, v).patch_size) for v in views},
        in_chans_dict={v: _view_data_config(config, v).in_chans for v in views},
        n_frames=config.model.n_frames,
        out_chans=out_chans,
        enc_patch_size_dict={v: tuple(config.model.convvit.enc_patch_size[: ndim[v]]) for v in views},
        enc_scale_factor_dict={v: tuple(config.model.convvit.enc_scale_factor[: ndim[v]]) for v in views},
        enc_conv_chans=tuple(config.model.convvit.enc_conv_chans),
        enc_conv_n_blocks=config.model.convvit.enc_conv_n_blocks,
        enc_embed_dim=vit["enc_embed_dim"],
        enc_depth=vit["enc_depth"],
        enc_n_heads=vit["enc_n_heads"],
        drop_path=config.model.convvit.get("drop_path", 0.0),
        remat=config.get("grad_ckpt", False) if remat is None else remat,
        dtype=dtype,
    )


def get_convunetr_model(config: Config, dtype: Dtype = jnp.float32, remat: Optional[bool] = None) -> ConvUNetR:
    """Build ConvUNetR from a segmentation config (reference convunetr.py:164-210)."""
    views = _views(config)
    vit = get_vit_config(config.model.convunetr.size)
    ndim = {v: 3 if v == "sax" else 2 for v in views}
    m = config.model.convunetr
    return ConvUNetR(
        image_size_dict={v: tuple(_view_data_config(config, v).patch_size) for v in views},
        in_chans_dict={v: _view_data_config(config, v).in_chans for v in views},
        out_chans=config.model.out_chans,
        enc_patch_size_dict={v: tuple(m.enc_patch_size[: ndim[v]]) for v in views},
        enc_scale_factor_dict={v: tuple(m.enc_scale_factor[: ndim[v]]) for v in views},
        enc_conv_chans=tuple(m.enc_conv_chans),
        enc_conv_n_blocks=m.enc_conv_n_blocks,
        enc_embed_dim=vit["enc_embed_dim"],
        enc_depth=vit["enc_depth"],
        enc_n_heads=vit["enc_n_heads"],
        dec_chans=tuple(m.dec_chans),
        dec_patch_size_dict={v: tuple(m.dec_patch_size[: ndim[v]]) for v in views},
        dec_scale_factor_dict={v: tuple(m.dec_scale_factor[: ndim[v]]) for v in views},
        dropout=m.get("dropout", 0.0),
        drop_path=m.get("drop_path", 0.0),
        remat=config.get("grad_ckpt", False) if remat is None else remat,
        dtype=dtype,
    )


def get_unet_model(config: Config, dtype: Dtype = jnp.float32) -> UNet:
    """Build the UNet baseline (reference segmentation/train.py:55-69)."""
    views = _views(config)
    if len(views) > 1:
        raise ValueError("UNet only supports single view.")
    view = views[0]
    data = _view_data_config(config, view)
    ndim = 3 if view == "sax" else 2
    return UNet(
        n_dims=len(data.spacing),
        in_chans=data.in_chans,
        out_chans=config.model.out_chans,
        patch_size=tuple(config.model.unet.patch_size[:ndim]),
        chans=tuple(config.model.unet.chans),
        scale_factor=tuple(config.model.unet.scale_factor[:ndim]),
        dropout=config.model.unet.get("dropout", 0.0),
        dtype=dtype,
    )


def get_segmentation_model(config: Config, dtype: Dtype = jnp.float32):
    """Dispatch convunetr/unet by config.model.name (reference segmentation/train.py:31-74)."""
    if config.model.name == "convunetr":
        return get_convunetr_model(config, dtype)
    if config.model.name == "unet":
        return get_unet_model(config, dtype)
    raise ValueError(f"Invalid model name {config.model.name}.")


def _example_images(model, batch: int = 1) -> Dict[str, jnp.ndarray]:
    # ConvViT consumes n_frames stacked as channels (ED+ES = 2, reference
    # convvit.py:399 `n_frames * in_chans`); init with the runtime channel
    # count or from_finetuned builds mis-shaped patch-embed kernels
    n_frames = getattr(model, "n_frames", 1)
    return {
        v: jnp.zeros(
            (batch, *model.image_size_dict[v], n_frames * model.in_chans_dict[v]),
            jnp.float32,
        )
        for v in model.views
    }


def init_params(model, images: Optional[Dict[str, jnp.ndarray]] = None):
    """Jitted param init (eager init is pathologically slow over the TPU tunnel)."""
    if images is None:
        images = _example_images(model)
    if isinstance(model, CineMA):
        fn = lambda: model.init(  # noqa: E731
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}, images, 0.75
        )
    else:
        fn = lambda: model.init(jax.random.PRNGKey(0), images)  # noqa: E731
    return jax.jit(fn)()


def expected_frozen_pos_embeds(model) -> Dict[str, np.ndarray]:
    """Expected values of the checkpoint's frozen sincos pos-embed keys.

    The reference stores its frozen pos-embeds as nn.Parameters (reference
    vit.py:409-418, mae.py:155-204), so published safetensors contain
    ``enc_down_dict.{view}.pos_embed`` (+ ``dec_embed_dict.{view}.pos_embed``
    for CineMA). We recompute them; this map lets the bridge verify the
    checkpoint's tables bit-for-bit against ours at load time.
    """
    from cinema_tpu.models.convvit import downsample_stack_sizes
    from cinema_tpu.models.vit import get_pos_embed_array

    out: Dict[str, np.ndarray] = {}
    for view in model.views:
        grid = downsample_stack_sizes(
            tuple(model.image_size_dict[view]),
            tuple(model.enc_patch_size_dict[view]),
            tuple(model.enc_scale_factor_dict[view]),
            len(model.enc_conv_chans),
        )[2]
        out[f"enc_down_dict.{view}.pos_embed"] = np.asarray(
            get_pos_embed_array(model.enc_embed_dim, grid)
        )
        if isinstance(model, CineMA):
            out[f"dec_embed_dict.{view}.pos_embed"] = np.asarray(
                get_pos_embed_array(model.dec_embed_dim, grid)
            )
    return out


def load_safetensors(path: Union[str, Path]) -> Dict[str, np.ndarray]:
    """Read a safetensors file into numpy arrays."""
    from safetensors.numpy import load_file

    return load_file(str(path))


def _maybe_hf_download(repo_id: str, filename: str) -> Path:
    from huggingface_hub import hf_hub_download

    return Path(hf_hub_download(repo_id=repo_id, filename=filename))


def mae_from_pretrained(
    model_path: Optional[Union[str, Path]] = None,
    config_path: Optional[Union[str, Path]] = None,
    dtype: Dtype = jnp.float32,
) -> Tuple[CineMA, Any]:
    """Rebuild CineMA + load the published pretrained weights.

    Mirrors CineMA.from_pretrained (reference mae.py:614-642). With no paths
    given, downloads from HuggingFace (requires network).

    Returns:
        (model, params)
    """
    from cinema_tpu.bridge.torch_loader import load_torch_state_dict

    if model_path is None:
        model_path = _maybe_hf_download(HF_REPO, "pretrained/cinema.safetensors")
    if config_path is None:
        config_path = _maybe_hf_download(HF_REPO, "pretrained/config.yaml")
    config = load_config(config_path)
    model = get_mae_model(config, dtype=dtype, remat=False)
    params = init_params(model)
    state_dict = load_safetensors(model_path)
    params, _, _ = load_torch_state_dict(
        params, state_dict, strict=True, expected_frozen=expected_frozen_pos_embeds(model)
    )
    logger.info(f"Loaded pretrained weights from {model_path}.")
    return model, params


def from_finetuned(
    kind: str,
    model_path: Union[str, Path],
    config_path: Union[str, Path],
    dtype: Dtype = jnp.float32,
) -> Tuple[Any, Any]:
    """Rebuild a finetuned ConvUNetR/ConvViT + load weights.

    Mirrors ConvUNetR/ConvViT.from_finetuned (reference convunetr.py:487-521,
    convvit.py:558-592). ``kind`` in {'convunetr', 'convvit'}. Paths may be
    local files or 'repo_id::filename' HuggingFace refs.
    """
    from cinema_tpu.bridge.torch_loader import load_torch_state_dict

    def resolve(p: Union[str, Path]) -> Path:
        if isinstance(p, str) and "::" in p:
            repo, filename = p.split("::", 1)
            return _maybe_hf_download(repo, filename)
        return Path(p)

    config = load_config(resolve(config_path))
    if kind == "convunetr":
        model = get_convunetr_model(config, dtype=dtype, remat=False)
    elif kind == "convvit":
        model = get_convvit_model(config, dtype=dtype, remat=False)
    else:
        raise ValueError(f"kind must be 'convunetr' or 'convvit', got {kind}.")
    params = init_params(model)
    state_dict = load_safetensors(resolve(model_path))
    params, _, _ = load_torch_state_dict(
        params, state_dict, strict=True, expected_frozen=expected_frozen_pos_embeds(model)
    )
    logger.info("Loaded finetuned weights.")
    return model, params
