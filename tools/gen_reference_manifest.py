"""Generate the reference models' torch state-dict key manifests.

The published mathpluscode/CineMA checkpoints cannot be downloaded in this
zero-egress environment, so the checkpoint-bridge acceptance gate is the
exact key/shape manifest of the reference architectures at base scale
(VERDICT round-1 item 3): instantiate the reference's model-building code
(read-only at /root/reference) with lightweight stand-ins for its heavy
dependencies (timm/omegaconf/monai provide only standard leaf-module names:
Mlp fc1/fc2, LayerScale gamma), dump {key: shape} JSON fixtures, and test
cinema_tpu's bridge output against them.

Usage: python tools/gen_reference_manifest.py [--reference /root/reference]
Writes tests/fixtures/reference_manifest_<model>.json
"""

from __future__ import annotations

import argparse
import json
import sys
import types
from functools import partial
from pathlib import Path

import torch
import yaml
from torch import nn

REPO = Path(__file__).resolve().parents[1]


def _to_2tuple(x):
    return x if isinstance(x, (tuple, list)) else (x, x)


class _Mlp(nn.Module):
    """timm.layers.Mlp stand-in with timm's leaf names (fc1/act/drop1/norm/fc2/drop2)."""

    def __init__(
        self,
        in_features,
        hidden_features=None,
        out_features=None,
        act_layer=nn.GELU,
        norm_layer=None,
        bias=True,
        drop=0.0,
        use_conv=False,
    ):
        super().__init__()
        out_features = out_features or in_features
        hidden_features = hidden_features or in_features
        bias = _to_2tuple(bias)
        drop = _to_2tuple(drop)
        linear_layer = partial(nn.Conv2d, kernel_size=1) if use_conv else nn.Linear
        self.fc1 = linear_layer(in_features, hidden_features, bias=bias[0])
        self.act = act_layer()
        self.drop1 = nn.Dropout(drop[0])
        self.norm = norm_layer(hidden_features) if norm_layer is not None else nn.Identity()
        self.fc2 = linear_layer(hidden_features, out_features, bias=bias[1])
        self.drop2 = nn.Dropout(drop[1])

    def forward(self, x):
        return self.drop2(self.fc2(self.norm(self.drop1(self.act(self.fc1(x))))))


class _SwiGLU(nn.Module):
    """timm.layers.SwiGLU stand-in (fc1_g/fc1_x/norm/fc2)."""

    def __init__(
        self,
        in_features,
        hidden_features=None,
        out_features=None,
        act_layer=nn.SiLU,
        norm_layer=None,
        bias=True,
        drop=0.0,
    ):
        super().__init__()
        out_features = out_features or in_features
        hidden_features = hidden_features or in_features
        bias = _to_2tuple(bias)
        drop = _to_2tuple(drop)
        self.fc1_g = nn.Linear(in_features, hidden_features, bias=bias[0])
        self.fc1_x = nn.Linear(in_features, hidden_features, bias=bias[0])
        self.act = act_layer()
        self.drop1 = nn.Dropout(drop[0])
        self.norm = norm_layer(hidden_features) if norm_layer is not None else nn.Identity()
        self.fc2 = nn.Linear(hidden_features, out_features, bias=bias[1])
        self.drop2 = nn.Dropout(drop[1])


class _DropPath(nn.Module):
    def __init__(self, drop_prob=0.0, scale_by_keep=True):
        super().__init__()
        self.drop_prob = drop_prob

    def forward(self, x):
        return x


class _LayerScale(nn.Module):
    """timm.models.vision_transformer.LayerScale stand-in (gamma)."""

    def __init__(self, dim, init_values=1e-5, inplace=False):
        super().__init__()
        self.gamma = nn.Parameter(init_values * torch.ones(dim))

    def forward(self, x):
        return x * self.gamma


class Cfg(dict):
    """Attribute-style config (omegaconf.DictConfig stand-in)."""

    def __getattr__(self, key):
        try:
            value = self[key]
        except KeyError as e:
            raise AttributeError(key) from e
        return value

    @classmethod
    def wrap(cls, obj):
        if isinstance(obj, dict):
            return cls({k: cls.wrap(v) for k, v in obj.items()})
        return obj


def install_stubs() -> None:
    timm = types.ModuleType("timm")
    timm_layers = types.ModuleType("timm.layers")
    timm_layers.Mlp = _Mlp
    timm_layers.SwiGLU = _SwiGLU
    timm_layers.DropPath = _DropPath
    timm_layers.to_2tuple = _to_2tuple
    timm_layers.use_fused_attn = lambda: False
    timm_models = types.ModuleType("timm.models")
    timm_vit = types.ModuleType("timm.models.vision_transformer")
    timm_vit.LayerScale = _LayerScale
    timm.layers = timm_layers
    timm.models = timm_models
    timm_models.vision_transformer = timm_vit

    omegaconf = types.ModuleType("omegaconf")
    omegaconf.DictConfig = Cfg

    class OmegaConf:
        @staticmethod
        def load(path):
            with open(path) as f:
                return Cfg.wrap(yaml.safe_load(f))

        @staticmethod
        def to_container(cfg, resolve=True):
            return dict(cfg)

    omegaconf.OmegaConf = OmegaConf

    hf = types.ModuleType("huggingface_hub")

    def hf_hub_download(*a, **k):
        raise RuntimeError("no network in this environment")

    hf.hf_hub_download = hf_hub_download

    monai = types.ModuleType("monai")
    monai_metrics = types.ModuleType("monai.metrics")
    monai_metrics.compute_iou = lambda *a, **k: None
    monai.metrics = monai_metrics

    for name, mod in [
        ("timm", timm),
        ("timm.layers", timm_layers),
        ("timm.models", timm_models),
        ("timm.models.vision_transformer", timm_vit),
        ("omegaconf", omegaconf),
        ("huggingface_hub", hf),
        ("monai", monai),
        ("monai.metrics", monai_metrics),
    ]:
        sys.modules.setdefault(name, mod)


def dump(model: nn.Module, name: str, out_dir: Path) -> None:
    manifest = {k: list(v.shape) for k, v in sorted(model.state_dict().items())}
    out = out_dir / f"reference_manifest_{name}.json"
    out.write_text(json.dumps(manifest, indent=0) + "\n")
    print(f"{name}: {len(manifest)} keys -> {out}")


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--reference", type=Path, default=Path("/root/reference"))
    parser.add_argument("--out_dir", type=Path, default=REPO / "tests" / "fixtures")
    args = parser.parse_args()

    install_stubs()
    sys.path.insert(0, str(args.reference))

    from cinema.mae.mae import get_model as get_mae_model
    from cinema.segmentation.convunetr import get_model as get_convunetr_model
    from cinema.convvit import get_model as get_convvit_model
    from omegaconf import OmegaConf  # the stub

    args.out_dir.mkdir(parents=True, exist_ok=True)

    # pretrained/cinema.safetensors architecture (reference mae/config.yaml)
    mae_cfg = OmegaConf.load(args.reference / "cinema" / "mae" / "config.yaml")
    dump(get_mae_model(mae_cfg), "cinema_base", args.out_dir)

    # finetuned/segmentation/acdc convunetr_sax architecture
    seg_cfg = OmegaConf.load(args.reference / "cinema" / "segmentation" / "acdc" / "config.yaml")
    dump(get_convunetr_model(seg_cfg), "convunetr_acdc_sax", args.out_dir)

    # finetuned/classification (ConvViT) architecture, acdc cvd config
    clf_cfg = OmegaConf.load(
        args.reference / "cinema" / "classification" / "acdc" / "config.yaml"
    )
    dump(get_convvit_model(clf_cfg), "convvit_acdc_cvd", args.out_dir)


if __name__ == "__main__":
    main()
