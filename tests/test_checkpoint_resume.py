"""Orbax train-state checkpointing: cross-mesh (elastic) restore and the
pretrain entry point's save -> resume round trip (reference analog:
cinema/optim.py:229-294 .pt save/load + mae/pretrain.py:370-380 resume —
which are single-device only; the sharded restore here works across
topology changes)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import linen as nn

from cinema_tpu.parallel.mesh import make_mesh
from cinema_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from cinema_tpu.train.state import make_train_state


class _Model(nn.Module):
    @nn.compact
    def __call__(self, x):
        # (256, 256) = 65536 elems >= the FSDP threshold -> genuinely sharded
        return nn.Dense(256, name="big")(x)


def _make_state(mesh, fsdp):
    model = _Model()
    init_fn = lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256)))  # noqa: E731
    return make_train_state(init_fn, optax.adamw(1e-3), mesh, fsdp=fsdp)


def test_cross_mesh_restore(tmp_path):
    """Save on a 4x2 FSDP mesh, restore onto a 2x1 non-FSDP mesh: values are
    identical and land in the new placement without a host-gather template."""
    mesh_a = make_mesh(n_model=2)
    state_a, _ = _make_state(mesh_a, fsdp=True)
    kernel_spec = state_a.params["params"]["big"]["kernel"].sharding.spec
    assert "data" in [ax for ax in kernel_spec if ax]  # FSDP actually sharded

    path = save_checkpoint(tmp_path, state_a, epoch=3)
    assert path.name == "ckpt_3"

    mesh_b = make_mesh(n_data=2, n_model=1)
    state_b, shardings_b = _make_state(mesh_b, fsdp=False)
    # clobber values so equality below proves the restore, not the init
    state_b = jax.tree_util.tree_map(lambda x: x * 0 - 1.0, state_b)
    restored = load_checkpoint(path, state_b, shardings=shardings_b)

    for got, want in zip(
        jax.tree_util.tree_leaves(restored), jax.tree_util.tree_leaves(jax.device_get(state_a))
    ):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    kernel = restored.params["params"]["big"]["kernel"]
    assert kernel.sharding.mesh.shape["data"] == 2  # placed on the NEW mesh


def test_finetune_resume_keeps_saved_best_monotone(tmp_path):
    """The early-stopping best metric persists in the checkpoint's meta
    sidecar: a resumed run does NOT re-save on a first eval that is worse
    than the interrupted run's best (Weak #4 of round 3; the reference
    cannot resume fine-tunes at all, cinema/train.py:171-351)."""
    from flax import linen as nn

    from cinema_tpu.config import apply_overrides, load_config
    from cinema_tpu.train.loop import run_train

    from pathlib import Path

    config_path = (
        Path(__file__).parent.parent / "cinema_tpu" / "configs" / "segmentation" / "acdc.yaml"
    )

    class _Data:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return {"sax_image": np.full((4, 4, 1), float(i), np.float32)}

    class _Tiny(nn.Module):
        @nn.compact
        def __call__(self, images, deterministic=True):
            return nn.Dense(2)(images["sax"].reshape(images["sax"].shape[0], -1))

    def loss_fn(model, params, batch, rng):
        out = model.apply(params, {"sax": jnp.asarray(batch["sax_image"])})
        return jnp.mean(out**2), ({"loss": jnp.mean(out**2)}, {})

    def make_eval(values):
        vals = list(values)

        def eval_fn(model, params, loader, config):
            return {"mean_dice_score": vals.pop(0)}

        return eval_fn

    def cfg(n_epochs, out, resume=None):
        overrides = [
            "train.batch_size=2",
            "train.batch_size_per_device=2",
            f"train.n_epochs={n_epochs}",
            "train.n_warmup_epochs=0",
            "train.eval_interval=1",
            "train.n_workers=1",
            "train.early_stopping.patience=10",
            f"logging.dir={tmp_path / out}",
        ]
        if resume is not None:
            overrides.append(f"train.resume_path={resume}")
        return apply_overrides(load_config(config_path), overrides)

    common = dict(
        load_dataset=lambda c: (_Data(), _Data()),
        get_model_fn=lambda c: _Tiny(),
        loss_fn=loss_fn,
    )
    # run 1: evals 0.3 then 0.5 -> saves ckpt_0 and ckpt_1 (+ meta sidecars)
    first = run_train(cfg(2, "runs"), eval_dataloader_fn=make_eval([0.3, 0.5]), **common)
    assert (first / "ckpt_1").exists()
    meta = json.loads((first / "ckpt_1.meta.json").read_text())
    assert meta["best_metric"] == pytest.approx(-0.5)  # max-mode negation

    # run 2 resumes at epoch 2: eval 0.4 < saved best 0.5 -> NO save;
    # eval 0.6 improves -> ckpt_3 saved with the new best
    second = run_train(
        cfg(4, "runs_resumed", resume=first / "ckpt_1"),
        eval_dataloader_fn=make_eval([0.4, 0.6]),
        **common,
    )
    assert not (second / "ckpt_2").exists(), "worse-than-best eval must not re-save"
    assert (second / "ckpt_3").exists()
    meta2 = json.loads((second / "ckpt_3.meta.json").read_text())
    assert meta2["best_metric"] == pytest.approx(-0.6)


def test_finetune_resume_falls_back_to_chain_optimizer(tmp_path):
    """A checkpoint written with the optax-chain opt_state (pre-fused-AdamW
    format, or any accum_steps > 1 run) fails orbax structure matching
    against FusedAdamWState; run_train must detect that and resume with the
    chain optimizer instead of crashing (ADVICE round 4)."""
    from flax import linen as nn

    from cinema_tpu.config import apply_overrides, load_config
    from cinema_tpu.train.loop import run_train
    from cinema_tpu.train.optim import build_optimizer
    from cinema_tpu.train.state import TrainState

    from pathlib import Path

    config_path = (
        Path(__file__).parent.parent / "cinema_tpu" / "configs" / "segmentation" / "acdc.yaml"
    )

    class _Data:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return {"sax_image": np.full((4, 4, 1), float(i), np.float32)}

    class _Tiny(nn.Module):
        @nn.compact
        def __call__(self, images, deterministic=True):
            return nn.Dense(2)(images["sax"].reshape(images["sax"].shape[0], -1))

    def loss_fn(model, params, batch, rng):
        out = model.apply(params, {"sax": jnp.asarray(batch["sax_image"])})
        return jnp.mean(out**2), ({"loss": jnp.mean(out**2)}, {})

    # old-format checkpoint: same model/params, CHAIN opt_state (fused=False)
    model = _Tiny()
    variables = model.init(jax.random.PRNGKey(0), {"sax": jnp.zeros((1, 4, 4, 1))})
    chain_tx = build_optimizer(
        variables, lr=1e-3, warmup_steps=0, max_n_steps=10, clip_grad=5.0, fused=False
    )
    old_state = TrainState.create(variables, chain_tx)
    old_path = save_checkpoint(tmp_path / "old", old_state, epoch=1)

    overrides = [
        "train.batch_size=2",
        "train.batch_size_per_device=2",
        "train.n_epochs=2",
        "train.n_warmup_epochs=0",
        "train.eval_interval=1",
        "train.n_workers=1",
        f"train.resume_path={old_path}",
        f"logging.dir={tmp_path / 'runs'}",
    ]
    out_dir = run_train(
        apply_overrides(load_config(config_path), overrides),
        load_dataset=lambda c: (_Data(), _Data()),
        get_model_fn=lambda c: _Tiny(),
        loss_fn=loss_fn,
        eval_dataloader_fn=lambda m, p, l, c: {"mean_dice_score": 0.5},
    )
    metrics = [
        json.loads(line) for line in (out_dir / "metrics.jsonl").read_text().splitlines()
    ]
    assert any("train_loss" in m for m in metrics), "resumed run must train"


@pytest.mark.slow
def test_pretrain_run_and_resume(tmp_path):
    """ukb_mae_pretrain end-to-end on synthetic 4D studies, then resume from
    its checkpoint: the second run starts past epoch 0 and extends the
    metrics log instead of retraining from scratch."""
    from cinema_tpu.config import apply_overrides, load_config
    from cinema_tpu.data.nifti import save_nifti
    from cinema_tpu.tasks.pretrain import DEFAULT_CONFIG, run

    data_dir = tmp_path / "ukb"
    rng = np.random.default_rng(0)
    for i in range(8):
        pid = f"study{i:02d}"
        pid_dir = data_dir / pid
        pid_dir.mkdir(parents=True)
        sax = rng.uniform(0, 1, size=(12, 12, 3, 2)).astype(np.float32)
        lax = rng.uniform(0, 1, size=(26, 26, 1, 2)).astype(np.float32)
        save_nifti(pid_dir / f"{pid}_sax_t.nii.gz", sax, spacing=(1, 1, 10, 1))
        save_nifti(pid_dir / f"{pid}_lax_2c_t.nii.gz", lax, spacing=(1, 1, 10, 1))

    def cfg(n_epochs, ckpt_path=None):
        overrides = [
            f"data.dir={data_dir}",
            "data.sax.patch_size=[16,16,4]",
            "data.lax.patch_size=[32,32]",
            "transform.scale_range=0.1",
            "model.size=tiny",
            "model.views=[sax,lax_2c]",
            "model.enc_conv_chans=[4,8]",
            "model.enc_conv_n_blocks=1",
            "train.batch_size=8",
            "train.batch_size_per_device=1",
            f"train.n_epochs={n_epochs}",
            "train.n_warmup_epochs=0",
            "train.max_n_ckpts=3",
            "train.n_workers_per_device=2",
            "grad_ckpt=false",
            f"logging.dir={tmp_path / 'runs'}",
        ]
        if ckpt_path:
            overrides.append(f"train.ckpt_path={ckpt_path}")
        return apply_overrides(load_config(DEFAULT_CONFIG), overrides)

    run(cfg(n_epochs=1))
    run_dirs = sorted((tmp_path / "runs").iterdir())
    first = run_dirs[0]
    assert (first / "ckpt_0").exists()
    assert (first / "cinema.safetensors").exists()

    run(cfg(n_epochs=2, ckpt_path=first / "ckpt_0"))
    second = [d for d in sorted((tmp_path / "runs").iterdir()) if d != first][0]
    metrics = [
        json.loads(line) for line in (second / "metrics.jsonl").read_text().splitlines()
    ]
    epochs = [m["epoch"] for m in metrics if "loss" in m]
    assert epochs == [1], f"resume must continue at epoch 1, logged {epochs}"
    assert np.isfinite([m["loss"] for m in metrics if "loss" in m][0])
    assert (second / "ckpt_1").exists()
