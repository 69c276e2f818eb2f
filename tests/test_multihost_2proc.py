"""True 2-process multi-host smoke: ``jax.distributed.initialize`` over a
loopback coordinator (gloo CPU collectives), a global mesh spanning both
processes, per-process manifest shards assembled into global batches, and an
FSDP-sharded train step — asserting both ranks agree AND match the identical
single-process run (the reference's DDP equivalence, cinema/device.py:86-104,
which its CI never tests; SURVEY.md §4 'Distributed testing: none')."""

import os
import re
import socket
import subprocess
import sys
from pathlib import Path

import pytest

_WORKER = Path(__file__).with_name("multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run(pid: int, world: int, port: int, local_devices: int) -> subprocess.Popen:
    env = {
        k: v
        for k, v in os.environ.items()
        # drop the parent pytest session's jax/xla settings (conftest forces
        # its own 8-device CPU topology via these)
        if not k.startswith(("XLA_", "JAX_"))
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={local_devices}"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (str(_WORKER.parent.parent), env.get("PYTHONPATH")) if p
    )
    return subprocess.Popen(
        [sys.executable, str(_WORKER), str(pid), str(world), str(port)],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        env=env,
    )


def _result(out: str) -> tuple[float, float]:
    m = re.search(r"RESULT pid=\d+ loss=([-\d.]+) psum=([-\d.]+)", out)
    assert m, f"no RESULT line in worker output:\n{out[-3000:]}"
    return float(m.group(1)), float(m.group(2))


@pytest.mark.slow
def test_two_process_train_step_matches_single_process():
    port = _free_port()
    procs = [_run(pid, 2, port, local_devices=2) for pid in range(2)]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    (loss0, psum0), (loss1, psum1) = (_result(o) for o in outs)
    # both ranks hold the same global state
    assert loss0 == pytest.approx(loss1, rel=1e-6)
    assert psum0 == pytest.approx(psum1, rel=1e-6)

    single = _run(0, 1, _free_port(), local_devices=4)
    out = single.communicate(timeout=420)[0]
    assert single.returncode == 0, f"single-process worker failed:\n{out[-3000:]}"
    loss_s, psum_s = _result(out)
    # multi-process run computes the same optimization trajectory (batch-row
    # placement differs, mean-loss/SGD are row-order invariant)
    assert loss0 == pytest.approx(loss_s, rel=2e-5)
    assert psum0 == pytest.approx(psum_s, rel=2e-5)
