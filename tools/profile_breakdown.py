"""Join a jax.profiler TPU trace with compiled-HLO metadata for a per-component
ms/step breakdown.

The trace (`vm.trace.json.gz`, pid 3 / tid 3 = "XLA Ops") names ops by their
HLO instruction name (`fusion.5887`, `attn.60`, ...). The compiled HLO carries
`metadata={op_name="jit(step_fn)/jvp(...)/encoder/blocks_3/mlp/..."}` for each
instruction — joining the two attributes every fused op to the model component
that produced it. NOTE: the join only works against the HLO compiled for the
SAME backend the trace came from (TPU names differ from CPU names).

Usage:
    # 1. capture trace + HLO (bench.py --profile does both):
    #      CINEMA_PROFILE_DIR=/tmp/prof python bench.py --profile
    # 2. analyze:
    #      python tools/profile_breakdown.py /tmp/prof [n_steps]

Reference analog: none — the reference has no profiling subsystem
(SURVEY.md section 5.1); this supplies the jax.profiler-based equivalent.
"""

from __future__ import annotations

import glob
import gzip
import json
import re
import sys
from collections import defaultdict


def load_trace_events(profile_dir: str) -> dict[str, float]:
    """Return {hlo_instruction_name: total_us} for TPU leaf ops."""
    paths = glob.glob(f"{profile_dir}/plugins/profile/*/[a-z]*.trace.json.gz")
    if not paths:
        raise SystemExit(f"no trace under {profile_dir}")
    path = sorted(paths)[-1]
    with gzip.open(path) as f:
        trace = json.load(f)
    by_name: dict[str, float] = defaultdict(float)
    for e in trace["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") == 3 and e.get("tid") == 3 and "dur" in e:
            by_name[e["name"]] += e["dur"]
    return by_name


def parse_hlo_op_names(hlo_text: str) -> dict[str, str]:
    """Map HLO instruction name -> metadata op_name."""
    mapping: dict[str, str] = {}
    # instruction lines look like:  %fusion.5887 = ... metadata={op_name="..." ...}
    pat = re.compile(r"%([\w.-]+) = .*?metadata=\{[^}]*op_name=\"([^\"]+)\"")
    for line in hlo_text.splitlines():
        m = pat.search(line)
        if m:
            mapping[m.group(1)] = m.group(2)
    return mapping


def component_of(op_name: str, depth: int = 3) -> str:
    """Compress a jit op_name path to a readable component key."""
    # drop the jit(...)/ prefix and transpose wrappers
    parts = [
        p
        for p in op_name.split("/")
        if not p.startswith("jit(")
        and p not in ("jvp(step_fn)", "transpose(jvp(step_fn))")
    ]
    grad = "bwd" if "transpose(jvp" in op_name else "fwd"
    return "/".join(parts[:depth]) + f" [{grad}]"


def main() -> None:
    profile_dir = sys.argv[1]
    n_steps = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    hlo_paths = glob.glob(f"{profile_dir}/*.hlo.txt") + glob.glob(
        f"{profile_dir}/hlo/*.txt"
    )

    by_name = load_trace_events(profile_dir)
    total = sum(by_name.values()) / 1e3 / n_steps
    print(f"TPU busy: {total:.1f} ms/step over {n_steps:.0f} steps")

    mapping: dict[str, str] = {}
    for p in hlo_paths:
        with open(p) as f:
            mapping.update(parse_hlo_op_names(f.read()))

    groups: dict[str, float] = defaultdict(float)
    unattributed: dict[str, float] = defaultdict(float)
    for name, us in by_name.items():
        op_name = mapping.get(name)
        if op_name is None:
            base = re.sub(r"[.\d]+$", "", name)
            unattributed[base] += us
        else:
            groups[component_of(op_name)] += us

    if mapping:
        print("\n== attributed components (ms/step) ==")
        for g, us in sorted(groups.items(), key=lambda kv: -kv[1]):
            if us / 1e3 / n_steps >= 0.2:
                print(f"{us/1e3/n_steps:9.2f}  {g}")
        print("\n== unattributed families (ms/step) ==")
    else:
        print("\n(no HLO dump found — showing op families only)\n")
    for g, us in sorted(unattributed.items(), key=lambda kv: -kv[1]):
        if us / 1e3 / n_steps >= 0.2:
            print(f"{us/1e3/n_steps:9.2f}  {g}")


if __name__ == "__main__":
    main()
