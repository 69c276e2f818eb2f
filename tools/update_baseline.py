"""Regenerate BASELINE.md's measured-status section from the newest
BENCH_r*.json (round-4 VERDICT Weak #3: the hand-written section went two
rounds stale and described pruned levers as pending).

Usage: python tools/update_baseline.py  (run after each round's bench)

The section between the MEASURED:BEGIN/END markers is machine-written;
everything outside them is the hand-maintained reference context.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

BEGIN = "<!-- MEASURED:BEGIN (machine-written by tools/update_baseline.py) -->"
END = "<!-- MEASURED:END -->"


def latest_bench() -> tuple[int, dict, str]:
    """(round, {metric: record}, source) from the newest BENCH_r*.json, or
    from a raw `bench.py` output log passed via --from (a locally captured
    run mid-round, before the driver writes the official file)."""
    if "--from" in sys.argv:
        path = Path(sys.argv[sys.argv.index("--from") + 1])
        tail = path.read_text()
        benches = sorted(REPO.glob("BENCH_r*.json"))
        n = int(re.search(r"BENCH_r(\d+)", benches[-1].name).group(1)) + 1 if benches else 1
        source = f"locally captured `bench.py` run (pre-driver, round {n})"
    else:
        benches = sorted(REPO.glob("BENCH_r*.json"))
        if not benches:
            sys.exit("no BENCH_r*.json found")
        path = benches[-1]
        n = int(re.search(r"BENCH_r(\d+)", path.name).group(1))
        doc = json.loads(path.read_text())
        tail = doc.get("tail", "")
        source = f"driver-captured `BENCH_r{n:02d}.json`"
    metrics = {}
    for line in tail.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "metric" in rec:
                metrics[rec["metric"]] = rec
    return n, metrics, source


def render(n: int, m: dict, source: str) -> str:
    lines = [
        BEGIN,
        f"## Measured status (round {n}, one TPU v5e chip — {source})",
        "",
        "| Metric | Value | Detail |",
        "|---|---|---|",
    ]
    p = m.get("mae_pretrain_throughput")
    if p:
        lines.append(
            f"| MAE pretrain | **{p['value']} clips/s/chip** | step {p.get('step_ms', '?')} ms, "
            f"{p.get('achieved_tflops', '?')} TFLOP/s ({100 * p.get('mfu', 0):.1f}% MFU), "
            f"{p.get('vs_baseline', '?')}x round-1; compile {p.get('compile_s', '?')} s cold / "
            f"{p.get('compile_s_warm', '?')} s fresh-process warm (AOT cache: {p.get('aot_cache', 'n/a')}) |"
        )
    s = m.get("seg_serving_throughput")
    if s:
        lines.append(
            f"| Cine serving | **{s['value']} frames/s/chip** | 50-frame 192×192×16, "
            f"{s.get('p50_ms_per_study', '?')} ms/study, best config {s.get('config', '?')} |"
        )
    l = m.get("seg_sliding_window_latency")
    if l:
        extra = ""
        if "amortized_ms_per_frame" in l:
            extra = (
                f"; amortized {l['amortized_ms_per_frame']} ms/frame "
                f"(single-dispatch p50 includes the {l.get('dispatch_floor_ms', '?')} ms "
                f"relay round trip)"
            )
        lines.append(
            f"| Sliding-window eval | **{l['value']} ms p50/frame** | p95 {l.get('p95_ms', '?')} ms, "
            f"192×192×24 SAX (2 z-patches in one forward){extra} |"
        )
    i = m.get("input_pipeline_throughput")
    if i:
        legacy = i.get("ms_per_item_read_legacy_gz")
        lines.append(
            f"| Input pipeline | **{i['value']} studies/s/host** | {i.get('vs_step_rate', '?')}x step rate "
            f"on this host; read {i.get('ms_per_item_read', '?')} ms/item"
            + (f" (legacy single-member gz: {legacy} ms)" if legacy else "")
            + f", transform {i.get('ms_per_item_transform', '?')} ms |"
        )
    for name, rec in m.items():
        if "error" in rec:
            lines.append(f"| {name} | error | {rec['error'][:120]} |")
    lines += [
        "",
        "Parity gates (ACDC Dice / CVD AUC vs the published checkpoints) remain",
        "**network-gated**: `scripts/real_checkpoint_ab.py` runs the whole A/B",
        "unattended the moment egress exists; the offline proxies (603/603-key",
        "manifest, ≤2e-4 torch-oracle agreement) are green. The A100 side of the",
        "throughput target is **hardware-gated**: `scripts/a100_serving_bench.py`",
        "is the one-command GPU-side measurement.",
        END,
    ]
    return "\n".join(lines)


def main() -> None:
    n, metrics, source = latest_bench()
    baseline = REPO / "BASELINE.md"
    text = baseline.read_text()
    block = render(n, metrics, source)
    if BEGIN in text:
        text = re.sub(re.escape(BEGIN) + r".*?" + re.escape(END), block, text, flags=re.S)
    else:
        # replace any legacy hand-written measured-status section wholesale
        idx = text.find("## Measured status")
        text = (text[:idx] if idx != -1 else text).rstrip() + "\n\n" + block + "\n"
    baseline.write_text(text)
    print(f"BASELINE.md measured section regenerated ({source}).")


if __name__ == "__main__":
    main()
