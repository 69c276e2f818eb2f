"""Smoke test: every example script must import cleanly.

Round-1 regression: examples/train/pretrain.py imported a non-existent
symbol and crashed on import; nothing caught it because no test touched
the examples. This test imports all 16 scripts (reference surface:
cinema/examples/{inference,train}/*.py) and asserts each exposes main().
"""

from __future__ import annotations

import importlib.util
from pathlib import Path

import pytest

EXAMPLES_DIR = Path(__file__).resolve().parents[1] / "examples"
SCRIPTS = sorted(EXAMPLES_DIR.glob("*/*.py")) + sorted(EXAMPLES_DIR.glob("*.py"))


def test_examples_present():
    # 12 inference + 4 train scripts + root cine_cmr.py (reference surface)
    assert len(SCRIPTS) == 17, [p.name for p in SCRIPTS]


@pytest.mark.parametrize("script", SCRIPTS, ids=lambda p: f"{p.parent.name}/{p.stem}")
def test_example_imports_and_has_main(script: Path):
    spec = importlib.util.spec_from_file_location(
        f"example_{script.parent.name}_{script.stem}", script
    )
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)  # raises on any import/module-level error
    assert callable(getattr(module, "main", None)), f"{script} lacks main()"
