#!/usr/bin/env python
"""Dependency-free lint gate (stdlib only).

The full lint story is ruff + mypy (configured in pyproject.toml, run by
.github/workflows/pre-commit.yml); this script is the subset that can run in
a hermetic image with no lint tools installed, so the tree always has a
locally enforceable gate:

1. every .py file parses (ast.parse);
2. no unused imports (AST usage scan; ``__init__.py`` re-export files and
   names in ``__all__`` are exempt, as are ``# noqa`` lines);
3. no trailing whitespace / tab indentation;
4. no ``print(`` in library code (``cinema_tpu/``) outside CLIs — loggers
   only (files with an argparse/console ``main`` are exempt).

Exit code 0 = clean.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
TARGETS = ["cinema_tpu", "tests", "examples", "tools", "bench.py", "__graft_entry__.py"]


def iter_files():
    for t in TARGETS:
        p = REPO / t
        if p.is_file():
            yield p
        else:
            yield from sorted(p.rglob("*.py"))


def _used_names(tree: ast.AST) -> set:
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # record the root name of dotted access (np.foo -> np)
            n = node
            while isinstance(n, ast.Attribute):
                n = n.value
            if isinstance(n, ast.Name):
                used.add(n.id)
    return used


def check_unused_imports(path: Path, tree: ast.Module, src_lines) -> list:
    if path.name == "__init__.py":
        return []
    exported = set()
    for node in tree.body:
        if isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name) and tgt.id == "__all__":
                    if isinstance(node.value, (ast.List, ast.Tuple)):
                        exported = {
                            e.value for e in node.value.elts if isinstance(e, ast.Constant)
                        }
    used = _used_names(tree)
    problems = []
    for node in ast.walk(tree):
        if not isinstance(node, (ast.Import, ast.ImportFrom)):
            continue
        line = src_lines[node.lineno - 1]
        if "# noqa" in line:
            continue
        if isinstance(node, ast.ImportFrom) and node.module == "__future__":
            continue
        for alias in node.names:
            if alias.name == "*":
                continue
            name = (alias.asname or alias.name).split(".")[0]
            if name not in used and name not in exported:
                problems.append(f"{path}:{node.lineno}: unused import '{name}'")
    return problems


def _has_cli_main(tree: ast.Module) -> bool:
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name.startswith("main"):
            return True
    return False


def main() -> int:
    problems = []
    for path in iter_files():
        rel = path.relative_to(REPO)
        try:
            src = path.read_text()
        except UnicodeDecodeError:
            problems.append(f"{rel}: not utf-8")
            continue
        try:
            tree = ast.parse(src, filename=str(rel))
        except SyntaxError as e:
            problems.append(f"{rel}:{e.lineno}: syntax error: {e.msg}")
            continue
        lines = src.split("\n")
        for i, line in enumerate(lines, 1):
            if line != line.rstrip():
                problems.append(f"{rel}:{i}: trailing whitespace")
            if line.startswith("\t"):
                problems.append(f"{rel}:{i}: tab indentation")
        problems.extend(check_unused_imports(path, tree, lines))
        if str(rel).startswith("cinema_tpu/") and not _has_cli_main(tree):
            for node in ast.walk(tree):
                if (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Name)
                    and node.func.id == "print"
                    and "# noqa" not in lines[node.lineno - 1]
                ):
                    problems.append(f"{rel}:{node.lineno}: print() in library code (use logger)")
    for p in problems:
        print(p)
    print(f"lint: {len(problems)} problem(s)")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
