"""Module-level duplicate-definition net: a second top-level `def` (or
UPPER_CASE constant) with an existing name silently shadows the first —
the bug class that bit twice in round 9 (`_PROFILE_COLS` clobbered
orders_profile's column spec; a second `streaming_distinct_users`
shadowed the windowed one).  The registry guard catches duplicate QUERY
names; this catches duplicate PYTHON names, statically, for every
module in the package.  Pure-Python — no SparkSession."""

from __future__ import annotations

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parent.parent / "depositaja_spark"


def _top_level_names(tree: ast.Module) -> list[tuple[str, int]]:
    out = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            out.append((node.name, node.lineno))
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and (
                    t.id.isupper() or t.id.lstrip("_").isupper()
                ):
                    out.append((t.id, node.lineno))
        elif isinstance(node, ast.AnnAssign):
            t = node.target
            if isinstance(t, ast.Name) and (
                t.id.isupper() or t.id.lstrip("_").isupper()
            ):
                out.append((t.id, node.lineno))
    return out


def test_no_duplicate_top_level_definitions():
    problems = []
    for py in sorted(PKG.rglob("*.py")):
        tree = ast.parse(py.read_text())
        seen: dict[str, int] = {}
        for name, lineno in _top_level_names(tree):
            if name in seen:
                problems.append(
                    f"{py.relative_to(PKG.parent)}:{lineno} redefines "
                    f"{name!r} (first at line {seen[name]})"
                )
            else:
                seen[name] = lineno
    assert not problems, "\n".join(problems)
