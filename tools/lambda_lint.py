#!/usr/bin/env python3
"""Static lint: no whole-column heavy expression may appear inside a
higher-order-function LAMBDA BODY.

A lambda body that says ``split(text, ' ')`` re-tokenizes the whole
document once per array ELEMENT: Spark's higher-order functions get no
loop-invariant hoisting, and Catalyst's subexpression elimination
explicitly skips lambda bodies — so ``transform(sequence(...), i ->
slice(split(text, ' '), i, 3))`` is O(tokens²) per row where the staged
form (project ``split(text, ' ')`` as its own column, index the
attribute in the lambda) is O(tokens). Measured 3.5× on the trigram
extraction in isolation; 2-15× on the round-10 query fixes
(bpe_pair_stats 2.86→0.5s, quality_gate_ablation 7.96→0.66s at 10×).

What counts as heavy-per-element: re-deriving a whole-row value inside
the body — ``split(<col>``, ``md5(<col>)`` of the raw column,
``regexp_extract_all(<col>``, ``sentences(<col>``. What does NOT:
per-element work on a SLICE of the row value (``md5(substring(text, i,
5))`` in the winnowing hasher hashes five chars per element — that IS
the work), or heavy expressions as the HOF's ARGUMENT (evaluated once
per row): ``filter(split(text, ' '), x -> ...)`` is fine.

Scope: string constants inside non-``oracle_*`` functions of the plan /
operator / function / streaming modules (oracle strings are DuckDB SQL —
a different engine, not our hot path). The scanner tracks parenthesis
depth so text after a lambda's closing paren is not attributed to it.
"""

from __future__ import annotations

import ast
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
PKG = REPO / "northwind_warehouse_spark"
LINT_FILES = (
    sorted((PKG / "plans").glob("*.py"))
    + sorted((PKG / "operators").glob("*.py"))
    + sorted((PKG / "functions").glob("*.py"))
    + sorted((PKG / "streaming").glob("*.py"))
)

# Spark-side spellings of "re-derive a whole-row value", each capturing
# the identifier the heavy function is applied to. The negative
# lookbehind keeps DuckDB's string_split(...) (oracle dialect) from
# matching split(. Applying the heavy function to the LAMBDA'S OWN
# variable is exempt — ``transform(split(text, '. '), s -> split(s, '
# '))`` tokenizes one sentence per element, which IS the work.
FORBIDDEN = [
    re.compile(r"(?<![a-z_])split\s*\(\s*([a-z_][a-z0-9_]*)"),
    re.compile(r"(?<![a-z_])md5\s*\(\s*([a-z_][a-z0-9_]*)\s*\)"),
    re.compile(r"(?<![a-z_])regexp_extract_all\s*\(\s*([a-z_][a-z0-9_]*)"),
    re.compile(r"(?<![a-z_])sentences\s*\(\s*([a-z_][a-z0-9_]*)"),
]
_ARROW = re.compile(r"->")
_PARAMS_BEFORE = re.compile(r"(\(([^()]*)\)|([a-z_][a-z0-9_]*))\s*$")


def _lambda_bodies(expr: str) -> list[tuple[set[str], str]]:
    """Extract each lambda from a SQL expression string: its parameter
    names (the token or parenthesized tuple before ``->``) and its body
    (the text from ``->`` to the comma or closing paren at the same
    depth)."""
    bodies: list[tuple[set[str], str]] = []
    for m in _ARROW.finditer(expr):
        pm = _PARAMS_BEFORE.search(expr[: m.start()])
        params: set[str] = set()
        if pm:
            inner = pm.group(2) if pm.group(2) is not None else pm.group(3)
            params = {p.strip() for p in inner.split(",") if p.strip()}
        depth = 0
        start = m.end()
        end = len(expr)
        for i in range(start, len(expr)):
            c = expr[i]
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    end = i
                    break
                depth -= 1
            elif c == "," and depth == 0:
                end = i
                break
        bodies.append((params, expr[start:end]))
    return bodies


def _string_constants(fn: ast.FunctionDef) -> list[tuple[int, str]]:
    """(lineno, value) for every string constant in the function,
    including f-string literal parts (formatted values become a
    placeholder so patterns spanning them still read naturally)."""
    out: list[tuple[int, str]] = []
    # fragments of f-strings are visited again as bare Constants by
    # ast.walk — scan each f-string ONCE via its joined form (r10
    # advice: the double visit duplicated violation lines and scanned
    # fragments out of their joined context)
    fstring_parts: set[int] = {
        id(v)
        for n in ast.walk(fn)
        if isinstance(n, ast.JoinedStr)
        for v in n.values
    }
    for n in ast.walk(fn):
        if (
            isinstance(n, ast.Constant)
            and isinstance(n.value, str)
            and id(n) not in fstring_parts
        ):
            out.append((n.lineno, n.value))
        elif isinstance(n, ast.JoinedStr):
            parts = []
            for v in n.values:
                if isinstance(v, ast.Constant) and isinstance(v.value, str):
                    parts.append(v.value)
                else:
                    parts.append("<fmt>")
            out.append((n.lineno, "".join(parts)))
    return out


def find_violations(paths: list[Path] | None = None) -> list[str]:
    out: list[str] = []
    for path in paths if paths is not None else LINT_FILES:
        tree = ast.parse(path.read_text())
        for fn in ast.walk(tree):
            if not isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            if fn.name.startswith("oracle_"):
                continue
            for lineno, s in _string_constants(fn):
                if "->" not in s:
                    continue
                for params, body in _lambda_bodies(s):
                    for pat in FORBIDDEN:
                        for m in pat.finditer(body):
                            if m.group(1) in params:
                                continue
                            rel = (
                                path.relative_to(REPO)
                                if path.is_relative_to(REPO)
                                else path
                            )
                            out.append(
                                f"{rel}:{lineno} in {fn.name}(): heavy "
                                f"expression inside lambda body: "
                                f"...{body[max(0, m.start() - 10):m.end() + 20]}..."
                            )
    return out


if __name__ == "__main__":
    v = find_violations()
    for line in v:
        print(line)
    sys.exit(1 if v else 0)
