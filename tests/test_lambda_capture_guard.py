"""Guard against the expression-capture quadratic (r14/r15 audit).

The defect class: an array/string EXPRESSION captured inside a
positional ``F.transform(F.sequence(...), lambda i: ...)`` lambda is
re-evaluated on every ``element_at``/``slice``/``substring`` access —
the captured expression re-runs once per index, turning an O(n)
builder into O(n²) per row. Shipped twice before being caught:

- ``text.repetition_stats`` captured ``tokens(text)`` in its gram
  lambda for 13 rounds (fixed r14 — 14.9 s → 2.0 s at sf0.1);
- ``matching.match_partial_blocked`` captured ``lower(name)`` and
  ``multimodal.phash_signatures`` captured ``hex(payload)``
  (both fixed r15, found by this audit).

The rule this test enforces over the whole operator tree: inside the
lambda of a positional transform (first arg ``F.sequence(...)``),
every indexed operand — the first argument of ``F.element_at`` /
``F.slice`` / ``F.substring`` / ``F.get``, or the receiver of
``.substr`` — must be a COLUMN: an inline ``F.col(...)`` call, a
local name assigned from ``F.col(...)``, or a function parameter
whose column-ness is a documented contract (the explicit allowlist
below). Anything else — a call like ``F.lower(...)``/``F.hex(...)``,
or a name bound to such an expression — fails the build.

SQL-string forms (``F.expr("transform(sequence(...), ...)")``) are
immune by construction: a bare name inside ``F.expr`` can only
resolve to a column.
"""

from __future__ import annotations

import ast
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "tepsonic_database_sync_spark"

# (file stem, function name, parameter) whose docstring contracts the
# parameter to be a materialized column. Adding a NEW entry here is a
# conscious act — the docstring must state the column contract.
COLUMN_CONTRACT_PARAMS = {
    ("text", "grams_expr", "arr"),
    ("matching", "delete_variants", "s"),
}

INDEXERS_F = {"element_at", "slice", "substring", "get"}


def _is_f_call(node: ast.AST, names: set[str]) -> bool:
    return (
        isinstance(node, ast.Call)
        and isinstance(node.func, ast.Attribute)
        and isinstance(node.func.value, ast.Name)
        and node.func.value.id == "F"
        and node.func.attr in names
    )


def _collect_fcol_names(fn: ast.AST) -> set[str]:
    """Names whose EVERY binding in the enclosing function is from
    F.col(...). A name that is ever rebound to anything else — even
    after a clean F.col binding — is rejected (ADVICE r15: set-wise
    collection let ``x = F.col('a'); x = F.hex(x)`` evade the guard).
    ``ast.walk`` order is not source order, so an "ever rebound"
    rule is used instead of "last binding": order-independent and
    strictly conservative."""
    col_bound: set[str] = set()
    rebound: set[str] = set()

    def _reject_all(target: ast.AST) -> None:
        for n in ast.walk(target):
            if isinstance(n, ast.Name):
                rebound.add(n.id)

    for node in ast.walk(fn):
        if isinstance(node, ast.Assign):
            ok = _is_f_call(node.value, {"col"})
            for t in node.targets:
                if isinstance(t, ast.Name) and ok:
                    col_bound.add(t.id)
                else:
                    _reject_all(t)
        elif isinstance(node, (ast.AnnAssign, ast.AugAssign)):
            if (
                isinstance(node, ast.AnnAssign)
                and isinstance(node.target, ast.Name)
                and node.value is not None
                and _is_f_call(node.value, {"col"})
            ):
                col_bound.add(node.target.id)
            else:
                _reject_all(node.target)
        elif isinstance(node, ast.NamedExpr):
            if isinstance(node.target, ast.Name) and _is_f_call(
                node.value, {"col"}
            ):
                col_bound.add(node.target.id)
            else:
                _reject_all(node.target)
        elif isinstance(node, (ast.For, ast.AsyncFor)):
            _reject_all(node.target)
        elif isinstance(node, (ast.With, ast.AsyncWith)):
            for item in node.items:
                if item.optional_vars is not None:
                    _reject_all(item.optional_vars)
        elif isinstance(node, ast.comprehension):
            _reject_all(node.target)
    return col_bound - rebound


def _indexed_operands(lam: ast.Lambda):
    """Yield (node, description) for every indexed operand inside the
    lambda body."""
    for node in ast.walk(lam.body):
        if _is_f_call(node, INDEXERS_F) and node.args:
            yield node.args[0], f"F.{node.func.attr}"
        elif (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "substr"
        ):
            yield node.func.value, ".substr"


def _operand_ok(
    op: ast.AST, fcol_names: set[str], params: set[str], stem: str, fname: str
) -> bool:
    if _is_f_call(op, {"col"}):
        return True
    if isinstance(op, ast.Name):
        if op.id in fcol_names:
            return True
        if op.id in params:
            return (stem, fname, op.id) in COLUMN_CONTRACT_PARAMS
        return False
    return False


def test_no_row_at_a_time_python_udfs_in_package():
    """Package-wide doctrine pin (previously verified by ad-hoc grep in
    the round verdicts): no ``F.udf`` / ``@udf`` / ``@F.udf`` anywhere
    in the operator tree. All Python-boundary work must be
    Arrow-batched (mapInPandas / applyInPandas /
    applyInPandasWithState) — a row-at-a-time UDF is a 10-100×
    regression on the hot path and must not ship silently."""
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        tree = ast.parse(path.read_text())
        for node in ast.walk(tree):
            if _is_f_call(node, {"udf"}):
                offenders.append(f"{path.name}:{node.lineno} F.udf")
            elif (
                isinstance(node, ast.Name)
                and node.id == "udf"
                and isinstance(getattr(node, "ctx", None), ast.Load)
            ):
                offenders.append(f"{path.name}:{node.lineno} bare udf")
    assert not offenders, offenders


def test_no_expression_capture_in_positional_transforms():
    violations = []
    for path in sorted(PKG.rglob("*.py")):
        tree = ast.parse(path.read_text())
        stem = path.stem
        for fn in ast.walk(tree):
            if not isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            fcol_names = _collect_fcol_names(fn)
            params = {a.arg for a in fn.args.args + fn.args.kwonlyargs}
            for node in ast.walk(fn):
                # positional transform: F.transform(F.sequence(...), lambda)
                if not (
                    _is_f_call(node, {"transform"})
                    and len(node.args) >= 2
                    and _is_f_call(node.args[0], {"sequence"})
                    and isinstance(node.args[1], ast.Lambda)
                ):
                    continue
                lam = node.args[1]
                for op, kind in _indexed_operands(lam):
                    if not _operand_ok(op, fcol_names, params, stem, fn.name):
                        violations.append(
                            f"{path.relative_to(PKG.parent)}:{op.lineno}"
                            f" {fn.name}: {kind} indexes"
                            f" {ast.unparse(op)!r} — not a column"
                        )
    assert not violations, (
        "expression captured inside a positional transform lambda "
        "(O(n²) per row — materialize it as a column first):\n"
        + "\n".join(violations)
    )


def test_guard_catches_the_known_defect_shape():
    """The guard must flag the exact shapes that shipped: an F.* call
    (not F.col) as the indexed operand, and a name bound to one."""
    bad = '''
def f(docs):
    hx = F.hex(F.col("payload"))
    return F.transform(
        F.sequence(F.lit(0), F.lit(3)),
        lambda i: F.substring(hx, i, 2),
    )
'''
    tree = ast.parse(bad)
    fn = tree.body[0]
    fcol_names = _collect_fcol_names(fn)
    assert "hx" not in fcol_names
    hits = [
        op
        for node in ast.walk(fn)
        if _is_f_call(node, {"transform"})
        and _is_f_call(node.args[0], {"sequence"})
        and isinstance(node.args[1], ast.Lambda)
        for op, _ in _indexed_operands(node.args[1])
        if not _operand_ok(op, fcol_names, {"docs"}, "x", "f")
    ]
    assert len(hits) == 1 and isinstance(hits[0], ast.Name)


def test_guard_catches_the_rebind_evasion_shape():
    """A name first bound to F.col(...) then REBOUND to an expression
    must not pass (ADVICE r15): set-wise F.col collection would accept
    ``x`` here even though the indexed operand is F.hex(F.col(...))."""
    bad = '''
def f(docs):
    x = F.col("payload")
    x = F.hex(x)
    return F.transform(
        F.sequence(F.lit(0), F.lit(3)),
        lambda i: F.substring(x, i, 2),
    )
'''
    tree = ast.parse(bad)
    fn = tree.body[0]
    fcol_names = _collect_fcol_names(fn)
    assert "x" not in fcol_names
    hits = [
        op
        for node in ast.walk(fn)
        if _is_f_call(node, {"transform"})
        and _is_f_call(node.args[0], {"sequence"})
        and isinstance(node.args[1], ast.Lambda)
        for op, _ in _indexed_operands(node.args[1])
        if not _operand_ok(op, fcol_names, {"docs"}, "x", "f")
    ]
    assert len(hits) == 1 and isinstance(hits[0], ast.Name)
