"""Formula-expression optimizer — the reference's ``Expression.prepare``
pass (Expression.swift:43-48, 366-390; Function.swift:146-275) as an AST
rewrite ahead of Column compilation. Catalyst re-does constant folding
and boolean simplification on the compiled plan, so this pass exists for
parity of the *expression layer* (folded formulas print/round-trip
simplified, as in the reference) and for the rewrites Catalyst does not
know about:

- **constant folding** of deterministic subtrees, evaluated under Warp
  value coercion (the same evaluator the inference engine uses, so the
  fold is semantics-exact); invalid-producing trees stay unfolded (the
  compiled tier represents invalid per-operator — NULL vs NaN);
- **idempotent-function collapse** — ``UPPER(UPPER(x)) → UPPER(x)``
  (Function.swift:459-466: uppercase, lowercase, trim, abs, capitalize,
  floor, ceiling);
- **identical-operand comparison folding** — ``x+1 > x+1 → FALSE`` for
  ``> < <>`` over deterministic operands (Expression.swift:370-383;
  safe for all value classes: invalid compares false, and equal valid
  values are not ``>``/``<``/``<>``).

Differentially tested the way the reference tests its coalescer:
``evaluate(prepare(e), row) == evaluate(e, row)`` on generated
expressions and rows (test_optimize.py).
"""

from __future__ import annotations

from dataclasses import fields, replace

from warp_spark.formula import (
    Binary,
    Call,
    ErrorConstant,
    Identity,
    Index,
    KeyLookup,
    ListLiteral,
    Literal,
    Node,
    Sibling,
)
from warp_spark.infer import _BINARY_EVAL, INVALID, UNARY_FUNCTIONS, evaluate

# Function.swift:423-433
NONDETERMINISTIC = {"random", "randomBetween", "randomItem", "randomString", "now", "uuid"}
# Function.swift:459-466 (``absolute`` is canonical ``abs`` here)
IDEMPOTENT = {"uppercase", "lowercase", "trim", "abs", "capitalize", "floor", "ceiling"}

# only fold what the driver-side evaluator faithfully implements — for
# anything else it returns INVALID as an inference score, which must NOT
# become an ERROR fold
_FOLDABLE_CALLS = (
    set(UNARY_FUNCTIONS)
    | {"split", "nth", "items", "left", "right", "mid", "substitute", "concat"}
) - NONDETERMINISTIC


def _children(n: Node) -> list[Node]:
    out = []
    for f in fields(n):
        v = getattr(n, f.name)
        if isinstance(v, Node):
            out.append(v)
        elif isinstance(v, tuple):
            out.extend(x for x in v if isinstance(x, Node))
    return out


def is_constant(n: Node) -> bool:
    """No row/input dependency and no nondeterministic call anywhere
    (Call.isConstant honoring isDeterministic, Expression.swift:558-570)."""
    if isinstance(n, (Sibling, Identity)) or n.__class__.__name__ == "Foreign":
        return False
    if isinstance(n, Call) and n.function in NONDETERMINISTIC:
        return False
    return all(is_constant(c) for c in _children(n))


def _evaluable(n: Node) -> bool:
    """Tree is made only of nodes the local evaluator implements with
    exact Warp semantics — the precondition for a trustworthy fold."""
    if isinstance(n, (Literal, ErrorConstant)):
        return True
    if isinstance(n, Binary):
        return n.op in _BINARY_EVAL and _evaluable(n.left) and _evaluable(n.right)
    if isinstance(n, Call):
        return n.function in _FOLDABLE_CALLS and all(_evaluable(a) for a in n.args)
    return False


def _rewrite(n: Node) -> Node:
    # bottom-up
    if isinstance(n, Call):
        n = replace(n, args=tuple(_rewrite(a) for a in n.args))
        # idempotent collapse: f(f(x)) → f(x)
        if (
            n.function in IDEMPOTENT
            and len(n.args) == 1
            and isinstance(n.args[0], Call)
            and n.args[0].function == n.function
        ):
            n = n.args[0]
    elif isinstance(n, Binary):
        n = replace(n, left=_rewrite(n.left), right=_rewrite(n.right))
        # x ⊕ x → FALSE for ⊕ ∈ {>, <, <>} when x is deterministic:
        # equal valid values compare false under these ops, and invalid
        # compares false under every op (Expression.swift:370-383)
        if n.op in (">", "<", "<>") and n.left == n.right and not _has_nondeterministic(n.left):
            return Literal(False)
    elif isinstance(n, ListLiteral):
        n = replace(n, items=tuple(_rewrite(i) for i in n.items))
    elif isinstance(n, Index):
        n = replace(n, base=_rewrite(n.base), index=_rewrite(n.index))
    elif isinstance(n, KeyLookup):
        n = replace(n, base=_rewrite(n.base), key=_rewrite(n.key))
    return n


def _has_nondeterministic(n: Node) -> bool:
    if isinstance(n, Call) and n.function in NONDETERMINISTIC:
        return True
    return any(_has_nondeterministic(c) for c in _children(n))


def _fold(n: Node) -> Node:
    if isinstance(n, (Literal, ErrorConstant)):
        return n
    if is_constant(n) and _evaluable(n):
        try:
            v = evaluate(n, {})
        except Exception:
            return n
        if v is INVALID:
            # leave invalid-producing trees unfolded: the compiled tier
            # represents invalid per-operator (NULL from safe_div, NaN
            # from ERROR) and folding would change which one surfaces
            return n
        if v is None or isinstance(v, (bool, int, float, str, bytes)):
            return Literal(v)
        return n  # lists keep their structural form
    # non-constant: fold children
    if isinstance(n, Call):
        return replace(n, args=tuple(_fold(a) for a in n.args))
    if isinstance(n, Binary):
        return replace(n, left=_fold(n.left), right=_fold(n.right))
    if isinstance(n, ListLiteral):
        return replace(n, items=tuple(_fold(i) for i in n.items))
    if isinstance(n, Index):
        return replace(n, base=_fold(n.base), index=_fold(n.index))
    if isinstance(n, KeyLookup):
        return replace(n, base=_fold(n.base), key=_fold(n.key))
    return n


def prepare(n: Node) -> Node:
    """Optimize an expression tree; semantics-preserving (differential
    tests). Idempotent: prepare(prepare(e)) == prepare(e)."""
    return _fold(_rewrite(n))
