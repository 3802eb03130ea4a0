"""Programming-by-example formula inference.

Re-implements the reference's ``Expression.infer`` search
(WarpCore/Sources/Expression.swift:112-196): given an example row and a
target value, propose formulas that transform the row (or the current
cell) into the target. Candidate generators mirror the per-class
``suggest`` implementations — Sibling (Expression.swift:769-784),
Literal (269-274), Identity (319-321), Comparison arithmetic/string
composition (442-520), Call unary-function / split / substring probes
(642-720) — and the canonical acceptance test is the reference's
"24 game" (WarpCoreTests.swift:893-900).

Deliberately driver-side: the search evaluates thousands of tiny
candidate expressions against ONE example row, which is pure Python
work; the *winning* formula is an ordinary AST that compiles through
``formula.to_column`` into a Spark Column and runs distributed over the
full dataset. (The reference does the same: infer runs on the sampled
example row in the UI, the chosen formula joins the step chain.)

Local evaluation follows the Warp ``Value`` coercion model
(Value.swift:484-636): arithmetic coerces through doubleValue and
yields *invalid* on failure, ``&`` concatenates, comparisons are
numeric when either side is numeric, *invalid* equals nothing
(including itself), and *empty* (None) sorts below everything.
"""

from __future__ import annotations

import math
from typing import Callable, Mapping, Optional, Sequence, Union

from warp_spark.formula import (
    Binary,
    Call,
    ErrorConstant,
    Identity,
    Index,
    Literal,
    Node,
    Sibling,
    unparse,
)


class _Invalid:
    """Warp ``.invalid`` (Value.swift:54): result of any failed
    operation; equal to nothing, including itself."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self):
        return "INVALID"


INVALID = _Invalid()

ValueLike = Union[None, bool, int, float, str, bytes, list, _Invalid]


# ---------------------------------------------------------------------------
# Warp Value semantics, evaluated locally (Value.swift:133-186, 484-636)
# ---------------------------------------------------------------------------

def _to_double(v: ValueLike) -> Optional[float]:
    if v is INVALID or v is None:
        return None
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, (int, float)):
        f = float(v)
        return None if math.isnan(f) or math.isinf(f) else f
    if isinstance(v, str):
        try:
            s = v.strip()
            return float(s) if s else None
        except ValueError:
            return None
    return None


def _to_string(v: ValueLike) -> Optional[str]:
    if v is INVALID or v is None:
        return None
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float) and v == int(v):
        return str(int(v))
    if isinstance(v, (int, float, str)):
        return str(v)
    return None


def value_eq(a: ValueLike, b: ValueLike) -> bool:
    """Warp equality: invalid equals nothing; numeric compare when both
    sides coerce to numbers, else string equality (Value.swift:547-581)."""
    if a is INVALID or b is INVALID:
        return False
    if a is None or b is None:
        return a is None and b is None
    an, bn = _to_double(a), _to_double(b)
    if an is not None and bn is not None:
        return an == bn
    return _to_string(a) == _to_string(b)


def _num2(a: ValueLike, b: ValueLike, op: Callable[[float, float], float]) -> ValueLike:
    an, bn = _to_double(a), _to_double(b)
    if an is None or bn is None:
        return INVALID
    try:
        r = op(an, bn)
    except (ZeroDivisionError, ValueError, OverflowError):
        return INVALID
    if isinstance(r, float) and (math.isnan(r) or math.isinf(r)):
        return INVALID
    return r


def _num_cmp(a: ValueLike, b: ValueLike, op: Callable) -> ValueLike:
    if a is INVALID or b is INVALID or a is None or b is None:
        return INVALID
    an, bn = _to_double(a), _to_double(b)
    if an is not None and bn is not None:
        return op(an, bn)
    sa, sb = _to_string(a), _to_string(b)
    if sa is None or sb is None:
        return INVALID
    return op(sa, sb)


def _unary_num(fn: Callable[[float], float]) -> Callable[[ValueLike], ValueLike]:
    def wrapped(v: ValueLike) -> ValueLike:
        n = _to_double(v)
        if n is None:
            return INVALID
        try:
            r = fn(n)
        except (ValueError, OverflowError, ZeroDivisionError):
            return INVALID
        if math.isnan(r) or math.isinf(r):
            return INVALID
        return r

    return wrapped


def _unary_str(fn: Callable[[str], ValueLike]) -> Callable[[ValueLike], ValueLike]:
    def wrapped(v: ValueLike) -> ValueLike:
        s = _to_string(v)
        return INVALID if s is None else fn(s)

    return wrapped


# Deterministic unary functions probed by Call.suggest
# (Expression.swift:647-653: arity 1, deterministic, not identity).
# Canonical names match functions/scalar.py so the winning formula
# compiles to the same semantics on Spark.
UNARY_FUNCTIONS: dict[str, Callable[[ValueLike], ValueLike]] = {
    "uppercase": _unary_str(str.upper),
    "lowercase": _unary_str(str.lower),
    "capitalize": _unary_str(lambda s: s.title()),
    "trim": _unary_str(str.strip),
    "length": _unary_str(len),
    "negate": _unary_num(lambda x: -x),
    "abs": _unary_num(abs),
    "sqrt": _unary_num(math.sqrt),
    "exp": _unary_num(math.exp),
    "ln": _unary_num(math.log),
    "floor": _unary_num(math.floor),
    "ceiling": _unary_num(math.ceil),
    "sign": _unary_num(lambda x: (x > 0) - (x < 0)),
    "round": _unary_num(lambda x: float(round(x))),
    "sin": _unary_num(math.sin),
    "cos": _unary_num(math.cos),
    "tan": _unary_num(math.tan),
}


def _apply_call(name: str, args: Sequence[ValueLike]) -> ValueLike:
    if name in UNARY_FUNCTIONS and len(args) == 1:
        return UNARY_FUNCTIONS[name](args[0])
    if name == "split" and len(args) == 2:
        s, sep = _to_string(args[0]), _to_string(args[1])
        return INVALID if s is None or not sep else s.split(sep)
    if name == "nth" and len(args) == 2:
        lst, i = args[0], _to_double(args[1])
        if not isinstance(lst, list) or i is None:
            return INVALID
        i = int(i)  # 1-based (Function.swift:1294)
        return lst[i - 1] if 1 <= i <= len(lst) else INVALID
    if name == "items" and len(args) == 1:
        return len(args[0]) if isinstance(args[0], list) else INVALID
    if name == "left" and len(args) == 2:
        s, n = _to_string(args[0]), _to_double(args[1])
        return INVALID if s is None or n is None or int(n) > len(s) else s[: int(n)]
    if name == "right" and len(args) == 2:
        s, n = _to_string(args[0]), _to_double(args[1])
        return INVALID if s is None or n is None or int(n) > len(s) else s[len(s) - int(n):]
    if name == "mid" and len(args) == 3:
        s, start, n = _to_string(args[0]), _to_double(args[1]), _to_double(args[2])
        if s is None or start is None or n is None:
            return INVALID
        return s[int(start): int(start) + int(n)]
    if name == "substitute" and len(args) == 3:
        s, old, new = (_to_string(a) for a in args)
        return INVALID if s is None or old is None or new is None else s.replace(old, new)
    if name == "concat":
        parts = [_to_string(a) for a in args]
        return INVALID if any(p is None for p in parts) else "".join(parts)
    return INVALID


_BINARY_EVAL: dict[str, Callable[[ValueLike, ValueLike], ValueLike]] = {
    "+": lambda a, b: _num2(a, b, lambda x, y: x + y),
    "-": lambda a, b: _num2(a, b, lambda x, y: x - y),
    "*": lambda a, b: _num2(a, b, lambda x, y: x * y),
    "/": lambda a, b: _num2(a, b, lambda x, y: x / y),
    "~": lambda a, b: _num2(a, b, lambda x, y: math.fmod(x, y)),
    "^": lambda a, b: _num2(a, b, lambda x, y: x**y),
    "&": lambda a, b: (
        INVALID
        if _to_string(a) is None or _to_string(b) is None
        else _to_string(a) + _to_string(b)
    ),
    "=": lambda a, b: _num_cmp(a, b, lambda x, y: x == y),
    "<>": lambda a, b: _num_cmp(a, b, lambda x, y: x != y),
    ">": lambda a, b: _num_cmp(a, b, lambda x, y: x > y),
    ">=": lambda a, b: _num_cmp(a, b, lambda x, y: x >= y),
    "<": lambda a, b: _num_cmp(a, b, lambda x, y: x < y),
    "<=": lambda a, b: _num_cmp(a, b, lambda x, y: x <= y),
}


def evaluate(node: Node, row: Mapping[str, ValueLike], input_value: ValueLike = INVALID) -> ValueLike:
    """Evaluate an AST locally against one example row (the driver-side
    mirror of Expression.apply, Expression.swift:92)."""
    if isinstance(node, Literal):
        return node.value
    if isinstance(node, ErrorConstant):
        return INVALID
    if isinstance(node, Identity):
        return input_value
    if isinstance(node, Sibling):
        for k, v in row.items():
            if k.lower() == node.name.lower():
                return v
        return INVALID
    if isinstance(node, Binary):
        return _BINARY_EVAL[node.op](
            evaluate(node.left, row, input_value), evaluate(node.right, row, input_value)
        )
    if isinstance(node, Call):
        return _apply_call(node.function, [evaluate(a, row, input_value) for a in node.args])
    if isinstance(node, Index):
        return _apply_call(
            "nth",
            [evaluate(node.base, row, input_value), evaluate(node.index, row, input_value)],
        )
    return INVALID


def complexity(node: Node) -> int:
    """Reference complexity weights: Literal 10 (Expression.swift:213),
    Identity 0 (330), Sibling 2 (736), Comparison l+r+5 (410),
    Call 1+Σargs (589), default 1."""
    if isinstance(node, Literal):
        return 10
    if isinstance(node, Identity):
        return 0
    if isinstance(node, Sibling):
        return 2
    if isinstance(node, Binary):
        return complexity(node.left) + complexity(node.right) + 5
    if isinstance(node, Call):
        return 1 + sum(complexity(a) for a in node.args)
    if isinstance(node, Index):
        # rendered as x[i], compiled as nth(x, i) — weigh like the Call
        return 1 + complexity(node.base) + complexity(node.index)
    return 1


# ---------------------------------------------------------------------------
# Candidate generators (the per-class suggest() implementations)
# ---------------------------------------------------------------------------

_SPLIT_SEPARATORS = [
    " ", ",", ";", "\t", "|", "-", ".", "/", ":", "\\", "#", "=", "_", "(", ")", "[", "]",
]  # Expression.swift:663


def _suggest_sibling(from_expr, to_value, row) -> list:
    # Expression.swift:769-784: columns whose value matches the target;
    # all columns if none match (or when starting fresh)
    matching = [Sibling(c) for c, v in row.items() if from_expr is None or value_eq(v, to_value)]
    return matching or [Sibling(c) for c in row]


def _suggest_comparison(from_expr, to_value, row, input_value, level) -> list:
    # Expression.swift:442-520: arithmetic difference/ratio and string
    # prefix/suffix composition, recursing to infer the other operand
    if from_expr is None or level <= 1:
        return []
    f = evaluate(from_expr, row, input_value)
    out = []
    target_d, from_d = _to_double(to_value), _to_double(f)
    if target_d is not None and from_d is not None:
        # NB the reference's Comparison.apply swaps operands (left=second,
        # right=first, Expression.swift:100-104): Comparison(first: s,
        # second: from, .subtraction) computes from - s. The Binary nodes
        # below are written in plain left-op-right order.
        difference = target_d - from_d
        if difference != 0:
            op = "+" if difference > 0 else "-"
            for s in infer(None, abs(difference), row, level=level - 1, _previous=[to_value, f]):
                out.append(Binary(op, from_expr, s))
        if from_d != 0:
            dividend = target_d / from_d
            goal = (1 / dividend) if dividend < 1 else dividend
            for s in infer(None, goal, row, level=level - 1, _previous=[to_value, f]):
                out.append(
                    Binary("*", from_expr, s) if dividend >= 1 else Binary("/", from_expr, s)
                )
        return out
    target_s, from_s = _to_string(to_value), _to_string(f)
    if target_s and from_s and len(from_s) < len(target_s):
        if target_s.startswith(from_s):
            needed = target_s[len(from_s):]
            for s in infer(None, needed, row, level=level - 1, _previous=[to_value, f]):
                out.append(Binary("&", from_expr, s))
        elif target_s.endswith(from_s):
            needed = target_s[: len(target_s) - len(from_s)]
            for s in infer(None, needed, row, level=level - 1, _previous=[to_value, f]):
                out.append(Binary("&", s, from_expr))
    return out


def _suggest_call(from_expr, to_value, row, input_value) -> list:
    # Expression.swift:642-720: unary probes, separator-split element
    # extraction, substring left/right/mid, substitute fallback
    if from_expr is None:
        return []
    f = evaluate(from_expr, row, input_value)
    if f is INVALID:
        return []
    out = []
    for name, fn in UNARY_FUNCTIONS.items():
        if value_eq(fn(f), to_value):
            out.append(Call(name, (from_expr,)))
    target_s = _to_string(to_value)
    source_s = _to_string(f)
    if target_s is not None and source_s is not None:
        found_as_element = False
        incomplete = []
        for sep in _SPLIT_SEPARATORS:
            parts = source_s.split(sep)
            if len(parts) > 1:
                for i, item in enumerate(parts):
                    # SPLIT(x;sep)[i] — Index renders as the reference's
                    # x[i] syntax and compiles to nth (1-based)
                    nth = Index(Call("split", (from_expr, Literal(sep))), Literal(i + 1))
                    if item == target_s:
                        out.append(nth)
                        found_as_element = True
                    else:
                        incomplete.append(nth)
        if not found_as_element:
            if incomplete:
                out.extend(incomplete)
            else:
                idx = source_s.find(target_s)
                if idx >= 0:
                    out.append(Call("right", (from_expr, Literal(len(target_s)))))
                    if idx == 0:
                        out.append(Call("left", (from_expr, Literal(len(target_s)))))
                    else:
                        out.append(
                            Call("mid", (from_expr, Literal(idx), Literal(len(target_s))))
                        )
                else:
                    out.append(
                        Call("substitute", (Identity(), Literal(f), Literal(to_value)))
                    )
    return out


# ---------------------------------------------------------------------------
# The search (Expression.swift:117-196)
# ---------------------------------------------------------------------------

def infer(
    from_expr: Optional[Node],
    to_value: ValueLike,
    row: Mapping[str, ValueLike],
    input_column: Optional[str] = None,
    level: int = 4,
    max_complexity: int = 10**9,
    _previous: Optional[list] = None,
) -> list[Node]:
    """Find expressions transforming the example ``row`` (and the cell
    in ``input_column``, exposed as ``@``) into ``to_value``. Returns
    candidate ASTs, every one of which evaluates to the target on the
    example row."""
    if level <= 0:
        return []
    previous = list(_previous or ())
    input_value = row.get(input_column, INVALID) if input_column else INVALID
    suggestions: list[Node] = []
    explore: list[tuple[Node, int]] = []

    candidates: list[Node] = []
    candidates += _suggest_sibling(from_expr, to_value, row)
    if from_expr is None:
        candidates.append(Literal(to_value))
    candidates += _suggest_comparison(from_expr, to_value, row, input_value, level)
    candidates += _suggest_call(from_expr, to_value, row, input_value)
    candidates.append(Identity())

    for cand in candidates:
        c = complexity(cand)
        if c > max_complexity:
            continue
        if value_eq(evaluate(cand, row, input_value), to_value):
            # keep it, but keep searching for something simpler
            max_complexity = min(max_complexity, c)
            suggestions.append(cand)
            explore.append((cand, c))
        else:
            explore.append((cand, max_complexity))

    for cand, bound in explore:
        if complexity(cand) > max_complexity:
            continue
        result = evaluate(cand, row, input_value)
        if any(value_eq(p, result) for p in previous):
            continue
        deeper = infer(
            cand,
            to_value,
            row,
            input_column=input_column,
            level=level - 1,
            max_complexity=min(max_complexity, bound - 1),
            _previous=previous + [result],
        )
        for s in deeper:
            if value_eq(evaluate(s, row, input_value), to_value):
                suggestions.append(s)

    # dedupe by rendered formula, simplest first (the reference leaves
    # dedup/ranking to QBECalculator; doing it here keeps the API tidy)
    seen = set()
    unique = []
    for s in sorted(suggestions, key=complexity):
        key = unparse(s)
        if key not in seen:
            seen.add(key)
            unique.append(s)
    return unique


def suggest_formulas(
    to_value: ValueLike,
    row: Mapping[str, ValueLike],
    input_column: Optional[str] = None,
    level: int = 4,
    locale=None,
) -> list[str]:
    """Convenience wrapper: inferred formulas as strings in the given
    locale, simplest first. Compile the chosen one with
    ``formula.formula(text)`` to run it distributed."""
    return [
        unparse(s, locale=locale)
        for s in infer(None, to_value, row, input_column=input_column, level=level)
    ]
