"""Expression-optimizer tests, modeled on the reference's optimizer and
coalescer suites (WarpCoreTests.swift:758-790 equivalence folding;
792-891 differential optimized-vs-unoptimized comparison)."""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from warp_spark.formula import Binary, Call, Literal, Sibling, parse, unparse
from warp_spark.infer import INVALID, evaluate, value_eq
from warp_spark.optimize import prepare


def opt(src: str) -> str:
    return unparse(prepare(parse(src)))


def test_constant_folding():
    assert opt("1+2*3") == "7" or opt("1+2*3") == "7.0"
    assert opt("SQRT(16)") in ("4", "4.0")
    assert opt('UPPER("ab")') == '"AB"'
    assert opt("2^10") in ("1024", "1024.0")


def test_invalid_stays_unfolded():
    # the compiled tier maps invalid per-operator (NULL from safe
    # division, NaN from ERROR) — folding would pick one for the other
    assert opt("1/0") == "1/0"


def test_idempotent_collapse():
    assert opt("UPPER(UPPER([a]))") == "UPPER(a)"
    assert opt("TRIM(TRIM(TRIM([a])))") == "TRIM(a)"
    assert opt("ABS(ABS([a]))") == "ABS(a)"
    # different functions do NOT collapse
    assert opt("UPPER(LOWER([a]))") == "UPPER(LOWER(a))"


def test_identical_comparison_folds_false():
    # WarpCoreTests.swift:772-785: x+1 > x+1 → false
    assert opt("[x]+1 > [x]+1") == "FALSE"
    assert opt("[x] < [x]") == "FALSE"
    assert opt("[x] <> [x]") == "FALSE"
    # = must NOT fold: invalid = invalid is FALSE but 1 = 1 is TRUE
    assert opt("[x] = [x]") != "TRUE"


def test_nondeterministic_never_folds():
    assert "RAND" in opt("RAND() > RAND()")
    assert opt("NOW()") == "NOW()"
    assert "RAND" in opt("RAND()+0")


def test_prepare_is_idempotent():
    for src in ["1+2", "UPPER(UPPER([a]))", "[x]+1 > [x]+1", "RAND()"]:
        once = prepare(parse(src))
        assert prepare(once) == once


# --- differential tier: optimized == unoptimized under evaluation ----------

_expr = st.recursive(
    st.one_of(
        st.integers(-100, 100).map(Literal),
        st.floats(-100, 100, allow_nan=False).map(Literal),
        st.sampled_from(["a", "b"]).map(Sibling),
        st.text("xy", min_size=0, max_size=3).map(Literal),
    ),
    lambda inner: st.one_of(
        st.tuples(st.sampled_from(["+", "-", "*", "/", ">", "<", "=", "<>", "&"]), inner, inner).map(
            lambda t: Binary(t[0], t[1], t[2])
        ),
        st.tuples(st.sampled_from(["abs", "uppercase", "trim", "floor", "negate"]), inner).map(
            lambda t: Call(t[0], (t[1],))
        ),
    ),
    max_leaves=12,
)


@settings(max_examples=200, deadline=None)
@given(
    e=_expr,
    row=st.fixed_dictionaries(
        {
            "a": st.one_of(st.integers(-10, 10), st.text("xy", max_size=2), st.none()),
            "b": st.floats(-10, 10, allow_nan=False),
        }
    ),
)
def test_prepare_preserves_semantics(e, row):
    """The reference validates its optimizer differentially
    (compareDataset, WarpCoreTests.swift:792-815); same here: evaluating
    the optimized tree must equal evaluating the original on any row."""
    before = evaluate(e, row)
    after = evaluate(prepare(e), row)
    if before is INVALID:
        # the identical-operand comparison fold (x ⊕ x → FALSE for
        # > < <>) deliberately maps invalid→FALSE — exactly what the
        # reference's optimizer does (WarpCoreTests.swift:772-785 folds
        # x+1 > x+1 → false unconditionally) — and that FALSE can then
        # flow through enclosing operators. No equivalence is promised
        # for invalid-valued expressions; see
        # test_invalid_operand_comparison_divergence for the pinned
        # behavior at the fold site itself.
        return
    if after is INVALID:
        assert False, "optimizer introduced invalid"
    elif isinstance(before, float) and isinstance(after, float) and not math.isnan(before):
        assert after == pytest.approx(before)
    else:
        assert value_eq(before, after) or before == after


def test_invalid_operand_comparison_divergence():
    """Pin the one sanctioned divergence: identical invalid operands
    under > fold to FALSE (reference behavior) while the unoptimized
    tree evaluates invalid. Both are not-TRUE, so filters agree."""
    e = Binary(">", Binary("/", Literal(1), Literal(0)), Binary("/", Literal(1), Literal(0)))
    assert evaluate(e, {}) is INVALID
    assert evaluate(prepare(e), {}) is False
