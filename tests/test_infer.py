"""Programming-by-example inference (reference Expression.swift:112-196;
canonical acceptance test: the 24 game, WarpCoreTests.swift:893-900)."""

import pytest
from pyspark.sql import functions as F

from warp_spark.formula import Sibling, parse, to_column, unparse
from warp_spark.infer import (
    INVALID,
    complexity,
    evaluate,
    infer,
    suggest_formulas,
    value_eq,
)


def test_24_game():
    # the reference's testInferer: solve 24 from the row 1-3-4-6
    row = {"A": 1, "B": 3, "C": 4, "D": 6}
    sols = infer(None, 24, row, input_column="A", level=4)
    assert sols, "can solve the 1-3-4-6 24 game"
    for s in sols:
        assert value_eq(evaluate(s, row, row["A"]), 24), unparse(s)
    # a non-trivial (non-literal) solution exists and outranks the literal
    assert unparse(sols[0]) in ("C*D", "D*C")


def test_sibling_match_preferred():
    # a column already holding the target is the simplest suggestion
    out = suggest_formulas(6, {"A": 1, "D": 6}, input_column="A", level=2)
    assert out[0] == "D"


def test_unary_function_probe():
    out = suggest_formulas("JOHN", {"name": "john"}, input_column="name", level=3)
    assert "UPPER(@)" in out and "UPPER(name)" in out


def test_literal_always_available():
    out = suggest_formulas("xyzzy", {"a": 1}, input_column="a", level=2)
    assert '"xyzzy"' in out


def test_split_element_extraction():
    sols = infer(Sibling("full"), "smith", {"full": "john-smith"}, "full", level=2)
    texts = [unparse(s) for s in sols]
    assert 'SPLIT(full;"-")[2]' in texts or 'SPLIT(@;"-")[2]' in texts


def test_substring_probe():
    # separator-free source: split probes can't match, so the substring
    # probe fires (the reference only reaches it in that case,
    # Expression.swift:694-710)
    sols = infer(Sibling("s"), "hello", {"s": "helloworld"}, "s", level=2)
    texts = [unparse(s) for s in sols]
    assert any("LEFT" in t for t in texts), texts
    sols2 = infer(Sibling("s"), "owo", {"s": "helloworld"}, "s", level=2)
    texts2 = [unparse(s) for s in sols2]
    assert any("MID" in t for t in texts2), texts2


def test_trim_probe():
    sols = infer(Sibling("s"), "pad", {"s": "  pad  "}, "s", level=2)
    assert any("TRIM" in unparse(s) for s in sols)


def test_arithmetic_composition():
    # 9 from a=3: a*a (and @+b etc.) — every suggestion must verify
    row = {"a": 3.0, "b": 6.0}
    sols = infer(None, 9.0, row, input_column="a", level=3)
    assert sols
    texts = [unparse(s) for s in sols]
    assert any(t in ("a*a", "@*a", "a*@") for t in texts), texts
    for s in sols:
        assert value_eq(evaluate(s, row, row["a"]), 9.0)


def test_complexity_weights():
    # reference weights: Literal 10, Sibling 2, Binary l+r+5, Identity 0
    assert complexity(parse("24")) == 10
    assert complexity(parse("C*D")) == 9  # why C*D beats the literal
    assert complexity(parse("@")) == 0


def test_every_suggestion_verifies():
    # the search's invariant: no suggestion that fails on the example row
    for target, row, col in [
        (42, {"x": 7, "y": 6}, "x"),
        ("a,b", {"p": "a", "q": "b"}, None),
        (0.5, {"n": 1, "d": 2}, "n"),
    ]:
        for s in infer(None, target, row, input_column=col, level=3):
            iv = row.get(col, INVALID) if col else INVALID
            assert value_eq(evaluate(s, row, iv), target), unparse(s)


def test_invalid_semantics():
    # invalid equals nothing, including itself (Value.swift:547-551)
    assert not value_eq(INVALID, INVALID)
    assert not value_eq(INVALID, 1)
    assert value_eq(None, None)
    assert value_eq("12", 12)  # numeric when either side numeric


def test_inferred_formula_runs_on_spark(spark):
    # the winning AST compiles through to_column and runs distributed
    row = {"A": 1, "B": 3, "C": 4, "D": 6}
    best = infer(None, 24, row, input_column="A", level=4)[0]
    df = spark.createDataFrame([tuple(row.values())], "A long, B long, C long, D long")
    got = df.select(to_column(best, identity=F.col("A")).alias("out")).first()["out"]
    assert got == 24
