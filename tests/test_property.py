"""Property-based tests (hypothesis) — the reference's parser-roundtrip
and value-semantics suites (WarpCoreTests.swift:670-756, 51-140) widened
from hand-picked cases to generated ones.

Pure-Python properties (parser AST roundtrip, fuzz safety) run per
example; Spark-backed properties (pack roundtrip, coercion laws) batch a
seeded generated corpus through ONE job, because a Spark action per
hypothesis example would take minutes.
"""

from __future__ import annotations

import random
import string

import pytest
from hypothesis import given, settings, strategies as st

from warp_spark.formula import (
    Binary,
    Call,
    EN_FUNCTIONS,
    FormulaError,
    Identity,
    Index,
    KeyLookup,
    ListLiteral,
    Literal,
    Sibling,
    parse,
    unparse,
)

# --- strategies ------------------------------------------------------------

_names = st.text(alphabet=string.ascii_letters, min_size=1, max_size=8)
_numbers = st.one_of(
    st.integers(min_value=-10**9, max_value=10**9),
    st.floats(
        min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
    ).filter(lambda x: abs(x) > 1e-6),
)
_strings = st.text(
    alphabet=string.ascii_letters + string.digits + " .,;$#[]()->\"'\\",
    max_size=12,
)
# fixed-arity EN functions safe to roundtrip with 2 args
_binary_fns = st.sampled_from(["POWER", "LEFT", "RIGHT", "LOG", "DURATION"])
_binops = st.sampled_from(["+", "-", "*", "/", "&", "=", "<>", "<", ">", "<=", ">=", "~=", "~~=", "^", "~"])


def _exprs(depth: int = 3):
    leaf = st.one_of(
        _numbers.map(Literal),
        _strings.map(Literal),
        _names.map(Sibling),
        _names.map(lambda n: Call("foreign", [Literal(n)]) if False else n).map(Sibling),
        st.just(Identity()),
    )
    if depth == 0:
        return leaf
    sub = _exprs(depth - 1)
    return st.one_of(
        leaf,
        st.tuples(_binops, sub, sub).map(lambda t: Binary(t[0], t[1], t[2])),
        st.tuples(_binary_fns, sub, sub).map(
            lambda t: Call(EN_FUNCTIONS[t[0]], [t[1], t[2]])
        ),
        st.lists(sub, min_size=1, max_size=3).map(ListLiteral),
        st.tuples(sub, st.integers(min_value=1, max_value=5)).map(
            lambda t: Index(t[0], Literal(t[1]))
        ),
        st.tuples(sub, _strings).map(lambda t: KeyLookup(t[0], Literal(t[1]))),
    )


# --- parser roundtrip (WarpCoreTests.swift:670-694) ------------------------

@settings(max_examples=300, deadline=None)
@given(_exprs())
def test_unparse_parse_fixed_point(node):
    """unparse∘parse is a fixed point: printing a tree and reparsing it
    yields a tree that prints identically."""
    text = unparse(node)
    reparsed = parse(text)
    assert unparse(reparsed) == text


@settings(max_examples=300, deadline=None)
@given(_exprs())
def test_reparse_stable_twice(node):
    text1 = unparse(parse(unparse(node)))
    text2 = unparse(parse(text1))
    assert text1 == text2


# --- fuzz safety (syntax rejection table, WarpCoreTests.swift:696-756) -----

@settings(max_examples=500, deadline=None)
@given(st.text(max_size=30))
def test_parser_never_crashes(text):
    """Arbitrary input either parses or raises FormulaError — nothing
    else escapes (no IndexError/RecursionError/etc)."""
    try:
        parse(text)
    except FormulaError:
        pass


@settings(max_examples=200, deadline=None)
@given(_numbers)
def test_number_literal_roundtrip(x):
    node = parse(unparse(Literal(x)))
    assert isinstance(node, Literal) or isinstance(node, Call)  # negate() wraps negatives
    got = unparse(node)
    assert unparse(parse(got)) == got


# --- pack format roundtrip (Value.swift:266-380; pack.md) ------------------

def test_pack_roundtrip_generated_corpus(spark):
    """300 seeded random string lists — heavy on '$', ',', '', unicode —
    survive pack → unpack exactly. One Spark job for the whole corpus."""
    rng = random.Random(42)
    alphabet = list("ab$,0189é ") + ["$$", ",,", "$0", "$1"]

    def rand_item():
        return "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 6)))

    corpus = [[rand_item() for _ in range(rng.randint(1, 5))] for _ in range(300)]
    df = spark.createDataFrame([(i, xs) for i, xs in enumerate(corpus)], "i int, xs array<string>")

    from pyspark.sql import functions as F

    from warp_spark.values import pack_list, unpack_list

    back = df.select("i", unpack_list(pack_list(F.col("xs"))).alias("ys")).collect()
    got = {r["i"]: r["ys"] for r in back}
    for i, xs in enumerate(corpus):
        assert got[i] == xs, f"corpus[{i}]={xs!r} roundtripped to {got[i]!r}"


# --- coercion laws (Value.swift:484-545; WarpCoreTests.swift:51-140) -------

def test_coercion_laws_generated_corpus(spark):
    """Warp arithmetic laws on a seeded mixed-type corpus, one job:
    string numbers add like numbers; non-numeric strings poison to NULL;
    & concatenates after stringValue coercion; division by zero is NULL."""
    rng = random.Random(7)
    cells = []
    for _ in range(200):
        kind = rng.randrange(4)
        if kind == 0:
            cells.append(str(rng.randint(-999, 999)))
        elif kind == 1:
            cells.append(f"{rng.uniform(-10, 10):.3f}")
        elif kind == 2:
            cells.append(rng.choice(["x", "", "12a", "NaN?", "1 2"]))
        else:
            cells.append(None)
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cells)], "i int, c string")

    from pyspark.sql import functions as F

    from warp_spark.values import num_op, safe_div, to_number

    out = df.select(
        "i",
        num_op(lambda a, b: a + b, F.col("c"), F.lit(1)).alias("plus1"),
        safe_div(F.col("c"), F.lit(0)).alias("div0"),
        to_number(F.col("c")).alias("num"),
    ).collect()
    by_i = {r["i"]: r for r in out}
    for i, c in enumerate(cells):
        r = by_i[i]
        try:
            expect = float(c) if c is not None and c.strip() else None
        except (TypeError, ValueError):
            expect = None
        if expect is None:
            assert r["num"] is None and r["plus1"] is None, (c, r)
        else:
            assert r["num"] == pytest.approx(expect)
            assert r["plus1"] == pytest.approx(expect + 1)
        assert r["div0"] is None  # division by zero is always invalid→NULL


def test_token_budget_fill_random_differential(spark):
    """Grouped two-phase prefix vs the plain per-group running-sum
    window, over seeded random corpora (skewed groups, duplicate
    weights, budgets straddling group totals, several partition
    counts). ONE Spark job per seed — the distributed decomposition
    must be row-for-row identical to the serial window definition."""
    from pyspark.sql import Window, functions as F

    from warp_spark.sampling import token_budget_fill

    rng = random.Random(0xC0FFEE)
    for seed in range(6):
        n_groups = rng.choice([1, 3, 17])
        n_rows = rng.randint(5, 400)
        budget = rng.choice([1, 50, 10**6])
        parts = rng.choice([1, 5, 64])
        rows = [
            (i, f"g{rng.randrange(n_groups)}", rng.randint(1, 30))
            for i in range(n_rows)
        ]
        df = spark.createDataFrame(rows, "id long, g string, w long")
        order = [F.col("w").desc(), F.col("id")]
        got = {
            (r["g"], r["id"], r["cum_weight"])
            for r in token_budget_fill(
                df, "g", "w", budget=budget, order_cols=order, num_partitions=parts
            ).collect()
        }
        w = Window.partitionBy("g").orderBy(*order).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        ref = {
            (r["g"], r["id"], r["cum"])
            for r in df.withColumn("cum", F.sum("w").over(w))
            .filter(F.col("cum") <= budget)
            .collect()
        }
        assert got == ref, (seed, n_groups, n_rows, budget, parts)


def test_scd2_intervals_random_differential(spark):
    """scd2_intervals vs a serial per-entity reconstruction in Python,
    over seeded random event streams with heavy timestamp ties (the
    tiebreak column must make runs engine- and partitioning-stable)."""
    import datetime as dt

    from pyspark.sql import functions as F  # noqa: F401

    from warp_spark.scd import scd2_intervals

    rng = random.Random(0xBEEF)
    t0 = dt.datetime(2024, 1, 1)
    for seed in range(4):
        rows = []
        eid = 0
        for user in range(rng.randint(1, 8)):
            for _ in range(rng.randint(1, 40)):
                rows.append(
                    (
                        user,
                        rng.choice("abc"),
                        t0 + dt.timedelta(minutes=rng.randrange(30)),  # many ties
                        eid,
                    )
                )
                eid += 1
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp, event_id long"
        )
        got = sorted(
            (r["user_id"], r["event_type"], r["valid_from"], r["valid_to"], r["n_events"])
            for r in scd2_intervals(
                df, "user_id", "event_type", "ts", tiebreak_cols=["event_id"]
            ).collect()
        )
        # serial reference: sort per user by (ts, event_id), walk runs
        ref = []
        by_user: dict = {}
        for u, a, ts, e in rows:
            by_user.setdefault(u, []).append((ts, e, a))
        for u, evs in by_user.items():
            evs.sort()
            runs = []
            for ts, e, a in evs:
                if runs and runs[-1][0] == a:
                    runs[-1][2] += 1
                else:
                    runs.append([a, ts, 1])
            for i, (a, vf, n) in enumerate(runs):
                vt = runs[i + 1][1] if i + 1 < len(runs) else None
                ref.append((u, a, vf, vt, n))
        assert got == sorted(ref), seed
