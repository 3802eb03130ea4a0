"""Function-library semantics tests, modeled on the reference's
per-function unit suite (WarpCoreTests.swift:142-606) and value-coercion
tests (WarpCoreTests.swift:51-140)."""

import math

import pytest
from pyspark.sql import functions as F

from warp_spark.functions import FUNCTIONS, call
from warp_spark.values import safe_div, to_number, warp_concat


def ev(spark, col):
    """Evaluate a single Column against a 1-row dataframe."""
    return spark.range(1).select(col.alias("out")).collect()[0]["out"]


# --- coercion semantics (Value.swift:133-186, 484-545) ---------------------

def test_string_arithmetic_coercion(spark):
    # Value("13")+Value("37")==50 (WarpCoreTests.swift:95)
    assert ev(spark, to_number(F.lit("13")) + to_number(F.lit("37"))) == 50.0


def test_bool_coerces_to_num(spark):
    assert ev(spark, to_number(F.lit(True))) == 1.0
    assert ev(spark, to_number(F.lit(False))) == 0.0


def test_non_numeric_string_is_invalid(spark):
    assert ev(spark, to_number(F.lit("13x"))) is None


def test_divide_by_zero_invalid(spark):
    assert ev(spark, safe_div(F.lit(1), F.lit(0))) is None


def test_concat_operator(spark):
    assert ev(spark, warp_concat(F.lit(1), F.lit("a"))) == "1a"


# --- math ------------------------------------------------------------------

@pytest.mark.parametrize(
    "name,args,expected",
    [
        ("abs", [-3], 3.0),
        ("negate", [3], -3.0),
        ("sign", [-9], -1.0),
        ("sqrt", [16], 4.0),
        ("exp", [0], 1.0),
        ("ln", [1], 0.0),
        ("power", [2, 10], 1024.0),
        ("floor", [2.7], 2),
        ("ceiling", [2.1], 3),
        ("round", [2.567, 2], 2.57),
        ("round", [2.5], 3.0),
        ("powerUp", [5, 2], 8.0),
        ("powerDown", [5, 2], 4.0),
    ],
)
def test_math(spark, name, args, expected):
    got = ev(spark, call(name, *[F.lit(a) for a in args]))
    assert got == pytest.approx(expected)


def test_log_bases(spark):
    assert ev(spark, call("ln", F.lit(math.e))) == pytest.approx(1.0)
    assert ev(spark, call("log", F.lit(100))) == pytest.approx(2.0)  # base-10 default
    assert ev(spark, call("log", F.lit(8), F.lit(2))) == pytest.approx(3.0)


def test_normal_inverse(spark):
    # standard normal median is mu
    assert ev(spark, call("normalInverse", F.lit(0.5), F.lit(10.0), F.lit(2.0))) == pytest.approx(10.0)
    # ~1.6449 at p=0.95
    got = ev(spark, call("normalInverse", F.lit(0.95), F.lit(0.0), F.lit(1.0)))
    assert got == pytest.approx(1.6449, abs=1e-3)
    assert ev(spark, call("normalInverse", F.lit(0.0), F.lit(0.0), F.lit(1.0))) is None


def test_hilbert_roundtrip(spark):
    d = ev(spark, call("hilbertXYToD", F.lit(8), F.lit(5), F.lit(6)))
    x = ev(spark, call("hilbertDToX", F.lit(8), F.lit(d)))
    y = ev(spark, call("hilbertDToY", F.lit(8), F.lit(d)))
    assert (x, y) == (5, 6)


def test_random_between_bounds(spark):
    vals = (
        spark.range(200)
        .select(call("randomBetween", F.lit(1), F.lit(3)).alias("v"))
        .collect()
    )
    got = {r["v"] for r in vals}
    assert got == {1.0, 2.0, 3.0}  # inclusive upper bound (Function.swift:1220)


# --- logic -----------------------------------------------------------------

def test_if_and_bool_logic(spark):
    assert ev(spark, call("if", F.lit(1), "yes", "no")) == "yes"
    assert ev(spark, call("and", F.lit(True), F.lit(1))) is True
    assert ev(spark, call("or", F.lit(False), F.lit(0))) is False
    assert ev(spark, call("xor", F.lit(True), F.lit(False))) is True
    assert ev(spark, call("not", F.lit(False))) is True


def test_in_not_in(spark):
    assert ev(spark, call("in", F.lit(2), 1, 2, 3)) is True
    assert ev(spark, call("notIn", F.lit(5), 1, 2, 3)) is True


def test_coalesce_skips_null(spark):
    assert ev(spark, call("coalesce", F.lit(None), F.lit("a"))) == "a"


def test_is_empty(spark):
    assert ev(spark, call("isEmpty", F.lit(None).cast("string"))) is True
    assert ev(spark, call("isEmpty", F.lit(""))) is False


# --- strings (WarpCoreTests.swift string-function rows) --------------------

@pytest.mark.parametrize(
    "name,args,expected",
    [
        ("uppercase", ["abc"], "ABC"),
        ("lowercase", ["ABC"], "abc"),
        ("capitalize", ["hello world"], "Hello World"),
        ("trim", ["  x  "], "x"),
        ("length", ["abcd"], 4),
        ("left", ["hello", 2], "he"),
        ("right", ["hello", 2], "lo"),
        ("mid", ["hello", 2, 3], "llo"),  # 0-based start (Function.swift:1137)
        ("mid", [1337, 3, 1], "7"),  # WarpCoreTests.swift:312
        ("substitute", ["banana", "a", "o"], "bonono"),
        ("regexSubstitute", ["a1b2", "[0-9]", "#"], "a#b#"),
        ("levenshtein", ["kitten", "sitting"], 3),
        ("countString", ["banana", "an"], 2),
        ("urlEncode", ["a b"], "a+b"),
        ("parseNumber", ["1.234,56", ",", "."], 1234.56),
    ],
)
def test_strings(spark, name, args, expected):
    assert ev(spark, call(name, *[F.lit(a) for a in args])) == expected


def test_split_glue(spark):
    assert ev(spark, call("split", F.lit("a,b,c"), ",")) == ["a", "b", "c"]
    assert ev(spark, call("glue", F.array(F.lit("a"), F.lit("b")), "-")) == "a-b"


# --- encoding --------------------------------------------------------------

def test_base64_roundtrip(spark):
    assert ev(spark, call("base64Decode", call("base64Encode", F.lit("warp")))) == "warp"


def test_hex_roundtrip(spark):
    assert ev(spark, call("hexDecode", call("hexEncode", F.lit("warp")))) == "warp"


def test_number_of_bytes(spark):
    assert ev(spark, call("numberOfBytes", call("encodeString", F.lit("abc")))) == 3


# --- dates (UTC; Date.swift:25-108 Excel epoch) ----------------------------

def test_excel_date_roundtrip(spark):
    ts = call("fromExcelDate", F.lit(25569.0))  # 1970-01-01
    assert ev(spark, call("toUnixTime", ts)) == 0
    assert ev(spark, call("toExcelDate", call("fromUnixTime", F.lit(0)))) == 25569.0


def test_utc_date_parts(spark):
    ts = call("fromISO8601", F.lit("2024-03-05T06:07:08"))
    parts = (
        call("utcYear", ts),
        call("utcMonth", ts),
        call("utcDay", ts),
        call("utcHour", ts),
        call("utcMinute", ts),
        call("utcSecond", ts),
    )
    got = spark.range(1).select(*[p.alias(f"p{i}") for i, p in enumerate(parts)]).collect()[0]
    assert tuple(got) == (2024, 3, 5, 6, 7, 8.0)


def test_duration_after(spark):
    a = call("fromISO8601", F.lit("2024-01-01T00:00:00"))
    b = call("fromISO8601", F.lit("2024-01-01T01:00:00"))
    assert ev(spark, call("duration", a, b)) == 3600
    assert ev(spark, call("toUTCISO8601", call("after", a, F.lit(60)))) == "2024-01-01T00:01:00Z"


# --- lists / pack ----------------------------------------------------------

def test_nth_one_based(spark):
    lst = call("list", F.lit("a"), F.lit("b"), F.lit("c"))
    assert ev(spark, call("nth", lst, F.lit(1))) == "a"
    assert ev(spark, call("nth", lst, F.lit(9))) is None


def test_items_append(spark):
    lst = call("list", F.lit("a"))
    assert ev(spark, call("items", call("appendValue", lst, F.lit("b")))) == 2


def test_value_for_key(spark):
    kv = call("list", F.lit("k1"), F.lit("v1"), F.lit("k2"), F.lit("v2"))
    assert ev(spark, call("valueForKey", kv, F.lit("k2"))) == "v2"


def test_pack_roundtrip(spark):
    # pack escapes: `,` → $0, `$` → $1 (Value.swift:266-380; WarpCoreTests.swift:133-139)
    lst = call("list", F.lit("a,b"), F.lit("c$d"), F.lit("plain"))
    packed = call("packList", lst)
    assert ev(spark, packed) == "a$0b,c$1d,plain"
    assert ev(spark, call("unpackList", packed)) == ["a,b", "c$d", "plain"]


def test_json_encode(spark):
    assert ev(spark, call("jsonEncode", F.array(F.lit(1), F.lit(2)))) == "[1,2]"


def test_choose(spark):
    assert ev(spark, call("choose", F.lit(2), F.lit("a"), F.lit("b"), F.lit("c"))) == "b"


def test_function_count():
    # inventory breadth guard — grows as SURVEY §2.3 fills in
    assert len(FUNCTIONS) >= 90


# --- the previously-untested tail of the inventory -------------------------

def test_trig(spark):
    import math

    for name, fn in [
        ("sin", math.sin), ("cos", math.cos), ("tan", math.tan),
        ("sinh", math.sinh), ("cosh", math.cosh), ("tanh", math.tanh),
    ]:
        assert ev(spark, call(name, F.lit(0.5))) == pytest.approx(fn(0.5)), name
    for name, fn in [("asin", math.asin), ("acos", math.acos), ("atan", math.atan)]:
        assert ev(spark, call(name, F.lit(0.5))) == pytest.approx(fn(0.5)), name


def test_random_range(spark):
    vals = [ev(spark, call("random")) for _ in range(5)]
    assert all(0.0 <= v < 1.0 for v in vals)


def test_if_error(spark):
    # invalid (NaN under SURVEY §7.1 mapping) replaced by the alternative;
    # the division goes through the engine's safe_div (a bare 1/0 literal
    # would trip ANSI-mode constant folding before our semantics apply)
    from warp_spark.values import safe_div

    assert ev(spark, call("ifError", F.lit(float("nan")), F.lit(-1.0))) == -1.0
    assert ev(spark, call("ifError", safe_div(F.lit(1.0), F.lit(0)), F.lit(-1.0))) == -1.0
    assert ev(spark, call("ifError", F.lit(3.0), F.lit(-1.0))) == 3.0


def test_is_invalid(spark):
    assert ev(spark, call("isInvalid", F.lit(float("nan")))) is True
    assert ev(spark, call("isInvalid", F.lit(1.0))) is False


def test_identity(spark):
    assert ev(spark, call("identity", F.lit("x"))) == "x"


def test_uuid_shape(spark):
    import re

    assert re.fullmatch(r"[0-9a-f-]{36}", ev(spark, call("uuid")))


def test_encode_decode_string(spark):
    round_trip = call("decodeString", call("encodeString", F.lit("héllo"), "UTF-8"), "UTF-8")
    assert ev(spark, round_trip) == "héllo"


def test_now_is_current(spark):
    from datetime import datetime, timezone

    now = ev(spark, call("now"))
    assert abs((datetime.now(timezone.utc) - now.replace(tzinfo=timezone.utc)).total_seconds()) < 300


def test_local_iso8601(spark):
    ts = call("fromISO8601", F.lit("2024-06-01T12:30:00"))
    assert ev(spark, call("toLocalISO8601", ts)) == "2024-06-01T12:30:00"


def test_utc_date(spark):
    from datetime import date

    assert ev(spark, call("utcDate", F.lit(2024), F.lit(2), F.lit(29))) == date(2024, 2, 29)


def test_unicode_date_roundtrip(spark):
    s = call(
        "toUnicodeDateString",
        call("fromUnicodeDateString", F.lit("01/06/2024"), "dd/MM/yyyy"),
        "dd/MM/yyyy",
    )
    assert ev(spark, s) == "01/06/2024"


def test_append_list(spark):
    out = ev(spark, call("appendList", F.array(F.lit(1), F.lit(2)), F.array(F.lit(3))))
    assert list(out) == [1, 2, 3]


def test_json_decode(spark):
    v = ev(spark, F.to_json(call("jsonDecode", F.lit('{"a": 1}'))))
    assert v == '{"a":1}'


def test_scalar_aggregate_forms(spark):
    # aggregate-capable functions called with scalar args
    # (Function.swift:1719-1726 delegates to the Reducer)
    assert ev(spark, call("variancePopulation", F.lit(1.0), F.lit(2.0), F.lit(3.0))) == pytest.approx(2 / 3)
    assert ev(spark, call("varianceSample", F.lit(1.0), F.lit(2.0), F.lit(3.0))) == pytest.approx(1.0)
    assert ev(spark, call("standardDeviationPopulation", F.lit(2.0), F.lit(4.0))) == pytest.approx(1.0)
    assert ev(spark, call("standardDeviationSample", F.lit(2.0), F.lit(4.0))) == pytest.approx(2 ** 0.5)
    assert ev(spark, call("medianPack", F.lit(1), F.lit(2))) == "1,2"
    assert ev(spark, call("pack", F.lit("a,b"), F.lit("c"))) == "a$0b,c"


def test_random_item_reducer(spark):
    # any-value semantics (Function.swift:872): the result is one of the
    # group's values; SQL backends refuse it (SQL.swift:791-794)
    from warp_spark import Aggregator, Dataset

    ds = Dataset.from_df(spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k long, v string"))
    out = ds.aggregate({"k": F.col("k")}, {"pick": Aggregator(F.col("v"), "randomItem")}).collect()
    got = {r["k"]: r["pick"] for r in out}
    assert got[1] in ("a", "b") and got[2] == "c"


def test_random_string(spark):
    import re

    v = ev(spark, call("randomString", F.lit("[a-c][0-9]")))
    assert re.fullmatch(r"[a-c][0-9]", v)


def test_every_function_has_a_test():
    """The reference makes it a compile error to add a Function without a
    test (exhaustive switch over allFunctions, WarpCoreTests.swift:142).
    Python equivalent: every canonical name in FUNCTIONS and REDUCERS
    must be mentioned in this module or in an oracle-checked catalog
    query."""
    import re as _re
    from pathlib import Path

    from warp_spark.aggregators import REDUCERS

    here = Path(__file__).parent
    corpus = (
        Path(__file__).read_text()
        + (here / "test_dataset.py").read_text()
        + (here.parent / "warp_spark" / "catalog.py").read_text()
    )

    def mentioned(name: str) -> bool:
        return _re.search(rf'["\']{_re.escape(name)}["\']', corpus) is not None

    untested = [f for f in FUNCTIONS if not mentioned(f)]
    assert not untested, f"functions without tests: {untested}"
    untested_r = [r for r in REDUCERS if not mentioned(r)]
    assert not untested_r, f"reducers without tests: {untested_r}"


def test_approx_reducers(spark):
    # approximate tier (beyond-reference scale path): HLL++ distinct
    # count and a mergeable quantile sketch for median
    from warp_spark import Aggregator, Dataset

    ds = Dataset.from_df(spark.range(1000).select((F.col("id") % 100).alias("v")))
    out = ds.aggregate(
        {},
        {
            "acd": Aggregator(F.col("v"), "approxCountDistinct"),
            "amed": Aggregator(F.col("v"), "approxMedian"),
        },
    ).collect()[0]
    assert abs(out["acd"] - 100) <= 5  # HLL++ relative error ~2%
    assert abs(out["amed"] - 49.5) <= 2
