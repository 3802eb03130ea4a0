"""The scalar function library — the reference's 110-function ``Function``
enum (WarpCore/Sources/Function.swift:21-134; semantics at 946-1727)
re-expressed as ``pyspark.sql.Column`` builders.

Tiering mirrors the reference's SQL-pushdown design (SQL.swift:809-1015:
translatable functions push to SQL, the rest fall back to the engine):
  tier 1 — built-in Spark Column functions (JVM, whole-stage codegen);
  tier 2 — composed Column expressions (still JVM);
  tier 3 — Arrow-vectorized pandas UDFs (hilbert curves, normal inverse,
           random strings) — the only Python-side functions.

Canonical names are the reference's enum case names (Function.swift:21-134).
All functions treat NULL as Warp ``empty``/``invalid`` per SURVEY.md §7.1:
failed operations yield NULL (e.g. ``try_cast``), never exceptions.
"""

from __future__ import annotations

import math
from typing import Callable, Union

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from warp_spark.values import (
    integral_string,
    pack_list,
    safe_div,
    to_bool,
    to_number,
    to_string,
    unpack_list,
    warp_concat,
)

ColumnOrLit = Union[Column, str, int, float, bool]


def _c(x: ColumnOrLit) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


# --------------------------------------------------------------------------
# tier 3: Arrow-vectorized pandas UDFs (the only Python-side functions)
# --------------------------------------------------------------------------

@F.pandas_udf(T.DoubleType())
def _normal_inverse(p: pd.Series, mu: pd.Series, sigma: pd.Series) -> pd.Series:
    """Inverse normal CDF (reference: Acklam's rational approximation,
    WarpCore/Sources/Stats.swift:21-116; Function.swift:1245). Uses the
    same publicly documented Acklam algorithm, vectorized with numpy."""
    import numpy as np

    a = [-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00]
    b = [-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00]
    p_ = np.asarray(p, dtype=float)
    out = np.full_like(p_, np.nan)
    plow, phigh = 0.02425, 1 - 0.02425
    with np.errstate(all="ignore"):
        m = (p_ > 0) & (p_ < plow)
        q = np.sqrt(-2 * np.log(np.where(m, p_, 0.5)))
        out = np.where(
            m,
            (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5])
            / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1),
            out,
        )
        m = (p_ >= plow) & (p_ <= phigh)
        q = p_ - 0.5
        r = q * q
        out = np.where(
            m,
            (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5])
            * q
            / (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1),
            out,
        )
        m = (p_ > phigh) & (p_ < 1)
        q = np.sqrt(-2 * np.log(np.where(m, 1 - p_, 0.5)))
        out = np.where(
            m,
            -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5])
            / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1),
            out,
        )
    res = pd.Series(out * sigma.astype(float) + mu.astype(float))
    res[(p <= 0) | (p >= 1)] = None
    return res


def _hilbert_d2xy_py(n: int, d: int):
    """Hilbert curve index → (x, y); standard public algorithm
    (reference: Value.swift:1168-1261, Function.swift:1592-1635)."""
    rx = ry = 0
    x = y = 0
    t = d
    s = 1
    while s < n:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        # rotate
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y


def _hilbert_xy2d_py(n: int, x: int, y: int) -> int:
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


@F.pandas_udf(T.LongType())
def _hilbert_xy_to_d(n: pd.Series, x: pd.Series, y: pd.Series) -> pd.Series:
    return pd.Series(
        [
            _hilbert_xy2d_py(int(a), int(b), int(c))
            if pd.notna(a) and pd.notna(b) and pd.notna(c)
            else None
            for a, b, c in zip(n, x, y)
        ],
        dtype="Int64",
    )


@F.pandas_udf(T.LongType())
def _hilbert_d_to_x(n: pd.Series, d: pd.Series) -> pd.Series:
    return pd.Series(
        [_hilbert_d2xy_py(int(a), int(b))[0] if pd.notna(a) and pd.notna(b) else None for a, b in zip(n, d)],
        dtype="Int64",
    )


@F.pandas_udf(T.LongType())
def _hilbert_d_to_y(n: pd.Series, d: pd.Series) -> pd.Series:
    return pd.Series(
        [_hilbert_d2xy_py(int(a), int(b))[1] if pd.notna(a) and pd.notna(b) else None for a, b in zip(n, d)],
        dtype="Int64",
    )


# --------------------------------------------------------------------------
# builders (tiers 1-2)
# --------------------------------------------------------------------------

def _logb(x: Column, base: Column) -> Column:
    return F.log(x) / F.log(base)


def _log(x, base=None):
    # base-10 default; 2-arity takes an explicit base (Function.swift:1049)
    if base is None:
        return F.log10(to_number(_c(x)))
    return _logb(to_number(_c(x)), to_number(_c(base)))


def _round(x, decimals=None):
    if decimals is None:
        return F.round(to_number(_c(x)))
    return F.round(to_number(_c(x)), decimals if isinstance(decimals, int) else decimals)


def _power_up(x, base):
    # next power of `base` ≥ x (Function.swift:1637-1659); the round(…,10)
    # keeps exact powers (log 8 base 2 = 2.9999…) from skipping a step
    x, base = to_number(_c(x)), to_number(_c(base))
    return F.power(base, F.ceil(F.round(_logb(x, base), 10)))


def _power_down(x, base):
    x, base = to_number(_c(x)), to_number(_c(base))
    return F.power(base, F.floor(F.round(_logb(x, base), 10)))


def _random_between(a, b):
    a, b = to_number(_c(a)), to_number(_c(b))
    # inclusive upper bound (Function.swift:1220)
    return F.floor(F.rand() * (b - a + 1)) + a


def _if(cond, then, otherwise):
    return F.when(to_bool(_c(cond)), _c(then)).otherwise(_c(otherwise))


def _if_error(value, alternative):
    # invalid (→ NULL/NaN here) replaced by alternative (Function.swift:1028)
    v = _c(value)
    return F.when(v.isNull() | F.isnan(v.try_cast("double")), _c(alternative)).otherwise(v)


def _coalesce(*args):
    # first value that is neither invalid nor empty (Function.swift:986)
    return F.coalesce(*[_c(a) for a in args])


def _and(*args):
    out = to_bool(_c(args[0]))
    for a in args[1:]:
        out = out & to_bool(_c(a))
    return out


def _or(*args):
    out = to_bool(_c(args[0]))
    for a in args[1:]:
        out = out | to_bool(_c(a))
    return out


def _xor(a, b):
    return to_bool(_c(a)) != to_bool(_c(b))


def _in(value, *options):
    return _c(value).isin([*options])


def _not_in(value, *options):
    return ~_c(value).isin([*options])


def _left(s, n):
    return F.substring(to_string(_c(s)), 1, _c(n).cast("int"))


def _right(s, n):
    s = to_string(_c(s))
    n = _c(n).cast("int")
    return F.when(F.length(s) >= n, s.substr(F.length(s) - n + 1, n)).otherwise(s)


def _mid(s, start, length):
    # 0-based start, unlike Excel's 1-based MID: the reference offsets
    # `start` characters from the string start (Function.swift:1137-1151,
    # tested mid(1337,3,1)=="7" at WarpCoreTests.swift:312)
    return to_string(_c(s)).substr(_c(start).cast("int") + F.lit(1), _c(length).cast("int"))


def _substitute(s, find, repl):
    return F.replace(to_string(_c(s)), to_string(_c(find)), to_string(_c(repl)))


def _regex_substitute(s, pattern, repl):
    return F.regexp_replace(to_string(_c(s)), _c(pattern), _c(repl))


def _split(s, sep=","):
    return F.split(to_string(_c(s)), F.lit(sep).cast("string") if not isinstance(sep, Column) else sep, -1)


def _parse_number(s, decimal_sep=".", thousands_sep=","):
    cleaned = F.replace(to_string(_c(s)), F.lit(thousands_sep), F.lit(""))
    cleaned = F.replace(cleaned, F.lit(decimal_sep), F.lit("."))
    return cleaned.try_cast("double")


def _count_string(haystack, needle):
    h, n = to_string(_c(haystack)), to_string(_c(needle))
    return safe_div(F.length(h) - F.length(F.replace(h, n)), F.length(n)).cast("long")


def _nth(lst, i):
    # 1-based (Function.swift:1294)
    return F.try_element_at(_c(lst), _c(i).cast("int"))


def _value_for_key(lst, key):
    """Alternating key/value list lookup (Function.swift:1303;
    Value.swift:62-67 documents the list-as-dictionary abuse). Warp lists
    are heterogeneous, Spark arrays are not — compare as strings."""
    arr = F.transform(_c(lst), to_string)
    pos = F.array_position(arr, to_string(_c(key)))
    return F.when(pos > 0, F.try_element_at(arr, (pos + 1).cast("int")))


def _append_value(lst, v):
    return F.concat(_c(lst), F.array(_c(v)))


def _glue(lst, sep):
    return F.array_join(_c(lst), sep if isinstance(sep, str) else sep)


def _from_excel_date(serial):
    # Excel epoch 1899-12-30, day = 86400 s (Date.swift:25-108)
    return F.timestamp_seconds((to_number(_c(serial)) - 25569.0) * 86400.0)


def _to_excel_date(ts):
    return F.unix_timestamp(_c(ts)) / 86400.0 + 25569.0


def _duration(a, b):
    return F.unix_timestamp(_c(b)) - F.unix_timestamp(_c(a))


def _after(ts, seconds):
    return F.timestamp_seconds(F.unix_timestamp(_c(ts)) + to_number(_c(seconds)))


def _choose(i, *options):
    return F.try_element_at(F.array(*[_c(o) for o in options]), _c(i).cast("int"))


def _is_invalid(x):
    v = _c(x)
    return F.coalesce(F.isnan(v.try_cast("double")), F.lit(False))


FUNCTIONS: dict[str, Callable[..., Column]] = {
    # --- math (Function.swift:946-1260) ---
    "abs": lambda x: F.abs(to_number(_c(x))),
    "negate": lambda x: -to_number(_c(x)),
    "sign": lambda x: F.signum(to_number(_c(x))),
    "sqrt": lambda x: F.sqrt(to_number(_c(x))),
    "exp": lambda x: F.exp(to_number(_c(x))),
    "ln": lambda x: F.log(to_number(_c(x))),
    "log": _log,
    "power": lambda x, y: F.power(to_number(_c(x)), to_number(_c(y))),
    "round": _round,
    "floor": lambda x: F.floor(to_number(_c(x))),
    "ceiling": lambda x: F.ceil(to_number(_c(x))),
    "sin": lambda x: F.sin(to_number(_c(x))),
    "cos": lambda x: F.cos(to_number(_c(x))),
    "tan": lambda x: F.tan(to_number(_c(x))),
    "sinh": lambda x: F.sinh(to_number(_c(x))),
    "cosh": lambda x: F.cosh(to_number(_c(x))),
    "tanh": lambda x: F.tanh(to_number(_c(x))),
    "asin": lambda x: F.asin(to_number(_c(x))),
    "acos": lambda x: F.acos(to_number(_c(x))),
    "atan": lambda x: F.atan(to_number(_c(x))),
    "random": lambda: F.rand(),
    "randomBetween": _random_between,
    "normalInverse": lambda p, mu, sigma: _normal_inverse(
        to_number(_c(p)), to_number(_c(mu)), to_number(_c(sigma))
    ),
    "powerUp": _power_up,
    "powerDown": _power_down,
    "hilbertXYToD": lambda n, x, y: _hilbert_xy_to_d(_c(n).cast("long"), _c(x).cast("long"), _c(y).cast("long")),
    "hilbertDToX": lambda n, d: _hilbert_d_to_x(_c(n).cast("long"), _c(d).cast("long")),
    "hilbertDToY": lambda n, d: _hilbert_d_to_y(_c(n).cast("long"), _c(d).cast("long")),
    # --- logic/control (Function.swift:971-1358) ---
    "and": _and,
    "or": _or,
    "xor": _xor,
    "not": lambda x: ~to_bool(_c(x)),
    "if": _if,
    "ifError": _if_error,
    "coalesce": _coalesce,
    "in": _in,
    "notIn": _not_in,
    "isEmpty": lambda x: _c(x).isNull(),
    "isInvalid": _is_invalid,
    "identity": lambda x: _c(x),
    # --- strings (Function.swift:956-1360) ---
    "uppercase": lambda s: F.upper(to_string(_c(s))),
    "lowercase": lambda s: F.lower(to_string(_c(s))),
    "capitalize": lambda s: F.initcap(to_string(_c(s))),
    "trim": lambda s: F.trim(to_string(_c(s))),
    "length": lambda s: F.length(to_string(_c(s))),
    "left": _left,
    "right": _right,
    "mid": _mid,
    "substitute": _substitute,
    "regexSubstitute": _regex_substitute,
    "split": _split,
    "levenshtein": lambda a, b: F.levenshtein(to_string(_c(a)), to_string(_c(b))),
    "concat": warp_concat,
    "urlEncode": lambda s: F.url_encode(to_string(_c(s))),
    "parseNumber": _parse_number,
    "countString": _count_string,
    "uuid": lambda: F.expr("uuid()"),
    # --- binary / encoding (Function.swift:1661-1716) ---
    "base64Encode": lambda s: F.base64(to_string(_c(s)).cast("binary")),
    "base64Decode": lambda s: F.unbase64(to_string(_c(s))).cast("string"),
    "hexEncode": lambda s: F.hex(to_string(_c(s)).cast("binary")),
    "hexDecode": lambda s: F.unhex(to_string(_c(s))).cast("string"),
    "encodeString": lambda s, cs="UTF-8": F.encode(to_string(_c(s)), cs if isinstance(cs, str) else "UTF-8"),
    "decodeString": lambda b, cs="UTF-8": F.decode(_c(b), cs if isinstance(cs, str) else "UTF-8"),
    "numberOfBytes": lambda b: F.octet_length(_c(b)),
    # --- date/time (Function.swift:1366-1501); session TZ pinned UTC ---
    "now": lambda: F.current_timestamp(),
    "fromUnixTime": lambda s: F.timestamp_seconds(to_number(_c(s))),
    "toUnixTime": lambda ts: F.unix_timestamp(_c(ts)),
    "fromISO8601": lambda s: F.to_timestamp(to_string(_c(s))),
    "toUTCISO8601": lambda ts: F.date_format(_c(ts), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
    "toLocalISO8601": lambda ts: F.date_format(_c(ts), "yyyy-MM-dd'T'HH:mm:ss"),
    "fromExcelDate": _from_excel_date,
    "toExcelDate": _to_excel_date,
    "utcDate": lambda y, m, d: F.make_date(_c(y).cast("int"), _c(m).cast("int"), _c(d).cast("int")),
    "utcDay": lambda ts: F.dayofmonth(_c(ts)),
    "utcMonth": lambda ts: F.month(_c(ts)),
    "utcYear": lambda ts: F.year(_c(ts)),
    "utcHour": lambda ts: F.hour(_c(ts)),
    "utcMinute": lambda ts: F.minute(_c(ts)),
    "utcSecond": lambda ts: F.second(_c(ts)),
    "duration": _duration,
    "after": _after,
    "toUnicodeDateString": lambda ts, fmt: F.date_format(_c(ts), fmt),
    "fromUnicodeDateString": lambda s, fmt: F.to_timestamp(to_string(_c(s)), fmt),
    # --- lists / JSON (Function.swift:1266-1572) ---
    "list": lambda *xs: F.array(*[_c(x) for x in xs]),
    "nth": _nth,
    "valueForKey": _value_for_key,
    "items": lambda lst: F.size(_c(lst)),
    "appendValue": _append_value,
    "appendList": lambda a, b: F.concat(_c(a), _c(b)),
    "glue": _glue,
    "packList": lambda lst: pack_list(_c(lst)),
    "unpackList": lambda s: unpack_list(to_string(_c(s))),
    "jsonDecode": lambda s: F.try_parse_json(to_string(_c(s))),
    "jsonEncode": lambda v: F.to_json(_c(v)),
    "choose": _choose,
}


# --------------------------------------------------------------------------
# Aggregate-capable n-ary functions used in scalar position: SUM(1;2;3)
# etc. delegate to the reducer over the argument list
# (Function.swift:1719-1726). Implemented over an args array, JVM-side.
# --------------------------------------------------------------------------

def _arg_num(a) -> Column:
    """Numeric coercion that survives analysis for ANY input type:
    non-atomic types (arrays, structs) go through a string cast first
    (``try_cast(array<...> as double)`` is an analysis-time error);
    bools keep their 1/0 coercion."""
    c = _c(a)
    s = c.cast("string")
    return (
        F.when(s == "true", F.lit(1.0))
        .when(s == "false", F.lit(0.0))
        .otherwise(s.try_cast("double"))
    )


def _args_array(args) -> Column:
    return F.array(*[_arg_num(a) for a in args])


def _nary_numeric(args) -> Column:
    """Valid (numeric-coercible) argument values, as array<double>."""
    return F.filter(_args_array(args), lambda x: x.isNotNull())


def _scalar_sum(*args):
    return F.coalesce(
        F.aggregate(_nary_numeric(args), F.lit(0.0), lambda acc, x: acc + x),
        F.lit(0.0),
    )


def _scalar_count(*args):
    return F.size(_nary_numeric(args))


def _scalar_count_all(*args):
    return F.lit(len(args))


def _scalar_average(*args):
    vals = _nary_numeric(args)
    return F.when(
        F.size(vals) > 0,
        F.aggregate(vals, F.lit(0.0), lambda acc, x: acc + x) / F.size(vals),
    )


def _scalar_min(*args):
    return F.array_min(_nary_numeric(args))


def _scalar_max(*args):
    return F.array_max(_nary_numeric(args))


def _scalar_median_arr(args) -> Column:
    return F.array_sort(_nary_numeric(args))


def _scalar_median(*args):
    arr = _scalar_median_arr(args)
    n = F.size(arr)
    low = F.try_element_at(arr, ((n + 1) / 2).cast("int"))
    high = F.try_element_at(arr, (n / 2 + 1).cast("int"))
    return (low + high) / 2


def _scalar_median_low(*args):
    arr = _scalar_median_arr(args)
    return F.try_element_at(arr, ((F.size(arr) + 1) / 2).cast("int"))


def _scalar_median_high(*args):
    arr = _scalar_median_arr(args)
    return F.try_element_at(arr, (F.size(arr) / 2 + 1).cast("int"))


def _scalar_median_pack(*args):
    # integral values render without ".0", like Value.stringValue packs
    arr = _scalar_median_arr(args)
    low = F.try_element_at(arr, ((F.size(arr) + 1) / 2).cast("int"))
    high = F.try_element_at(arr, (F.size(arr) / 2 + 1).cast("int"))
    return pack_list(F.array(integral_string(low), integral_string(high)))


def _scalar_var(sample: bool):
    def fn(*args):
        vals = _nary_numeric(args)
        n = F.size(vals)
        mean = F.aggregate(vals, F.lit(0.0), lambda acc, x: acc + x) / n
        ss = F.aggregate(vals, F.lit(0.0), lambda acc, x: acc + (x - mean) * (x - mean))
        denom = (n - 1) if sample else n
        return F.when(denom > 0, ss / denom)

    return fn


def _scalar_stddev(sample: bool):
    v = _scalar_var(sample)

    def fn(*args):
        return F.sqrt(v(*args))

    return fn


def _scalar_pack(*args):
    return pack_list(F.array(*[to_string(_c(a)) for a in args]))


@F.pandas_udf(T.StringType())
def _random_string_udf(pattern: pd.Series) -> pd.Series:
    """RANDSTRING: draw a random string from a sequencer-style pattern
    (reference: Function.swift:1477 via Sequencer.swift). Supports the
    pattern subset [chars]{n} | literal | (a|b); non-deterministic."""
    from warp_spark.sequencer import random_draw

    return pattern.map(lambda p: None if p is None else random_draw(p))


FUNCTIONS.update(
    {
        "sum": _scalar_sum,
        "count": _scalar_count,
        "countAll": _scalar_count_all,
        "average": _scalar_average,
        "min": _scalar_min,
        "max": _scalar_max,
        "median": _scalar_median,
        "medianLow": _scalar_median_low,
        "medianHigh": _scalar_median_high,
        "medianPack": _scalar_median_pack,
        "variancePopulation": _scalar_var(sample=False),
        "varianceSample": _scalar_var(sample=True),
        "standardDeviationPopulation": _scalar_stddev(sample=False),
        "standardDeviationSample": _scalar_stddev(sample=True),
        "pack": _scalar_pack,
        "randomString": lambda p: _random_string_udf(to_string(_c(p))),
        "countDistinct": lambda *args: F.size(
            F.array_distinct(F.filter(F.array(*[_c(a) for a in args]), lambda x: x.isNotNull()))
        ),
    }
)


def call(name: str, *args) -> Column:
    """Invoke a library function by canonical name."""
    fn = FUNCTIONS.get(name)
    if fn is None:
        raise ValueError(f"unknown function {name!r}")
    return fn(*args)
