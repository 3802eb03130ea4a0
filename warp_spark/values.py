"""Warp value-model semantics on typed Spark columns.

The reference is dynamically typed: every cell is a 9-variant ``Value``
(WarpCore/Sources/Value.swift:47-56) with Excel-style implicit coercion
(Value.swift:133-186, 484-545). We keep native Spark column types and
re-express the coercions as Column expressions (SURVEY.md §7.1):

- ``empty``  → SQL NULL.
- ``invalid``→ NULL at the relational layer (the reference's own SQL
  pushdown does the same: invalid → ``(1/0)``, SQL.swift:1040); the
  formula layer exposes invalid-awareness through ``try_``-style
  builders that yield NULL on failure.
- arithmetic coerces both sides through a numeric conversion, else
  NULL (Warp: ``.invalid``) — Value.swift:484-545.
- bools convert to 1/0; strings parse with strict numeric grammar;
  dates never implicitly convert (Value.swift:133-174).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def to_number(col: Column) -> Column:
    """Warp ``doubleValue``: numeric → itself, bool → 1/0, string →
    strict parse, anything else (dates, blobs, malformed) → NULL.

    ``try_cast`` to double already implements bool→1/0 and strict
    string parsing in Spark, and yields NULL for non-convertible input
    instead of raising — matching Warp's ``.invalid`` poisoning.
    """
    return col.try_cast(T.DoubleType())


def to_int(col: Column) -> Column:
    """Warp ``intValue``: like to_number but truncating; NULL when the
    double is out of Int range (Value.swift:184-186)."""
    return col.try_cast(T.DoubleType()).try_cast(T.LongType())


def to_string(col: Column) -> Column:
    return col.cast(T.StringType())


def to_bool(col: Column) -> Column:
    """Warp ``boolValue``: 1 → true, 0 → false, else NULL
    (Value.swift:176-182 accepts only exact 0/1)."""
    d = to_number(col)
    return F.when(d == 1.0, F.lit(True)).when(d == 0.0, F.lit(False))


def is_numeric(col: Column) -> Column:
    """True when the cell coerces to a number — the predicate behind the
    reference's ``count`` aggregator (Function.swift:2069-2094)."""
    return to_number(col).isNotNull()


def num_op(op, *cols: Column) -> Column:
    """Apply an arithmetic op after Warp numeric coercion of all sides."""
    coerced = [to_number(c) for c in cols]
    out = coerced[0]
    for c in coerced[1:]:
        out = op(out, c)
    return out


def safe_div(a: Column, b: Column) -> Column:
    """Division: NULL (Warp invalid) on divide-by-zero — the reference's
    NaN-rejecting Value constructor (Value.swift:95-102, 484-492)."""
    return F.when(to_number(b) != 0, to_number(a) / to_number(b))


def warp_concat(*cols) -> Column:
    """The ``&`` operator — string concatenation after stringValue
    coercion (Value.swift:503-509). NULL input → NULL (invalid)."""
    return F.concat(
        *[to_string(c if isinstance(c, Column) else F.lit(c)) for c in cols]
    )


# ---------------------------------------------------------------------------
# Pack format (Value.swift:266-380, Docs/docs/pack.md): a [String] packed
# into one cell. `,` separates items; `$1` escapes `$`, `$0` escapes `,`.
# Re-expressed as Column ops over native arrays.
# ---------------------------------------------------------------------------

def integral_string(col: Column) -> Column:
    """Render a number the way Warp's Value stringifies: integral doubles
    without the trailing ``.0`` (an int Value packs as ``1``, not
    ``1.0`` — Value.swift:133-137)."""
    d = col.cast("double")
    return F.when(
        d.isNotNull() & (d == F.floor(d)) & (F.abs(d) < 9.2e18),
        d.cast("long").cast("string"),
    ).otherwise(col.cast("string"))


def pack_escape(col: Column) -> Column:
    return F.replace(F.replace(col.cast("string"), F.lit("$"), F.lit("$1")), F.lit(","), F.lit("$0"))


def pack_unescape(col: Column) -> Column:
    return F.replace(F.replace(col, F.lit("$0"), F.lit(",")), F.lit("$1"), F.lit("$"))


def pack_list(arr: Column) -> Column:
    """array<string> → pack-encoded string."""
    return F.array_join(F.transform(arr, pack_escape), ",")


def unpack_list(col: Column) -> Column:
    """pack-encoded string → array<string>."""
    return F.transform(F.split(col, ",", -1), pack_unescape)
