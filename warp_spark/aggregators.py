"""Aggregation surface: the reference's ``Aggregator`` = map expression +
reduce function + optional minimumCount (WarpCore/Sources/Aggregation.swift:31-75).

Reducers are required to be decomposable ("reduce(reduce(a,b), reduce(c,d))
== reduce(a,b,c,d)", Aggregation.swift:29-30) — exactly Spark's
partial/final aggregation model, so every reducer below compiles to a
built-in JVM aggregate and gets map-side partial aggregation for free.

``minimumCount`` (privacy minimum-cell-size, Aggregation.swift:103-134)
is emulated the same way the reference's own SQL backend does:
``CASE WHEN COUNT(x) >= n THEN agg ELSE NULL END`` (SQL.swift:797-801).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

from warp_spark.values import integral_string, is_numeric, pack_escape, to_number


def _sum(c: Column) -> Column:
    # Warp sum ignores non-numeric values (Function.swift:2032-2043) but
    # returns 0 (not NULL) for an empty input set.
    return F.coalesce(F.sum(to_number(c)), F.lit(0.0))


def _average(c: Column) -> Column:
    return F.avg(to_number(c))


def _count(c: Column) -> Column:
    # counts numeric-convertible values only (Function.swift:2069-2094)
    return F.count(F.when(is_numeric(c), 1))


def _count_all(c: Column) -> Column:
    # counts everything, including empty/invalid (Function.swift:2069-2094)
    return F.count(F.lit(1))


def _count_distinct(c: Column) -> Column:
    # skips NULL (empty/invalid), Function.swift:2120-2134
    return F.count_distinct(c)


def _concat(c: Column) -> Column:
    return F.concat_ws("", F.collect_list(c.cast("string")))


def _pack(c: Column) -> Column:
    return F.array_join(F.collect_list(pack_escape(c)), ",")


def _list(c: Column) -> Column:
    return F.collect_list(c)


def _median(c: Column) -> Column:
    # exact interpolated median; even count → average of the two middle
    # values (MedianReducer, Function.swift:2136-2189)
    return F.percentile(to_number(c), F.lit(0.5))


def _sorted_vals(c: Column) -> Column:
    return F.sort_array(F.collect_list(to_number(c)))


def _median_low(c: Column) -> Column:
    # lower of the two middle values. collect_list-based: exact but
    # memory-bound per group — acceptable because medianLow/High are
    # tail surface; the common `median` uses the scalable percentile().
    arr = _sorted_vals(c)
    return F.try_element_at(arr, ((F.size(arr) + 1) / 2).cast("int"))


def _median_high(c: Column) -> Column:
    arr = _sorted_vals(c)
    return F.try_element_at(arr, (F.size(arr) / 2 + 1).cast("int"))


# NOTE: the median reducers below sort a collected array per group —
# exact and fine while a group fits one buffer (the reference is
# single-node, MedianReducer Function.swift:2136-2189). For giant
# groups use warp_spark.median.grouped_median: same exact semantics
# (equivalence-tested), O(1) memory per task via a spillable window
# sort. approxMedian is the sketch tier.
def _median_pack(c: Column) -> Column:
    # pack of the two middle values (Function.swift:2136-2189); integral
    # values render without ".0" like the reference's Value.stringValue
    arr = _sorted_vals(c)
    low = F.try_element_at(arr, ((F.size(arr) + 1) / 2).cast("int"))
    high = F.try_element_at(arr, (F.size(arr) / 2 + 1).cast("int"))
    return F.array_join(
        F.transform(F.array(low, high), lambda v: pack_escape(integral_string(v))), ","
    )


def _min(c: Column) -> Column:
    return F.min(c)


def _max(c: Column) -> Column:
    return F.max(c)


def _var_pop(c: Column) -> Column:
    return F.var_pop(to_number(c))


def _var_samp(c: Column) -> Column:
    return F.var_samp(to_number(c))


def _stddev_pop(c: Column) -> Column:
    return F.stddev_pop(to_number(c))


def _stddev_samp(c: Column) -> Column:
    return F.stddev_samp(to_number(c))


def _random_item(c: Column) -> Column:
    # any-value semantics (Function.swift:872; SQL backends refuse it,
    # SQL.swift:791-794) — Spark's first() over an unspecified order.
    return F.first(c, ignorenulls=True)


REDUCERS: dict[str, Callable[[Column], Column]] = {
    "sum": _sum,
    # native-typed sum: no doubleValue coercion, so decimal inputs keep
    # exact integer arithmetic (Warp's dynamic model has no decimals;
    # this is the Spark-idiomatic extension for typed columns)
    "sumExact": lambda c: F.sum(c),
    "average": _average,
    "min": _min,
    "max": _max,
    "count": _count,
    "countAll": _count_all,
    "countDistinct": _count_distinct,
    "concat": _concat,
    "pack": _pack,
    "list": _list,
    "median": _median,
    "medianLow": _median_low,
    "medianHigh": _median_high,
    "medianPack": _median_pack,
    "variancePopulation": _var_pop,
    "varianceSample": _var_samp,
    "standardDeviationPopulation": _stddev_pop,
    "standardDeviationSample": _stddev_samp,
    "randomItem": _random_item,
    # --- approximate tier (beyond the reference; the 100 TB path) -------
    # The reference's countDistinct/median are exact (Function.swift:
    # 2120-2134, 2136-2189) and stay the defaults. At cluster scale an
    # exact distinct-count shuffles every distinct value and an exact
    # median sorts the group; these sketch variants are single-pass,
    # mergeable, constant memory per group.
    "approxCountDistinct": lambda c: F.approx_count_distinct(c),  # HyperLogLog++
    "approxMedian": lambda c: F.percentile_approx(to_number(c), 0.5, 10_000),
}


@dataclass
class Aggregator:
    """map expression + reducer name (+ minimum_count privacy floor)."""

    map: Union[Column, str]
    reduce: str
    minimum_count: Optional[int] = None

    def _map_col(self) -> Column:
        return F.expr(self.map) if isinstance(self.map, str) else self.map

    def to_column(self, alias: str) -> Column:
        c = self._map_col()
        reducer = REDUCERS.get(self.reduce)
        if reducer is None:
            raise ValueError(f"unknown reducer {self.reduce!r}")
        agg = reducer(c)
        if self.minimum_count is not None:
            # CASE WHEN COUNT(x) >= n THEN agg ELSE NULL (SQL.swift:797-801)
            agg = F.when(F.count(c) >= self.minimum_count, agg)
        return agg.alias(alias)
