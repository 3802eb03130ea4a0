"""Example (sampled) execution budget — the reference's QBECalculator.

Warp previews every chain edit on a truncated source: ``QBECalculator``
picks ``maxInputRows`` from an online performance model — observed
rows/second and row amplification (output rows per input row), each
tracked with confidence intervals — so the preview finishes inside a
fixed time budget (Warp/Sources/Controller/QBECalculator.swift:140-250;
the CI math is Stats.swift:119-194).

Spark-first equivalent: the *execution* needs nothing special —
``df.limit(n)`` on the source truncates the scan (Spark pushes LIMIT
into the file source via ``GlobalLimit/LocalLimit``), and the rest of
the chain runs unchanged. What this module adds is the budget logic:

- :class:`Moving` — streaming mean/variance/CI over recent samples
  (the reference keeps the last N observations; same here).
- :class:`ExampleCalculator` — owns two ``Moving`` models (input
  rows/sec, row amplification), proposes ``max_input_rows`` for a
  wall-clock budget using the *pessimistic* CI edge (lower rows/sec,
  upper amplification — same one-sided choice as the reference), and
  learns from each finished run via :meth:`observe`.
- :meth:`example` — run ``chain`` on a limited source, observe, and
  return the result plus the sample size used.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame


class Moving:
    """Mean/variance over the most recent ``limit`` samples with a
    normal-approximation confidence interval (Stats.swift:119-194)."""

    def __init__(self, limit: int = 20):
        self.limit = limit
        self.samples: list[float] = []

    def add(self, value: float) -> None:
        self.samples.append(float(value))
        if len(self.samples) > self.limit:
            del self.samples[0]

    @property
    def n(self) -> int:
        return len(self.samples)

    @property
    def mean(self) -> float:
        return sum(self.samples) / len(self.samples) if self.samples else float("nan")

    @property
    def sd(self) -> float:
        n = len(self.samples)
        if n < 2:
            return 0.0
        m = self.mean
        return math.sqrt(sum((x - m) ** 2 for x in self.samples) / (n - 1))

    def interval(self, z: float = 1.96) -> tuple[float, float]:
        """Normal CI for the mean; collapses to (mean, mean) under two
        samples — the reference likewise returns the point estimate
        until it has data."""
        if not self.samples:
            return (float("nan"), float("nan"))
        half = z * self.sd / math.sqrt(len(self.samples)) if len(self.samples) > 1 else 0.0
        return (self.mean - half, self.mean + half)


@dataclass
class ExampleCalculator:
    """Pick ``max_input_rows`` so a sampled chain run fits a time
    budget, learning rows/sec and row amplification from finished runs.

    ``desired_example_time`` and the row clamps mirror the reference's
    defaults (QBECalculator.swift:140-175: example time ~0.5 s,
    maximumExampleInputRows cap).
    """

    desired_example_time: float = 0.5
    min_input_rows: int = 100
    max_input_rows: int = 500_000
    rows_per_sec: Moving = field(default_factory=Moving)
    amplification: Moving = field(default_factory=Moving)
    # semanticHash(plan) → rows seen under the largest limit probed so far
    _source_rows: dict = field(default_factory=dict)

    def proposed_input_rows(self, time_budget: Optional[float] = None) -> int:
        """Pessimistic budget: lower-CI rows/sec, so an uncertain model
        proposes smaller samples until observations accumulate."""
        budget = time_budget if time_budget is not None else self.desired_example_time
        if self.rows_per_sec.n == 0:
            return self.min_input_rows
        lo, _ = self.rows_per_sec.interval()
        rps = max(lo, 1.0)
        return max(self.min_input_rows, min(self.max_input_rows, int(rps * budget)))

    def proposed_output_rows(self, time_budget: Optional[float] = None) -> int:
        """Expected output size for the proposed input (upper-CI
        amplification) — callers use it to cap UI materialization."""
        n_in = self.proposed_input_rows(time_budget)
        if self.amplification.n == 0:
            return n_in
        _, hi = self.amplification.interval()
        return int(n_in * max(hi, 0.0))

    def observe(self, input_rows: int, output_rows: int, seconds: float) -> None:
        if seconds > 0 and input_rows > 0:
            self.rows_per_sec.add(input_rows / seconds)
            self.amplification.add(output_rows / input_rows)

    def example(
        self,
        source: DataFrame,
        chain: Callable[[DataFrame], DataFrame],
        time_budget: Optional[float] = None,
    ) -> tuple[list, int]:
        """Run ``chain`` over a limited source, collect, learn.

        Returns (collected rows, input rows used). The limit lands on
        the *source* — downstream operators run unmodified, exactly the
        reference's ``exampleDataset`` shape (QBEStep.swift:98-116)."""
        n = self.proposed_input_rows(time_budget)
        limited = source.limit(n)
        t0 = time.monotonic()
        out = chain(limited).collect()
        elapsed = time.monotonic() - t0
        # the source may hold fewer rows than the proposal; learn the
        # source size ONCE per distinct plan (semanticHash) instead of
        # re-counting on every preview — the count job would otherwise
        # double the preview latency this class exists to bound
        sh = source.semanticHash()
        n_src = self._source_rows.get(sh)
        if n_src is None or n_src < n:
            n_src = source.limit(n).count()
            self._source_rows[sh] = n_src
        actual_in = min(n, n_src)
        self.observe(actual_in, len(out), elapsed)
        return out, actual_in
