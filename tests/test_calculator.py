"""Example-calculation budget model (reference QBECalculator.swift:140-250):
cold start proposes the floor, observations widen the budget, pessimistic
CI shrinks it under variance, clamps bound it, and the end-to-end example()
path limits the source and learns from the run."""

import pytest
from pyspark.sql import functions as F

from warp_spark.calculator import ExampleCalculator, Moving

SF = "/root/testdata/sf0.001"


def test_moving_interval_narrows():
    m = Moving()
    for v in [100.0] * 2:
        m.add(v)
    lo2, hi2 = m.interval()
    for v in [100.0] * 18:
        m.add(v)
    lo20, hi20 = m.interval()
    assert hi20 - lo20 <= hi2 - lo2
    assert m.mean == pytest.approx(100.0)


def test_cold_start_proposes_floor():
    c = ExampleCalculator(min_input_rows=250)
    assert c.proposed_input_rows() == 250


def test_observations_grow_budget_and_clamp():
    c = ExampleCalculator(desired_example_time=0.5, max_input_rows=10_000)
    for _ in range(5):
        c.observe(input_rows=50_000, output_rows=50_000, seconds=0.1)  # 500k rows/s
    # 500k rows/s * 0.5s = 250k, clamped to 10k
    assert c.proposed_input_rows() == 10_000
    c2 = ExampleCalculator(desired_example_time=0.5)
    for _ in range(5):
        c2.observe(input_rows=1_000, output_rows=1_000, seconds=1.0)  # 1k rows/s
    assert 100 <= c2.proposed_input_rows() <= 500


def test_variance_makes_proposal_pessimistic():
    stable, noisy = ExampleCalculator(), ExampleCalculator()
    for _ in range(10):
        stable.observe(10_000, 10_000, 1.0)
    for i in range(10):
        noisy.observe(10_000, 10_000, 0.5 if i % 2 else 1.5)
    assert noisy.proposed_input_rows() <= stable.proposed_input_rows()


def test_amplification_tracks_fanout():
    c = ExampleCalculator()
    for _ in range(5):
        c.observe(input_rows=1_000, output_rows=3_000, seconds=0.1)
    assert c.proposed_output_rows() >= 3 * c.proposed_input_rows() * 0.9


def test_example_runs_chain_on_limited_source(spark):
    c = ExampleCalculator(min_input_rows=200, desired_example_time=0.2)
    src = spark.read.parquet(f"{SF}/orders.parquet")

    def chain(df):
        return df.filter(F.col("o_totalprice") > 0).select(
            "o_orderkey", (F.col("o_totalprice") * 2).alias("doubled")
        )

    rows, n_in = c.example(src, chain)
    assert n_in == 200  # cold start = floor
    assert 0 < len(rows) <= 200
    assert c.rows_per_sec.n == 1 and c.amplification.n == 1
    # second run uses the learned model: a sub-budget first run must not
    # shrink the proposal below the floor
    rows2, n_in2 = c.example(src, chain)
    assert n_in2 >= 200
