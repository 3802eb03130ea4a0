"""Physical-plan regression tests: the plan *shape* is the product at
scale (SURVEY §4 — every reference rewrite is Catalyst-built-in, so our
job is emitting plans that let Catalyst do its work). These assert the
properties .explain() was used to verify by hand:

- filters and column pruning reach the parquet scan,
- dimension joins broadcast (no shuffle of the fact side),
- aggregates run partial→final (map-side combine),
- windowed/running ops need exactly the shuffles their keys imply.
"""

import pytest

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    from warp_spark.catalog import QUERIES

    df = QUERIES[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(spark, name: str) -> str:
    from warp_spark.catalog import QUERIES

    df = QUERIES[name](spark, SF)
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_q6_filter_pushdown_and_pruning(spark):
    """Single-table filter+agg: predicates reach the scan, ReadSchema
    keeps only the referenced columns."""
    import re

    plan = plan_of(spark, "q6_forecast_revenue")
    assert "PushedFilters: [IsNotNull" in plan
    # column pruning: lineitem has 11 columns; the scan must not read them all
    scan_cols = re.search(r"FileScan parquet \[([^\]]*)\]", plan).group(1)
    assert len(scan_cols.split(",")) <= 5, scan_cols


def test_q5_broadcasts_dimensions(spark):
    """Star join: dims broadcast; the lineitem side is never exchanged
    before its first join."""
    plan = plan_of(spark, "q5_local_supplier_volume")
    assert "BroadcastHashJoin" in plan


def test_q1_partial_final_aggregate(spark):
    """GROUP BY runs map-side partial then final — exactly one shuffle
    between two HashAggregate layers."""
    plan = plan_of(spark, "q1_pricing_summary")
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan  # partial aggregate functions present


def test_exact_dedup_single_window_shuffle(spark):
    """Fingerprint dedup = one hash-partitioned window, one Exchange."""
    plan = plan_of(spark, "dedup_exact")
    assert plan.count("Exchange hashpartitioning") == 1


def test_filter_calculate_is_scan_project_filter(spark):
    """filter+calculate compiles to scan→filter→project — no shuffle,
    no UDF, single codegen stage."""
    plan = plan_of(spark, "filter_calculate")
    assert "Exchange" not in plan
    assert "Python" not in plan  # pure JVM expressions


def test_langid_no_python(spark):
    """Language ID is pure Column ops (one aggregate HOF pass) — no
    Python workers in the plan."""
    plan = plan_of(spark, "text_langid")
    assert "Python" not in plan


def test_asof_no_broadcast(spark):
    plan = plan_of(spark, "asof_purchase_click")
    assert "BroadcastExchange" not in plan


def test_rangejoin_is_equijoin(spark):
    plan = plan_of(spark, "range_join_error_views")
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_no_cartesian(spark):
    """LSH candidate generation must never plan a cartesian/nested-loop
    join — band equi-join only."""
    plan = plan_of(spark, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ineffective_filter_pruned(spark):
    """Catalyst removes constant-true filters (reference coalescer
    rewrite, Data.swift:601-609 — built-in equivalent)."""
    from pyspark.sql import functions as F

    from warp_spark import Dataset

    ds = Dataset.from_parquet(spark, f"{SF}/region.parquet")
    plan = ds.filter(F.lit(True)).to_df()._jdf.queryExecution().optimizedPlan().toString()
    assert "Filter" not in plan


def test_random_sample_no_full_sort(spark):
    """random(n) must compile to TakeOrderedAndProject (per-partition
    top-n by the random key + driver merge of n*P candidates — the
    two-phase reservoir shape), never a global Sort + Exchange."""
    from warp_spark import Dataset

    ds = Dataset.from_parquet(spark, f"{SF}/orders.parquet").random(100, seed=42)
    plan = ds.to_df()._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    assert "\n+- Sort" not in plan and "*Sort " not in plan


def test_decontaminate_broadcasts_benchmark(spark):
    """Decontamination: the benchmark n-gram set broadcasts (train side
    never shuffles for the join), gram hashing is pure JVM (no Python
    stages), and the only hash Exchange is the per-doc count groupBy."""
    plan = plan_of(spark, "decontaminate_ngram")
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # the TRAIN side shuffles exactly once (per-doc count groupBy); the
    # other hash Exchange in the plan is the benchmark-sized distinct
    # feeding the BroadcastExchange
    assert plan.count("Exchange hashpartitioning(doc_id") == 1, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    # the tokenizer must run ONCE per side, as its own aliased
    # projection. If split() leaks into the gram transform lambda or an
    # inferred filter, it re-executes per element — O(len^2) per doc
    # (measured 113x at sf0.1; see ngram_hashes_from_tokens docstring)
    assert plan.count("split(lower") == 2, plan


def test_text_repetition_no_shuffle_no_python(spark):
    """Per-document text signals must stay in the scan's codegen stage:
    no Exchange, no Python eval."""
    plan = plan_of(spark, "text_repetition")
    assert "Exchange" not in plan
    for py in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert py not in plan


def test_curation_pipeline_shuffle_budget(spark):
    """The five-stage curation composition keeps its shuffle budget:
    fingerprint window + final aggregation + output sort — nothing
    per-stage."""
    import re

    plan = plan_of(spark, "pipeline_curation_summary")
    assert len(re.findall(r"Exchange (?:hash|range|Single)", plan)) <= 3
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_q2_window_decorrelation_single_part_shuffle(spark):
    """The correlated-min decorrelates to a window over the partkey
    shuffle — two Exchanges total (agg + window), dims broadcast, no
    sort-merge join."""
    import re

    plan = plan_of(spark, "q2_min_cost_supplier")
    assert len(re.findall(r"Exchange (?:hash|range|Single)", plan)) <= 3
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3


def test_gapfill_grid_side_broadcasts(spark):
    """The dense hour grid (keys × span) is the small side and must
    broadcast into the join with the rollup — the rollup never
    reshuffles for it."""
    plan = plan_of(spark, "events_gapfill_hourly")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_char_entropy_no_shuffle_no_python(spark):
    """Char-entropy stays map-side HOFs: no Exchange (an explode->groupBy
    formulation would shuffle one row per character), no Python eval."""
    plan = plan_of(spark, "text_char_entropy")
    assert "Exchange" not in plan
    for py in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert py not in plan


def test_pack_sequences_distributed_prefix(spark):
    """Packing must use the two-phase prefix shape: range partition on
    the order key, never a global single-task window over the data."""
    plan = plan_of(spark, "pack_sequences")
    assert "Exchange rangepartitioning" in plan
    assert "SinglePartition" not in plan or plan.count("Window") >= 2


def test_tokenize_apply_no_shuffle_no_python(spark):
    """Applying the trained vocab is a literal-map probe per token:
    the result plan (vocab already collected) must be a pure map-side
    projection — no Exchange, no Python eval."""
    plan = plan_of(spark, "tokenize_vocab_ids")
    assert "Exchange" not in plan
    for py in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert py not in plan


def test_char_entropy_single_evaluation(spark):
    """The staged entropy pipeline must keep exactly ONE char extract,
    ONE sort and ONE run fold in the plan — re-inlining any of them per
    output column is the CollapseProject pathology that cost 4.5× here
    (and 32× in the per-distinct-char formulation)."""
    plan = plan_of(spark, "text_char_entropy")
    assert plan.count("regexp_extract_all") == 1, plan
    assert plan.count("array_sort") == 1, plan
    assert plan.count("aggregate(") == 1, plan


def test_path_trigrams_single_wide_exchange(spark):
    """All four window passes (gap marker, session prefix sum, lead(1),
    lead(2)) must ride ONE user_id hash Exchange — the session window
    partitions by (user_id, __sno), a refinement Spark satisfies from
    the existing distribution with an in-partition re-sort, no second
    data-sized shuffle. The only other Exchange is the final trigram
    groupBy, whose partial aggregation bounds it by |event_type|³."""
    plan = plan_of(spark, "events_path_trigrams")
    assert plan.count("Exchange") == 2, plan


def test_ngram_novelty_staged_tokenization(spark):
    """The novelty pipeline reads the gram column from TWO branches
    (first-doc groupBy and the join-back), so the plan may tokenize at
    most once per branch — a plain explode would let
    InferFiltersFromGenerate re-inline the gram tree per document (the
    O(len²) CollapseProject pathology, 8× measured here before the
    explode_outer fix)."""
    plan = plan_of(spark, "ngram_novelty")
    assert plan.count("split(") <= 2, plan


def test_driver_window_is_the_queries_prefix():
    """The grading driver judges the FIRST 50 queries() entries — a
    silent ordering regression would waste an entire driver round, so
    pin it: the catalog dict must START with _DRIVER_WINDOW in order,
    followed by every remaining entry, and every windowed entry must
    have an oracle."""
    import __spark_entry__ as m
    from warp_spark.catalog import _DRIVER_WINDOW

    names = list(m.queries())
    assert names[: len(_DRIVER_WINDOW)] == list(_DRIVER_WINDOW)
    assert len(_DRIVER_WINDOW) == 50
    assert len(set(names)) == len(names)
    oracles = m.oracle_sql()
    missing = [n for n in _DRIVER_WINDOW if n not in oracles]
    assert not missing, f"windowed entries without oracles: {missing}"


def test_driver_window_rotation_policy():
    """Mechanize the freshness rotation: the window must never spend a
    slot on an entry whose driver evidence is from the two most recent
    judged rounds while a never-judged or strictly-staler entry exists
    outside the window — except the pinned flagship TPC-H trio, which
    stays in-window every round by design.  Evidence = the committed
    CORRECTNESS_r*.json snapshots (each round's keys are the judged
    entries).

    Grace semantics: the window is judged against the evidence that
    existed WHEN IT WAS DESIGNED — snapshots from rounds strictly
    before catalog._DRIVER_WINDOW_ROUND.  Without this, the driver's
    own snapshot for the round the window was built for (which
    postdates the commit) would mark the whole window "fresh" and turn
    the suite red in the as-judged tree — crying wolf between rounds
    (this is exactly what happened with CORRECTNESS_r07 vs the r7
    window; see VERDICT.md r7 'What's wrong')."""
    import glob
    import json
    import os
    import re

    import __spark_entry__ as m
    from warp_spark.catalog import (
        _DRIVER_WINDOW,
        _DRIVER_WINDOW_REJUDGE,
        _DRIVER_WINDOW_ROUND,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        if rnd >= _DRIVER_WINDOW_ROUND:
            continue  # postdates the window design — grace
        rounds.append(rnd)
        with open(path) as f:
            for key in json.load(f):
                latest[key] = max(latest.get(key, 0), rnd)
    if len(rounds) < 2:
        return  # not enough history to rank freshness
    fresh_cutoff = sorted(rounds)[-2]  # two most recent judged rounds
    flagship = {"q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume"}
    # Entries whose evidence predates a semantic change to the shipped
    # code path are deliberately re-judged even though their snapshot
    # looks fresh (catalog._DRIVER_WINDOW_REJUDGE documents each one).
    exempt = flagship | _DRIVER_WINDOW_REJUDGE
    window = set(_DRIVER_WINDOW)
    all_names = set(m.queries())
    # staleness rank: never judged = -1 (stalest), else latest round
    outside = all_names - window
    stalest_outside = min((latest.get(n, -1) for n in outside), default=None)
    offenders = [
        n
        for n in _DRIVER_WINDOW
        if n not in exempt
        and latest.get(n, -1) >= fresh_cutoff
        and stalest_outside is not None
        and stalest_outside < latest.get(n, -1)
    ]
    assert not offenders, (
        f"window wastes slots on fresh evidence {offenders} while entries "
        f"with staleness {stalest_outside} sit outside the window"
    )


def test_partitioned_read_prunes_partitions(spark):
    """A filter on a hive-partition column becomes a planning-time
    PartitionFilter — excluded directories are never listed into the
    scan (the coarse layout dimension; zorder covers row groups)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from warp_spark.catalog import _events
    from warp_spark.layout import write_hive_partitioned

    d = tempfile.mkdtemp(prefix="warp_part_plan_")
    try:
        write_hive_partitioned(_events(spark, SF), d, ["event_type"])
        df = spark.read.parquet(d).filter(F.col("event_type") == "click")
        plan = df._jdf.queryExecution().executedPlan().toString()
        pf = plan.split("PartitionFilters: [", 1)
        assert len(pf) == 2, plan
        assert "event_type" in pf[1].split("]", 1)[0]
        # the data filter must NOT also appear as a pushed data filter —
        # it is satisfied entirely by pruning
        assert df.count() == _events(spark, SF).filter("event_type = 'click'").count()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_bottomk_sample_no_full_sort(spark):
    """Global bottom-k must compile to TakeOrderedAndProject (map-side
    top-k + k·P-row driver merge) — never a global Sort + Exchange;
    same pin as random_sample, but for the deterministic sampler."""
    plan = plan_of(spark, "sample_bottomk")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_pii_redact_stages_each_regex_once(spark):
    """redact_pii exists (vs scrub_pii) precisely so each regexp runs
    once per row: 4 sequential rules must compile to exactly 4
    regexp_replace and 4 regexp_count occurrences in the optimized
    plan.  If CollapseProject ever re-inlines the replace chain into
    both of a stage's readers (count + next replace), these counts
    double — the same pathology pinned for text_char_entropy above."""
    plan = optimized_of(spark, "text_pii_redact")
    assert plan.count("regexp_replace") == 4, plan
    # regexp_count compiles to size(regexp_extract_all(...))
    assert plan.count("regexp_extract_all") == 4, plan


def test_sample_weighted_no_shuffle_no_python(spark):
    """The weighted sampler's ticket-min key is a scan-side HOF and the
    selection is a map-side top-k: TakeOrderedAndProject, zero Exchange,
    zero Python — only k rows per partition ever move."""
    plan = plan_of(spark, "sample_weighted")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_triangle_counts_caches_oriented_build_once(spark):
    """The oriented-edge build feeds the wedge join twice plus the
    closure probe; the persist must survive into the executed plan
    (three InMemoryTableScans of ONE cached build) — an unpersist-
    before-execution regression would drop them to zero and silently
    triple the build. Also: no BNL anywhere in the wedge pipeline."""
    plan = plan_of(spark, "graph_triangle_counts")
    assert plan.count("InMemoryTableScan") == 3
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_running_distinct_uses_prefix_path(spark):
    """rank_running_distinct must run the distributed decomposition:
    a value-partitioned marker window (PARTITION BY user_id — never a
    whole-data unpartitioned window) followed by the range-partitioned
    prefix machinery. The only allowed unpartitioned window is the
    N-partitions-row offsets side table."""
    plan = plan_of(spark, "rank_running_distinct")
    assert "Exchange rangepartitioning" in plan
    assert "Exchange hashpartitioning(user_id" in plan


def test_every_catalog_entry_has_a_plans_row():
    """Docs completeness is mechanized: every queries() entry must have
    a row in PLANS.md (regenerate with tools/plan_report.py).  This is
    the guard the r8 round lacked when bm25_topk shipped in the closing
    snapshot with no documentation — a last-minute entry can no longer
    land silently."""
    import os
    import re

    import __spark_entry__ as m

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md")) as f:
        documented = set(re.findall(r"^\| (\w+) \|", f.read(), re.M))
    documented.discard("query")  # the header row
    missing = sorted(set(m.queries()) - documented)
    assert not missing, (
        f"catalog entries without a PLANS.md row: {missing} — run "
        "python tools/plan_report.py"
    )


def test_attribution_single_user_exchange(spark):
    """Both carry-forward window columns (last touch type, last touch
    micros) share ONE user_id hash Exchange; the only other Exchange is
    the final channel groupBy, bounded by |channels| after partial
    aggregation."""
    plan = plan_of(spark, "events_attribution_last_touch")
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan  # + channel agg
    assert plan.count("Window") == 1, plan  # both carry-forwards share it


def test_ann_index_probe_partition_pruning(spark):
    """The persisted inverted file must be probed via PARTITION PRUNING:
    the codes scan's centroid_id IN (...) filter has to land in the
    scan's PartitionFilters (the layout contract of
    persist_ivfpq_index — unprobed lists never read), not as a
    post-scan Filter over all lists."""
    import re

    from pyspark.sql import functions as F

    from warp_spark.catalog import _ensure_ann_index, _t
    from warp_spark.pipeline.similarity import ivfpq_probe, load_ivfpq_index

    # the catalog entry's final plan inlines the probe aggregate as a
    # literal (_scalar_join), so pin the probe subtree itself
    path = _ensure_ann_index(spark, SF)
    centroids, codebooks, codes, storage = load_ivfpq_index(spark, path)
    q = _t(spark, SF, "embeddings").to_df().filter(F.col("vec_id") < 10)
    df = ivfpq_probe(
        q, codes, centroids, codebooks, k=5, nprobe=12, rerank=100, storage=storage
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [
        s for s in re.findall(r"FileScan parquet[^\n]*", plan) if "/codes" in s
    ]
    assert scans, plan
    assert all(
        "PartitionFilters" in s
        and "centroid_id" in s.split("PartitionFilters", 1)[1].split("]", 1)[0]
        for s in scans
    ), scans


def test_ann_index_probe_equals_inquery_ivfpq(spark):
    """Training is deterministic (hash-ordered draws, no RNG), so
    loading the persisted artifacts and probing must reproduce the
    in-query ivfpq_topk result EXACTLY — neighbor ids, sims, and ranks.
    This is the determinism contract that makes persist-vs-probe entry
    ordering irrelevant."""
    from pyspark.sql import functions as F

    from warp_spark.catalog import _ensure_ann_index, _t
    from warp_spark.pipeline.similarity import (
        ivfpq_probe,
        ivfpq_topk,
        load_ivfpq_index,
    )

    path = _ensure_ann_index(spark, SF, rebuild=True)
    centroids, codebooks, codes, storage = load_ivfpq_index(spark, path)
    emb = _t(spark, SF, "embeddings").to_df()
    q = emb.filter(F.col("vec_id") < 10)
    got = ivfpq_probe(
        q, codes, centroids, codebooks, k=5, nprobe=12, rerank=100, storage=storage
    ).collect()
    want = ivfpq_topk(q, emb, k=5, n_centroids=16, nprobe=12, rerank=100).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(map(tuple, got), key=lambda t: (t[0], t[3])) == sorted(
        map(tuple, want), key=lambda t: (t[0], t[3])
    )
    assert len(got) == 50  # 10 queries × k=5


def test_never_judged_entries_are_queued_or_windowed():
    """Rotation bookkeeping is mechanized end-to-end: every catalog
    entry with NO driver evidence in any CORRECTNESS_r*.json must
    either sit in the current driver window (being judged this round)
    or be listed in PARITY.md's rotation-queue SECTION — the text
    between a ``**rNN rotation queue**`` marker and the next heading —
    so a new entry can neither be forgotten by the next rotation nor
    silently drop out of the freshness ledger.  (r9 verdict finding 1:
    matching a backticked name *anywhere* in PARITY.md let an entry
    that was documented-but-not-queued slip through.)"""
    import glob
    import json
    import os
    import re

    import __spark_entry__ as m
    from warp_spark.catalog import _DRIVER_WINDOW

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    judged = set()
    for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        d = json.load(open(p))
        judged.update(d if isinstance(d, dict) else [r["name"] for r in d])
    with open(os.path.join(repo, "PARITY.md")) as f:
        parity = f.read()
    # Queue membership counts ONLY inside rotation-queue sections:
    # from each "**rNN rotation queue**" marker to the next markdown
    # heading (a line starting with '#').
    queue_text = "".join(
        mt.group(0)
        for mt in re.finditer(
            r"\*\*r\d+ rotation queue\*\*.*?(?=^#|\Z)", parity, re.S | re.M
        )
    )
    assert queue_text, "PARITY.md has no '**rNN rotation queue**' section"
    never = set(m.queries()) - judged
    unaccounted = sorted(
        n for n in never if n not in _DRIVER_WINDOW and f"`{n}`" not in queue_text
    )
    assert not unaccounted, (
        f"never-driver-judged entries neither in the window nor in the "
        f"PARITY.md rotation-queue section: {unaccounted}"
    )


def test_bm25_index_probe_equals_inquery(spark):
    """Persisted-then-probed BM25 must be IDENTICAL to the in-query
    scorer: same tokenization, same exact-integer model inputs, same
    fixed-parenthesization contribution, same fold order."""
    import __spark_entry__ as m

    key = lambda r: (r["query_id"], r["rank"], r["doc_id"], r["score_ppm"])  # noqa: E731
    probed = sorted(map(key, m.queries()["bm25_index_probe"](spark, SF).collect()))
    inquery = sorted(map(key, m.queries()["bm25_topk"](spark, SF).collect()))
    assert probed == inquery and len(probed) > 0


def test_bm25_index_append_equals_rebuild(spark):
    """Append-then-probe must equal the standing (one-shot) index's
    probe EXACTLY: the bm25_index_append entry builds postings from
    doc_id%20<16, absorbs the 16..19 slice via append_bm25_index, and
    answers the same three fixed queries — bit-identical to
    bm25_index_probe (and therefore to the in-query scorer)."""
    import __spark_entry__ as m

    key = lambda r: (r["query_id"], r["rank"], r["doc_id"], r["score_ppm"])  # noqa: E731
    appended = sorted(map(key, m.queries()["bm25_index_append"](spark, SF).collect()))
    oneshot = sorted(map(key, m.queries()["bm25_index_probe"](spark, SF).collect()))
    assert appended == oneshot and len(appended) > 0


def test_ann_index_append_equals_frozen_rebuild(spark, tmp_path):
    """append(build(train=B, encode=B), S) must be BYTE-EQUAL to
    build(train=B, encode=B∪S): assignment and encoding are pure
    functions of the frozen model, so the appended codes and storage
    tables match the frozen-model rebuild row-for-row."""
    from pyspark.sql import functions as F

    from warp_spark.catalog import _t
    from warp_spark.pipeline.similarity import (
        append_ivfpq_index,
        persist_ivfpq_index,
    )

    emb = _t(spark, SF, "embeddings").to_df()
    base, slice_ = emb.filter(F.col("vec_id") % 5 != 4), emb.filter(
        F.col("vec_id") % 5 == 4
    )
    p_app, p_full = str(tmp_path / "app"), str(tmp_path / "full")
    persist_ivfpq_index(base, p_app, n_centroids=8, m=8, n_codes=16)
    append_ivfpq_index(spark, p_app, slice_)
    persist_ivfpq_index(
        emb, p_full, n_centroids=8, m=8, n_codes=16, train_df=base
    )
    for sub in ("codes", "storage", "centroids", "codebooks"):
        a = sorted(map(str, spark.read.parquet(f"{p_app}/{sub}").collect()))
        b = sorted(map(str, spark.read.parquet(f"{p_full}/{sub}").collect()))
        assert a == b and len(a) > 0, sub


def test_dedup_index_compact_preserves_content_and_collapses_files(spark):
    """Compaction must be invisible in values and visible in layout:
    after appends grow the bands partitions to multiple files,
    compact_dedup_index returns each bucket to ONE file and the probe
    answer is unchanged row-for-row."""
    import glob as _glob
    import os

    from pyspark.sql import functions as F

    import shutil

    from warp_spark.catalog import (
        _dedup_append_path,
        _ensure_dedup_index_appended,
        _t,
    )
    from warp_spark.pipeline.dedup import compact_dedup_index, dedup_index_probe

    # force a FRESH base+append state: a prior compaction leaves the
    # (content-identical) one-file layout behind, which would void the
    # small-files precondition below
    stale = _dedup_append_path(SF)
    if os.path.exists(stale):
        shutil.rmtree(stale)
    path = _ensure_dedup_index_appended(spark, SF)

    def files_per_bucket():
        counts = {}
        for d in _glob.glob(os.path.join(path, "bands", "bucket=*")):
            counts[d] = len(_glob.glob(os.path.join(d, "*.parquet")))
        return counts

    batch = _t(spark, SF, "documents").to_df().filter(F.col("doc_id") % 20 >= 16)
    key = lambda r: (r["batch_id"], r["dup_of"], r["best_jaccard"])  # noqa: E731
    before_files = files_per_bucket()
    before = sorted(
        map(key, dedup_index_probe(spark, path, batch, threshold=0.5).collect())
    )
    assert any(n > 1 for n in before_files.values())  # appends left small files
    compact_dedup_index(spark, path)
    after_files = files_per_bucket()
    assert after_files and all(n == 1 for n in after_files.values())
    after = sorted(
        map(key, dedup_index_probe(spark, path, batch, threshold=0.5).collect())
    )
    assert after == before and len(after) > 0
    # marker survived the swap (stamp-keyed reuse still works)
    assert os.path.exists(os.path.join(path, "_INDEX_COMPLETE"))


def test_bm25_and_ann_compact_preserve_probe_results(spark):
    """The lexical and vector compaction legs must be invisible in
    values: probing the appended index before and after compaction
    yields identical rows, and the append-grown partitions collapse
    back to one file each."""
    import glob as _glob
    import os
    import shutil

    import __spark_entry__ as m
    from warp_spark.catalog import (
        _ann_append_path,
        _bm25_append_path,
        _ensure_ann_index_appended,
        _ensure_bm25_index_appended,
    )

    # bm25: fresh append state → multi-file buckets → compact → 1 file
    for p in (_bm25_append_path(SF), _ann_append_path(SF)):
        if os.path.exists(p):
            shutil.rmtree(p)
    bpath = _ensure_bm25_index_appended(spark, SF)
    bkey = lambda r: (r["query_id"], r["rank"], r["doc_id"], r["score_ppm"])  # noqa: E731
    before = sorted(map(bkey, m.queries()["bm25_index_append"](spark, SF).collect()))
    multi = [
        d
        for d in _glob.glob(os.path.join(bpath, "postings", "bucket=*"))
        if len(_glob.glob(os.path.join(d, "*.parquet"))) > 1
    ]
    assert multi  # appends left small files
    after = sorted(map(bkey, m.queries()["bm25_index_compact"](spark, SF).collect()))
    assert after == before and len(after) > 0
    assert all(
        len(_glob.glob(os.path.join(d, "*.parquet"))) == 1
        for d in _glob.glob(os.path.join(bpath, "postings", "bucket=*"))
    )

    # ann: compaction must leave the recall contract green and the
    # codes lists single-file (model artifacts byte-unchanged is
    # covered by the append==frozen-rebuild pin)
    apath = _ensure_ann_index_appended(spark, SF)
    rows = m.queries()["ann_index_compact"](spark, SF).collect()
    assert len(rows) == 1 and rows[0]["recall_ge_floor"]
    assert all(
        len(_glob.glob(os.path.join(d, "*.parquet"))) == 1
        for d in _glob.glob(os.path.join(apath, "codes", "centroid_id=*"))
    )


def test_dedup_index_probe_equals_inquery(spark):
    """Persisted-then-probed near-dup must be IDENTICAL to the in-query
    incremental path: same md5-minhash signatures, same band postings
    (corpus-side cap), same exact-Jaccard verify, same min-corpus-id
    reduction."""
    import __spark_entry__ as m

    key = lambda r: (  # noqa: E731
        r["doc_id"],
        r["dup_of"],
        r["best_jaccard"],
        r["is_dup"],
    )
    probed = sorted(map(key, m.queries()["dedup_index_probe"](spark, SF).collect()))
    inquery = sorted(map(key, m.queries()["dedup_incremental"](spark, SF).collect()))
    assert probed == inquery and len(probed) > 0
    assert any(r[3] for r in probed)  # the slice contains real dups


def test_tdigest_probe_reads_only_artifact(spark):
    """The persisted-sketch probe must (a) reproduce the in-query batch
    t-digest entry bit-for-bit — batch, streamed, and persisted-probe
    percentiles share ONE sketch state — and (b) scan ONLY the
    artifact: a lineitem FileScan in the probe plan would mean the
    'quantiles without a source pass' contract is broken."""
    import __spark_entry__ as m
    from warp_spark.catalog import _ensure_tdigest

    _ensure_tdigest(spark, SF)  # artifact fresh → probe takes the pure path
    probe_df = m.queries()["tdigest_probe"](spark, SF)
    key = lambda r: tuple(r.asDict().items())  # noqa: E731
    probed = sorted(map(key, probe_df.collect()))
    batch = sorted(
        map(key, m.queries()["agg_tdigest_quantiles"](spark, SF).collect())
    )
    assert probed == batch and len(probed) > 0
    plan = probe_df._jdf.queryExecution().executedPlan().toString()
    assert "lineitem" not in plan, plan


def test_dedup_index_probe_partition_pruning(spark):
    """A TRICKLE probe (single doc) against the persisted band postings
    must prune: the bands scan's bucket IN (...) lands in
    PartitionFilters — at most bands-per-doc of the 32 bucket
    partitions are listed, unprobed buckets never read (the
    persist_dedup_index layout contract; large probes legitimately
    converge to all buckets, so the plan pin uses the 1-doc shape)."""
    import re

    from pyspark.sql import functions as F

    from warp_spark.catalog import _ensure_dedup_index, _t
    from warp_spark.pipeline.dedup import dedup_index_probe

    path = _ensure_dedup_index(spark, SF)
    one = (
        _t(spark, SF, "documents").to_df().filter(F.col("doc_id") == 17)
    )
    df = dedup_index_probe(spark, path, one, threshold=0.5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [
        s for s in re.findall(r"FileScan parquet[^\n]*", plan) if "/bands" in s
    ]
    assert scans, plan
    assert all(
        "PartitionFilters" in s
        and "bucket" in s.split("PartitionFilters", 1)[1].split("]", 1)[0]
        for s in scans
    ), scans


def test_bm25_index_probe_partition_pruning(spark):
    """The persisted postings must be probed via PARTITION PRUNING: the
    scan's bucket IN (...) filter has to land in PartitionFilters (the
    build_bm25_index layout contract — unprobed term buckets never
    read), not as a post-scan Filter over every bucket."""
    import re

    from warp_spark.catalog import _ensure_bm25_index
    from warp_spark.pipeline.text import bm25_index_probe

    path = _ensure_bm25_index(spark, SF)
    df = bm25_index_probe(spark, path, [(1, ["hash", "join"])], k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [
        s for s in re.findall(r"FileScan parquet[^\n]*", plan) if "/postings" in s
    ]
    assert scans, plan
    assert all(
        "PartitionFilters" in s
        and "bucket" in s.split("PartitionFilters", 1)[1].split("]", 1)[0]
        for s in scans
    ), scans
