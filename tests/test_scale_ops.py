"""Scale-path operators: salted joins / two-phase aggregation must be
result-identical to their plain forms; IVF ANN must return valid,
well-formed neighbor lists with reasonable recall vs exact top-k."""

import pytest
from pyspark.sql import functions as F

from warp_spark.skew import salted_join, two_phase_agg

SF = "/root/testdata/sf0.001"


def norm(rows):
    return sorted((tuple(r) for r in rows), key=str)


def test_salted_join_matches_plain_inner(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey", "l_quantity")
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, on=["l_orderkey"]).collect()
    salted = salted_join(li, orders, on=["l_orderkey"], salt_buckets=8).collect()
    assert norm(salted) == norm(plain)


def test_salted_join_matches_plain_left(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (99, "x")], "k int, v string")
    right = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, w double")
    plain = left.join(right, on=["k"], how="left").collect()
    salted = salted_join(left, right, on=["k"], how="left", salt_buckets=4).collect()
    assert norm(salted) == norm(plain)


def test_two_phase_agg_matches_plain(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    plain = {
        (r["l_returnflag"],): (r["c"], r["s"])
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("l_quantity").alias("s"))
        .collect()
    }
    salted = {
        (r["l_returnflag"],): (r["count"], r["sum_l_quantity"])
        for r in two_phase_agg(
            li, ["l_returnflag"], sums=["l_quantity"], salt_buckets=8
        ).collect()
    }
    assert set(salted) == set(plain)
    for k in plain:
        assert salted[k][0] == plain[k][0]
        assert salted[k][1] == pytest.approx(plain[k][1])


def test_ivf_topk_shape_and_recall(spark):
    from warp_spark.pipeline.similarity import brute_force_topk, ivf_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(queries, emb, k=5)
    approx = ivf_topk(queries, emb, k=5, n_centroids=8, nprobe=4)

    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ap_rows = approx.collect()
    ap = {(r["query_id"], r["neighbor_id"]) for r in ap_rows}
    # well-formed: ≤k rows per query, ranks 1..n contiguous
    by_q = {}
    for r in ap_rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5
    # probing half the lists should recover a solid fraction of the
    # exact top-k (loose bound: recall ≥ 40%)
    assert len(ap & ex) / len(ex) >= 0.4


def test_ivf_assignment_deterministic(spark):
    from warp_spark.pipeline.similarity import ivf_centroids

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = ivf_centroids(emb, n_centroids=4)
    b = ivf_centroids(emb, n_centroids=4)
    assert a == b


def test_canonical_clusters_transitive(spark):
    """A~B, B~C must collapse {A,B,C} to min-id even though (A,C) was
    never a pair; isolated docs stay their own canonical."""
    from warp_spark.pipeline.dedup import canonical_clusters

    docs = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    out = {r["doc_id"]: r for r in canonical_clusters(docs, pairs).collect()}
    assert [out[i]["canonical_id"] for i in range(1, 8)] == [1, 1, 1, 4, 5, 5, 7]
    assert [out[i]["is_dup"] for i in range(1, 8)] == [
        False, True, True, False, False, True, False,
    ]


def test_canonical_clusters_long_chain(spark):
    """Propagation crosses a diameter-9 chain (several iterations)."""
    from warp_spark.pipeline.dedup import canonical_clusters

    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id_a long, id_b long"
    )
    out = canonical_clusters(docs, pairs).collect()
    assert all(r["canonical_id"] == 0 for r in out)


def test_minhash_sig_udf_matches_expression_chain(spark):
    """The Arrow signature UDF must be bit-identical to the JVM
    expression chain (shingles → md5_hash_pair → minhash_from_pairs) —
    the oracle parity of the whole LSH tier rests on this."""
    from pyspark.sql import functions as F

    from warp_spark.pipeline.dedup import (
        md5_hash_pair,
        minhash_from_pairs,
        minhash_sig64_udf,
        shingles,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    jvm = (
        docs.select("doc_id", shingles(F.col("text")).alias("sh"))
        .select("doc_id", F.transform(F.col("sh"), md5_hash_pair).alias("hp"))
        .select("doc_id", minhash_from_pairs(F.col("hp")).alias("sig"))
    )
    py = docs.select("doc_id", minhash_sig64_udf(F.col("text")).alias("sig"))
    jvm_map = {r["doc_id"]: list(r["sig"]) for r in jvm.collect()}
    py_map = {r["doc_id"]: list(r["sig"]) for r in py.collect()}
    assert jvm_map == py_map


@pytest.mark.parametrize("variant", ["median", "medianLow", "medianHigh", "medianPack"])
def test_grouped_median_matches_reducer(spark, variant):
    """The window-path exact median (O(1) memory per task) must equal
    the reducer-tier collect_list median on every group and variant."""
    from pyspark.sql import functions as F

    from warp_spark import Aggregator, Dataset
    from warp_spark.median import grouped_median

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    window_path = {
        r["l_returnflag"]: r["m"]
        for r in grouped_median(li, ["l_returnflag"], "l_quantity", variant, out_col="m").collect()
    }
    reducer_path = {
        r["l_returnflag"]: r["m"]
        for r in Dataset.from_df(li)
        .aggregate(
            {"l_returnflag": F.col("l_returnflag")},
            {"m": Aggregator(F.col("l_quantity"), variant)},
        )
        .collect()
    }
    assert window_path == reducer_path


def test_cosine_near_pairs_blocked_subset(spark):
    """The block_col scale path (score only within a block value) must
    return exactly the unblocked pairs whose two sides share a block —
    a strict, verifiable subset contract."""
    from pyspark.sql import functions as F

    from warp_spark.pipeline.similarity import cosine_near_pairs, lsh_bucket

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    full = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in cosine_near_pairs(emb, 0.4, n_blocks=4).collect()
    }
    bucketed = emb.withColumn("b", lsh_bucket(F.col("embedding"), 4, 64))
    blocked = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in cosine_near_pairs(bucketed, 0.4, block_col="b").collect()
    }
    bucket_of = {r["vec_id"]: r["b"] for r in bucketed.select("vec_id", "b").collect()}
    expected = {
        p: s for p, s in full.items() if bucket_of[p[0]] == bucket_of[p[1]]
    }
    assert blocked == expected
    assert 0 < len(blocked) <= len(full)


def test_star_components_chain_diameter_exceeds_propagation(spark):
    """A 60-node path graph (diameter 59): large-star/small-star must
    collapse it to min-id 0 in O(log^2) rounds; plain propagation at
    max_iter=20 must warn about truncation."""
    import warnings

    from warp_spark.pipeline.dedup import (
        canonical_clusters,
        connected_components_star,
    )

    nodes = spark.range(60).select(F.col("id").alias("doc_id"))
    pairs = (
        spark.range(59)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    )
    star = connected_components_star(nodes, pairs)
    got = {r["doc_id"]: r["canonical_id"] for r in star.collect()}
    assert got == {i: 0 for i in range(60)}

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        trunc = canonical_clusters(nodes, pairs, max_iter=5).collect()
        assert any("max_iter" in str(x.message) for x in w)
    # truncated propagation must NOT have finished the chain
    assert {r["canonical_id"] for r in trunc} != {0}


def test_star_components_match_propagation_on_real_pairs(spark):
    """Differential: star vs propagation agree label-for-label on the
    actual near-dup pair graph (low diameter, both converge)."""
    from warp_spark.pipeline.dedup import (
        canonical_clusters,
        connected_components_star,
        minhash_lsh_candidates,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = minhash_lsh_candidates(docs)
    a = {r["doc_id"]: r["canonical_id"] for r in canonical_clusters(docs, pairs).collect()}
    b = {
        r["doc_id"]: r["canonical_id"]
        for r in connected_components_star(docs, pairs).collect()
    }
    assert a == b


def test_lsh_multi_table_recall_amplification(spark):
    """OR-amplification: L=16 tables must strictly beat one table's
    recall, and the vectorized bucket kernel must equal the expression
    form bit-for-bit (pinned separately in the kernel parity assert)."""
    from warp_spark.pipeline.similarity import brute_force_topk, lsh_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    ex = {(r["query_id"], r["neighbor_id"]) for r in brute_force_topk(q, emb, k=5).collect()}
    one = {(r["query_id"], r["neighbor_id"])
           for r in lsh_topk(q, emb, k=5, num_planes=4, num_tables=1).collect()}
    many = {(r["query_id"], r["neighbor_id"])
            for r in lsh_topk(q, emb, k=5, num_planes=4, num_tables=16).collect()}
    assert len(many & ex) / len(ex) >= 0.6
    assert len(many & ex) > len(one & ex)


def test_lsh_bucket_kernel_parity(spark):
    """The Arrow matmul bucket kernel and the Column-expression form
    must produce identical bucket strings (same planes, same sign
    convention, same bit order)."""
    from warp_spark.pipeline.similarity import _lsh_buckets_all_tables, lsh_bucket

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(100)
    expr = {r["vec_id"]: r["b"] for r in emb.select(
        "vec_id", lsh_bucket(F.col("embedding"), 4, 64, seed=0).alias("b")).collect()}
    vec = {r["vec_id"]: r["bs"][0] for r in emb.select(
        "vec_id", _lsh_buckets_all_tables(F.col("embedding"), 4, 64, 2).alias("bs")).collect()}
    assert expr == vec


def test_ngram_contamination_planted_overlap(spark):
    """Decontamination semantics: a train doc sharing a 13-token run
    with a benchmark doc is flagged with the right distinct-gram counts;
    disjoint docs and sub-n overlaps are not flagged; docs shorter than
    n grams contribute nothing (and survive keep_clean with total 0)."""
    from warp_spark.pipeline.text import ngram_contamination

    leak = "one two three four five six seven eight nine ten eleven twelve thirteen"
    bench = spark.createDataFrame(
        [(100, f"benchmark intro {leak} benchmark outro")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, f"training prefix {leak} training suffix"),  # contaminated
            (2, "totally unrelated words with no shared run at all "
                "padding padding padding padding padding padding"),
            (3, "one two three four five six seven"),  # sub-n overlap only
            (4, "short doc"),  # < n tokens
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in ngram_contamination(train, bench, n=13).collect()}
    assert set(got) == {1}
    # "training prefix <13 tokens> training suffix" = 17 tokens -> 5 grams,
    # of which exactly one (the leak itself) appears in the benchmark
    assert got[1]["total_ngrams"] == 5
    assert got[1]["matched_ngrams"] == 1
    assert got[1]["overlap_frac"] == pytest.approx(0.2)

    everyone = {r["doc_id"]: r for r in
                ngram_contamination(train, bench, n=13, keep_clean=True).collect()}
    assert set(everyone) == {1, 2, 3, 4}
    assert everyone[4]["total_ngrams"] == 0 and everyone[4]["matched_ngrams"] == 0


def test_ngram_contamination_repeated_grams_count_once(spark):
    """Distinct-gram semantics: a leaked n-gram repeated inside one
    train doc still counts once in both matched and total."""
    from warp_spark.pipeline.text import ngram_contamination

    leak = "a b c d e f g h i j k l m"
    bench = spark.createDataFrame([(0, leak)], "doc_id long, text string")
    train = spark.createDataFrame(
        [(1, f"{leak} {leak}")], "doc_id long, text string"
    )
    got = ngram_contamination(train, bench, n=13).collect()
    assert len(got) == 1
    # 26 tokens -> 14 windows, but only 13 DISTINCT grams (the leak
    # window appears at both offset 1 and offset 14)
    assert got[0]["total_ngrams"] == 13
    assert got[0]["matched_ngrams"] == 1


def test_winnow_fingerprints_guarantee(spark):
    """Winnowing guarantee: docs sharing a substring of length >=
    k+window-1 share a fingerprint; identical docs share all; disjoint
    alphabets share none."""
    from warp_spark.pipeline.text import rolling_fingerprints

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "completely different text with zero overlapping window here"),
        (4, "XXXX the quick brown fox jumps over the lazy YYYY"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: set(r["fps"]) for r in df.select(
        "doc_id", rolling_fingerprints(F.col("text")).alias("fps")).collect()}
    assert got[1] == got[2] and len(got[1]) > 0
    assert got[1] & got[4]          # long shared substring → shared print
    assert not (got[1] & got[3])


def test_winnow_overlap_candidates(spark):
    from warp_spark.pipeline.text import winnow_overlap_candidates

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (3, "one two three four five six seven eight nine ten eleven"),
        (4, "prefix junk alpha beta gamma delta epsilon zeta suffix junk"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]): r["shared_fingerprints"]
             for r in winnow_overlap_candidates(df, min_shared=2).collect()}
    assert (1, 2) in pairs
    assert (1, 4) in pairs or (2, 4) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


@pytest.mark.parametrize("seed", [1, 7, 13])
def test_star_matches_propagation_random_graphs(spark, seed):
    """Differential on seeded random graphs (mixed component sizes,
    self-contained islands, a long chain): star == propagation == the
    obvious union-find ground truth."""
    import random

    rng = random.Random(seed)
    n = 40
    edges = {(a, b) for a, b in (sorted(rng.sample(range(n), 2)) for _ in range(25))}
    edges |= {(i, i + 1) for i in range(30, 38)}  # a chain segment
    # union-find ground truth
    parent = list(range(n))
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edges:
        parent[find(a)] = find(b)
    truth = {i: min(j for j in range(n) if find(j) == find(i)) for i in range(n)}

    from warp_spark.pipeline.dedup import canonical_clusters, connected_components_star

    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(sorted(edges), "id_a long, id_b long")
    star = {r["doc_id"]: r["canonical_id"]
            for r in connected_components_star(nodes, pairs).collect()}
    prop = {r["doc_id"]: r["canonical_id"]
            for r in canonical_clusters(nodes, pairs, max_iter=40).collect()}
    assert star == truth
    assert prop == truth


def test_lsh_near_pairs_subset_of_exact(spark):
    """Approximate corpus×corpus similarity join: every emitted pair
    appears in the exact finder with the SAME sim, and recall over the
    exact pair set is substantial at L=8."""
    from warp_spark.pipeline.similarity import cosine_near_pairs, lsh_near_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = {(r["id_a"], r["id_b"]): r["sim"]
             for r in cosine_near_pairs(emb, 0.4, n_blocks=4).collect()}
    approx = {(r["id_a"], r["id_b"]): r["sim"]
              for r in lsh_near_pairs(emb, 0.4, num_planes=4, num_tables=8).collect()}
    assert set(approx) <= set(exact)
    for p, s in approx.items():
        assert s == exact[p]
    assert len(approx) / len(exact) >= 0.5  # recall floor at L=8


def test_lsh_multi_probe_beats_single_probe(spark):
    """Multi-probe (1-bit-flip neighbor buckets) must strictly improve
    recall over the same tables unprobed, and clear a 0.8 floor."""
    from warp_spark.pipeline.similarity import brute_force_topk, lsh_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    ex = {(r["query_id"], r["neighbor_id"]) for r in brute_force_topk(q, emb, k=5).collect()}
    plain = {(r["query_id"], r["neighbor_id"]) for r in lsh_topk(
        q, emb, k=5, num_planes=4, num_tables=8).collect()}
    probed = {(r["query_id"], r["neighbor_id"]) for r in lsh_topk(
        q, emb, k=5, num_planes=4, num_tables=8, multi_probe=True).collect()}
    assert len(probed & ex) > len(plain & ex)
    assert len(probed & ex) / len(ex) >= 0.8


def test_lsh_near_pairs_multi_probe_recall(spark):
    """Probing lifts pair recall while preserving the subset-of-exact
    contract."""
    from warp_spark.pipeline.similarity import cosine_near_pairs, lsh_near_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = {(r["id_a"], r["id_b"]) for r in cosine_near_pairs(emb, 0.4, n_blocks=4).collect()}
    plain = {(r["id_a"], r["id_b"]) for r in lsh_near_pairs(
        emb, 0.4, num_planes=4, num_tables=8).collect()}
    probed = {(r["id_a"], r["id_b"]) for r in lsh_near_pairs(
        emb, 0.4, num_planes=4, num_tables=8, multi_probe=True).collect()}
    assert probed <= exact
    assert len(probed) >= len(plain)
    assert len(probed) / len(exact) >= 0.8


def test_repetition_features(spark):
    from warp_spark.pipeline.text import repetition_features

    rows = [
        (1, "spam spam spam spam"),                  # one token, fully repeated
        (2, "all words here are fully distinct"),    # no repetition
        (3, "one"),                                  # single token → no bigrams
        (4, "ab cd ab cd ab cd"),                    # alternating pair
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in df.withColumns(
        repetition_features(F.col("text"))).collect()}
    assert got[1]["top_token_frac"] == 1.0
    assert got[1]["dup_bigram_frac"] == pytest.approx(1 - 1 / 3, abs=1e-6)
    assert got[2]["top_token_frac"] == pytest.approx(1 / 6, abs=1e-6)
    assert got[2]["dup_bigram_frac"] == 0.0
    assert got[3]["top_token_frac"] == 1.0
    assert got[3]["dup_bigram_frac"] == 0.0      # no bigrams → defined as 0
    # "ab cd"x3 + "cd ab"x2 → 5 bigrams, 2 distinct
    assert got[4]["top_token_frac"] == pytest.approx(3 / 6, abs=1e-6)
    assert got[4]["dup_bigram_frac"] == pytest.approx(1 - 2 / 5, abs=1e-6)


def test_scrub_pii(spark):
    from warp_spark.pipeline.text import scrub_pii

    rows = [
        (1, "mail me at jane.doe+spam@example.co.uk or call +1 (555) 123-4567."),
        (2, "server 192.168.001.042 answered; backup at 10.0.0.7 did not"),
        (3, "no pii here, just words and the number 42"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in df.withColumns(scrub_pii(F.col("text"))).collect()}
    assert got[1]["n_email"] == 1 and got[1]["n_phone"] == 1
    assert "<EMAIL>" in got[1]["scrubbed"] and "<PHONE>" in got[1]["scrubbed"]
    assert "jane" not in got[1]["scrubbed"] and "555" not in got[1]["scrubbed"]
    assert got[2]["n_ipv4"] == 2 and got[2]["scrubbed"].count("<IP>") == 2
    # the short standalone number must survive — not phone-shaped
    assert got[3]["n_email"] == got[3]["n_ipv4"] == got[3]["n_phone"] == 0
    assert got[3]["scrubbed"] == rows[2][1]


def test_stratified_sample(spark):
    from warp_spark.sampling import stratified_sample

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    s = stratified_sample(orders, "o_orderpriority", 10, seed=3)
    per = {r["o_orderpriority"]: r["n"] for r in
           s.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(per) == {r["o_orderpriority"] for r in
                        orders.select("o_orderpriority").distinct().collect()}
    assert all(v == 10 for v in per.values())      # every group is larger than 10 here
    # no fabricated rows, no duplicates
    keys = [r["o_orderkey"] for r in s.select("o_orderkey").collect()]
    assert len(keys) == len(set(keys))
    assert s.join(orders.select("o_orderkey"), "o_orderkey", "left_anti").count() == 0
    # a group smaller than n is kept whole
    tiny = stratified_sample(orders.limit(3), "o_orderpriority", 10, seed=3)
    assert tiny.count() == 3
    # helper columns must not leak
    assert set(s.columns) == set(orders.columns)


def test_stratified_sample_threshold_prepass(spark):
    from warp_spark.sampling import stratified_sample

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    s = stratified_sample(orders, "o_orderpriority", 5, seed=3, threshold=0.5)
    per = [r["n"] for r in s.groupBy("o_orderpriority")
           .agg(F.count(F.lit(1)).alias("n")).collect()]
    assert all(v == 5 for v in per)   # thinned groups still fill n


def test_pq_codes_shape_and_determinism(spark):
    from warp_spark.pipeline.similarity import pq_codebooks, pq_encode

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cb = pq_codebooks(emb, m=16, n_codes=32)
    assert len(cb) == 16 and all(len(b) <= 32 for b in cb)
    codes = emb.select("vec_id", pq_encode(F.col("embedding"), cb).alias("c")).collect()
    assert all(len(r["c"]) == 16 for r in codes)
    assert all(0 <= v < 32 for r in codes for v in r["c"])
    # same codebooks → same codes (training and encoding are RNG-free)
    cb2 = pq_codebooks(emb, m=16, n_codes=32)
    assert cb == cb2


def test_pq_topk_recall_and_rerank(spark):
    from warp_spark.pipeline.similarity import brute_force_topk, pq_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    ex = {(r["query_id"], r["neighbor_id"]) for r in brute_force_topk(q, emb, k=5).collect()}
    adc = {(r["query_id"], r["neighbor_id"]) for r in pq_topk(q, emb, k=5).collect()}
    rr = {(r["query_id"], r["neighbor_id"]) for r in pq_topk(q, emb, k=5, rerank=50).collect()}
    assert len(adc & ex) / len(ex) >= 0.3        # lossy codes still rank
    assert len(rr & ex) / len(ex) >= 0.8         # exact re-rank recovers
    assert len(rr & ex) >= len(adc & ex)
    got = pq_topk(q, emb, k=5, rerank=50).collect()
    assert all(1 <= r["rank"] <= 5 for r in got)
    assert all(r["query_id"] != r["neighbor_id"] for r in got)


def test_char_entropy_features(spark):
    import math

    from warp_spark.pipeline.text import char_entropy_features

    rows = [
        (1, "aaaa"),          # single symbol → 0 bits
        (2, "abab"),          # two equiprobable symbols → 1 bit
        (3, "abcd"),          # four equiprobable symbols → 2 bits
        (4, "aab"),           # 2/3,1/3 split
        (5, "AaBb"),          # case-folds to "aabb" → 1 bit
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", *[c.alias(k) for k, c in char_entropy_features(F.col("text")).items()]
        ).collect()
    }
    assert got[1]["char_entropy"] == 0.0
    assert got[2]["char_entropy"] == pytest.approx(1.0, abs=1e-9)
    assert got[3]["char_entropy"] == pytest.approx(2.0, abs=1e-9)
    h = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert got[4]["char_entropy"] == pytest.approx(h, abs=1e-6)
    assert got[5]["char_entropy"] == pytest.approx(1.0, abs=1e-9)
    assert got[3]["n_chars"] == 4 and got[3]["n_distinct_chars"] == 4
    assert got[5]["n_distinct_chars"] == 2


def test_incremental_dedup_batch_vs_corpus_only(spark):
    from warp_spark.pipeline.dedup import incremental_dedup

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away home"
    )
    near = base + " tonight"
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely different corpus text about spark plans")],
        "doc_id long, text string",
    )
    twin = "identical twin text only inside the new batch slice here"
    batch = spark.createDataFrame(
        [(21, base), (22, "nothing like anything else at all"), (23, near),
         (24, twin), (25, twin)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in incremental_dedup(corpus, batch).collect()}
    assert set(got) == {21, 22, 23, 24, 25}
    assert got[21]["is_dup"] and got[21]["dup_of"] == 1
    assert got[21]["best_jaccard"] == 1.0
    assert got[23]["is_dup"] and got[23]["dup_of"] == 1
    assert not got[22]["is_dup"] and got[22]["dup_of"] is None
    # batch×batch pairs must never be generated: the twins match each
    # other but nothing in the corpus, so both stay kept
    assert not got[24]["is_dup"] and not got[25]["is_dup"]


def test_cluster_representatives_argmax(spark):
    from warp_spark.pipeline.dedup import cluster_representatives

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20)],
        "doc_id long, canonical_id long",
    )
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (10, 0.5), (11, 0.4), (20, 0.1)],
        "doc_id long, quality_score double",
    )
    got = {r["doc_id"]: r for r in cluster_representatives(clusters, scores).collect()}
    # cluster 1: 2 and 3 tie at 0.9 → min id 2 wins over earlier-id 1 (0.2)
    assert got[1]["rep_id"] == 2 and not got[1]["keep"]
    assert got[2]["keep"] and got[3]["rep_id"] == 2
    assert got[10]["keep"] and got[11]["rep_id"] == 10
    assert got[20]["keep"]  # singleton keeps itself


def test_tokenize_vocab_roundtrip(spark):
    from warp_spark.pipeline.text import build_vocab, tokenize_ids

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog, the dog!"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    vocab = build_vocab(docs, vocab_size=4)
    v = dict(vocab)
    # "the" is the most frequent token → id 1; ids are 1..V dense
    assert v["the"] == 1
    assert sorted(v.values()) == [1, 2, 3, 4]
    got = {r["doc_id"]: r for r in tokenize_ids(docs, vocab).collect()}
    # every in-vocab token maps to its id; OOV → 0
    assert got[1]["token_ids"][0] == 1 and got[1]["n_tokens"] == 6
    assert got[1]["n_oov"] == got[1]["token_ids"].count(0)
    assert got[2]["token_ids"].count(1) == 2  # two "the"
    assert got[3]["token_ids"] == [] and got[3]["n_tokens"] == 0 and got[3]["n_oov"] == 0
    # deterministic: rebuilt vocab is identical
    assert build_vocab(docs, vocab_size=4) == vocab


def test_rebalance_weights_and_sample(spark):
    from warp_spark.sampling import rebalance_sample, rebalance_weights

    rows = [(i, "a") for i in range(100)] + [(i + 100, "b") for i in range(50)] + [
        (i + 150, "c") for i in range(25)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    plan = {r["source"]: r for r in rebalance_weights(df, "source").collect()}
    # binding group c keeps everything; others downsample to 25
    assert plan["c"]["sampling_rate"] == 1.0 and plan["c"]["expected_rows"] == 25
    assert plan["a"]["expected_rows"] == 25 and plan["b"]["expected_rows"] == 25
    assert plan["a"]["sampling_rate"] == pytest.approx(0.25, abs=1e-6)
    assert plan["a"]["share"] == pytest.approx(100 / 175, abs=1e-6)
    assert plan["a"]["target_share"] == pytest.approx(1 / 3, abs=1e-6)
    sampled = rebalance_sample(df, "source", seed=7)
    got = {r["source"]: r["n"] for r in sampled.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert got == {"a": 25, "b": 25, "c": 25}
    # explicit target: 80/10/10 → binding is c (25 / 0.1 = 250 scale)
    plan2 = {r["source"]: r for r in rebalance_weights(
        df, "source", {"a": 0.8, "b": 0.1, "c": 0.1}).collect()}
    assert plan2["b"]["expected_rows"] == 12  # floor(0.1 * 125)
    assert plan2["a"]["expected_rows"] == 100  # a binds: 100/0.8 = 125


def test_source_token_kl_properties(spark):
    import math

    from warp_spark.pipeline.text import source_token_kl

    # two identical slices → KL 0 for both; one skewed slice → KL > 0
    rows = (
        [(i, "a", "x y z") for i in range(10)]
        + [(i + 10, "b", "x y z") for i in range(10)]
        + [(i + 20, "c", "x x x x") for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["source"]: r for r in source_token_kl(df, vocab_size=8).collect()}
    assert got["a"]["kl_bits"] == got["b"]["kl_bits"]
    assert got["c"]["kl_bits"] > got["a"]["kl_bits"] >= 0.0
    # hand-check c: p = {x:1}; q(x) = (10+10+40)/100 = 0.6 → KL = log2(1/0.6)
    assert got["c"]["kl_bits"] == pytest.approx(math.log2(100 / 60), abs=1e-6)
    assert got["c"]["n_tokens_in_vocab"] == 40


def test_exact_corr_matrix_known_values(spark):
    import math

    from pyspark.sql import functions as F

    from warp_spark.stats import exact_corr_matrix

    # y = 2x exactly → corr 1; z anti-correlated with x → corr -1;
    # w constant → undefined (NULL)
    rows = [(float(i), 2.0 * i, float(10 - i), 5.0) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "x double, y double, z double, w double")
    got = {
        (r["var_a"], r["var_b"]): r["corr"]
        for r in exact_corr_matrix(
            df, {k: (F.col(k), 100) for k in ("x", "y", "z", "w")}
        ).collect()
    }
    assert got[("x", "y")] == 1.0
    assert got[("x", "z")] == -1.0
    assert got[("x", "w")] is None and got[("y", "w")] is None
    assert got[("y", "z")] == -1.0
    # cross-check a non-trivial pair against numpy on the same data
    import numpy as np
    rnd = [(1.0, 4.0), (2.0, 3.0), (3.0, 8.0), (4.0, 6.0), (5.0, 5.0)]
    df2 = spark.createDataFrame(rnd, "a double, b double")
    got2 = exact_corr_matrix(df2, {"a": (F.col("a"), 1), "b": (F.col("b"), 1)}).collect()[0]
    a = np.array([r[0] for r in rnd]); b = np.array([r[1] for r in rnd])
    expected = np.corrcoef(a, b)[0, 1]
    assert math.isclose(got2["corr"], expected, abs_tol=1e-6)


def test_exact_corr_matrix_overflow_guard_fires(spark):
    """The decimal(38,0) headroom bound (stats.py docstring:
    2·log10(n) + 2d ≤ 38) must FAIL LOUDLY, not emit NULL corr, when a
    moment product overflows. Values near 10^18 at scale 100 make
    Σx·Σy ≈ 10^40 > 10^38 with just a few rows. Under ANSI mode (the
    Spark 4 default) the overflow raises NUMERIC_VALUE_OUT_OF_RANGE at
    the aggregate itself; under legacy non-ANSI configs the product
    NULLs silently and the assert_true guard in exact_corr_matrix is
    what trips — either way the job dies with a diagnosable error
    instead of returning NULL correlations."""
    import pytest
    from pyspark.sql import functions as F

    from warp_spark.stats import exact_corr_matrix

    big = 9.0e17  # scale 100 → integer units ~9e19, products ~8e39 > 1e38
    rows = [(big + i, big - i) for i in range(4)]
    df = spark.createDataFrame(rows, "x double, y double")
    bad = exact_corr_matrix(df, {"x": (F.col("x"), 100), "y": (F.col("y"), 100)})
    with pytest.raises(Exception) as exc:
        bad.collect()
    # Match the Spark ERROR CLASS, not free-text (message wording and
    # locale vary across Spark versions); the non-ANSI fallback is OUR
    # OWN assert_true guard message, which is stable because we wrote it.
    cond = None
    for getter in ("getCondition", "getErrorClass"):
        g = getattr(exc.value, getter, None)
        if callable(g):
            try:
                cond = g()
            except Exception:
                cond = None
            if cond:
                break
    assert (
        (cond or "").startswith("NUMERIC_VALUE_OUT_OF_RANGE")  # ANSI raise
        or "overflow" in str(exc.value)  # non-ANSI: our guard message
    ), f"unexpected exception (class={cond!r}): {exc.value}"

    # and the SAFE side of the bound still returns real numbers (d=9
    # digits of integer magnitude, well within 2·log10(n)+2d ≤ 38)
    ok_rows = [(1.0e7 + i, 2.0e7 - i) for i in range(4)]
    ok = exact_corr_matrix(
        spark.createDataFrame(ok_rows, "x double, y double"),
        {"x": (F.col("x"), 100), "y": (F.col("y"), 100)},
    ).collect()
    assert ok[0]["corr"] is not None


def test_spherical_kmeans_converges_and_deterministic(spark):
    from warp_spark.pipeline.similarity import spherical_kmeans

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a1, c1, obj1 = spherical_kmeans(emb, k=4, iters=3)
    # objective improves (or holds) every iteration
    assert all(b >= a - 1e-9 for a, b in zip(obj1, obj1[1:]))
    rows = a1.collect()
    assert len(rows) == emb.count()
    assert {r["cluster"] for r in rows} <= set(range(4))
    assert all(-1.000001 <= r["sim"] <= 1.000001 for r in rows)
    # deterministic end-to-end: same init, same assignments
    a2, c2, obj2 = spherical_kmeans(emb, k=4, iters=3)
    assert obj1 == obj2
    assert {r["vec_id"]: r["cluster"] for r in rows} == {
        r["vec_id"]: r["cluster"] for r in a2.collect()
    }


def test_containment_catches_nested_doc(spark):
    from warp_spark.pipeline.dedup import containment_pairs

    long = " ".join(f"w{i}" for i in range(40))
    short = " ".join(f"w{i}" for i in range(10, 22))  # 12 tokens nested in long
    docs = spark.createDataFrame(
        [(1, long), (2, short), (3, "totally unrelated words entirely here")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    got = containment_pairs(docs, pairs, threshold=0.8).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    # the SHORT doc (b) is contained in the long one
    assert r["direction"] == "b_in_a"
    assert r["containment_b"] == 1.0 and r["containment_a"] < 0.5


def test_bigram_lm_score_ranks_repetition_above_noise(spark):
    """A corpus-typical doc must outscore a gibberish doc under the
    corpus-trained bigram model; short docs get NULL (no bigrams)."""
    from warp_spark.pipeline.text import bigram_lm_scores

    common = "the cat sat on the mat and the cat ran"
    rows = [(i, common) for i in range(8)] + [
        (100, "zq xv qj vx zz qq jx"),  # gibberish: unseen bigrams
        (101, "single"),                # no bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_lm_scores(df, vocab_size=32).collect()}
    assert got[0]["avg_log2_prob"] > got[100]["avg_log2_prob"]
    assert got[101]["n_bigrams"] == 0 and got[101]["avg_log2_prob"] is None
    assert got[0]["n_bigrams"] == 9
    # probabilities: every avg log2 prob is negative
    assert got[0]["avg_log2_prob"] < 0


# ---------------------------------------------------------------------------
# round-4 additions: bloom decontamination, int8 quantization, BPE
# ---------------------------------------------------------------------------

def test_bloom_filter_flags_superset_of_exact(spark):
    """The bloom flag set must contain every exactly-contaminated doc
    (no false negatives, ever) and the filter artifact must be the
    documented constant size."""
    from pyspark.sql import functions as F

    from warp_spark.pipeline.text import (
        bloom_contamination,
        ngram_contamination,
        train_bloom_filter,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    words = train_bloom_filter(bench)
    assert len(words) == 65536 // 64
    flagged = {
        r["doc_id"]
        for r in bloom_contamination(train, words).filter("bloom_contaminated").collect()
    }
    exact = {r["doc_id"] for r in ngram_contamination(train, bench, n=13).collect()}
    assert exact <= flagged


def test_bloom_probe_plan_is_map_side(spark):
    """Probing must be join-free and shuffle-free: the filter is a
    literal in the closure."""
    from pyspark.sql import functions as F

    from warp_spark.pipeline.text import bloom_contamination, train_bloom_filter

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    words = train_bloom_filter(docs.filter(F.col("doc_id") % 10 == 0))
    plan = (
        bloom_contamination(docs, words)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_int8_quantize_bounds_and_scale(spark):
    from pyspark.sql import functions as F

    from warp_spark.pipeline.similarity import int8_quantize

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = int8_quantize(emb)
    stats = q.select(
        F.min(F.array_min("q")).alias("lo"), F.max(F.array_max("q")).alias("hi")
    ).first()
    # floor(x*scale + 0.5) with scale = 127/max|x| stays in [-127, 128)
    assert stats["lo"] >= -127 and stats["hi"] <= 127
    # every vector's max-magnitude element quantizes to ±127
    hit = q.filter(
        (F.array_max("q") == 127) | (F.array_min("q") == -127)
    ).count()
    assert hit == q.count()


def test_quantized_topk_tracks_float_topk(spark):
    """int8 ranking is approximate vs float cosine, but at 8-bit
    resolution the top-1 neighbor should agree for most queries."""
    from pyspark.sql import functions as F

    from warp_spark.pipeline.similarity import brute_force_topk, quantized_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    qt = quantized_topk(q, emb, k=1).select("query_id", "neighbor_id")
    ft = brute_force_topk(q, emb, k=1).select("query_id", "neighbor_id")
    agree = qt.join(ft, ["query_id", "neighbor_id"]).count()
    assert agree >= 8  # of 10 queries


def test_bpe_train_monotone_counts_and_applies(spark):
    """Merge counts must be non-increasing (each argmax is over a
    corpus with one more merge applied) and every merged symbol must be
    the concatenation of its parts."""
    from warp_spark.pipeline.text import bpe_train

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = bpe_train(docs, n_merges=5)
    assert len(merges) == 5
    counts = [c for _, _, _, c in merges]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    for l, r, m, _ in merges:
        assert m == l + r and " " not in m


def test_bpe_double_space_encoding_merges_runs(spark):
    """The a-b-a-b overlap case: both occurrences must merge in one
    replace pass (the single-space encoding would miss the second)."""
    from pyspark.sql import functions as F

    from warp_spark.pipeline.text import bpe_train

    df = spark.createDataFrame([("abab abab abab",)], "text string")
    merges = bpe_train(df, n_merges=2)
    # first merge is (a, b) -> ab with weighted count 2 pairs x 3 words
    assert merges[0][:3] == ("a", "b", "ab")
    assert merges[0][3] == 6
    # second merge sees BOTH 'ab' symbols adjacent in every word
    assert merges[1][:3] == ("ab", "ab", "abab")
    assert merges[1][3] == 3


def test_rebalance_weights_raises_on_missing_group(spark):
    """ADVICE r3: an explicit share plan missing an observed group must
    fail loudly, not silently drop the group."""
    import pytest as _pytest

    from warp_spark.sampling import rebalance_weights

    df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "src string, x int"
    )
    with _pytest.raises(ValueError, match="missing observed src groups.*'c'"):
        rebalance_weights(df, "src", {"a": 0.5, "b": 0.5}).collect()
    # a 0.0 share is the explicit, visible way to drop a group
    rows = rebalance_weights(df, "src", {"a": 0.5, "b": 0.5, "c": 0.0}).collect()
    assert {r["src"]: r["expected_rows"] for r in rows}["c"] == 0


def test_ewma_accepts_non_long_id(spark):
    """ADVICE r3: the accumulator id field derives from the input
    schema — string event ids must analyze and fold correctly."""
    from warp_spark.streaming.windows import ewma

    df = spark.createDataFrame(
        [("k", "e1", 1.0, "2024-01-01 00:00:00"),
         ("k", "e2", 3.0, "2024-01-01 01:00:00")],
        "key string, event_id string, value double, ts string",
    ).selectExpr("key", "event_id", "value", "CAST(ts AS TIMESTAMP) ts")
    rows = {r["event_id"]: r["ewma"] for r in
            ewma(df, "ts", "key", "value", id_col="event_id").collect()}
    assert rows["e1"] == 1.0
    assert abs(rows["e2"] - (0.3 * 3.0 + 0.7 * 1.0)) < 1e-12


def test_exact_skew_kurtosis_matches_numpy(spark):
    """Two-pass centered moments must agree with the direct numpy
    population skewness/kurtosis on integer data."""
    import numpy as np

    from warp_spark.stats import exact_skew_kurtosis

    vals = [1, 1, 2, 3, 5, 8, 13, 21, 34, 55]
    df = spark.createDataFrame([("g", float(v)) for v in vals], "g string, v double")
    row = exact_skew_kurtosis(df, "g", "v", scale=1).collect()[0]
    x = np.array(vals, dtype=np.float64)
    mu = x.mean()
    m2, m3, m4 = ((x - mu) ** 2).mean(), ((x - mu) ** 3).mean(), ((x - mu) ** 4).mean()
    assert abs(row["skewness"] - m3 / m2**1.5) < 1e-9
    assert abs(row["kurtosis"] - (m4 / m2**2 - 3.0)) < 1e-9


def test_temperature_weights_t2_properties(spark):
    """T=2 weights: sqrt-proportional, sum to 1, tail groups upweighted
    relative to their natural share."""
    from pyspark.sql import functions as F

    from warp_spark.sampling import temperature_weights

    df = spark.range(0, 1100).select(
        F.when(F.col("id") < 1000, "big").otherwise("small").alias("src")
    )
    rows = {r["src"]: r for r in temperature_weights(df, "src").collect()}
    assert abs(sum(r["temp_weight"] for r in rows.values()) - 1.0) < 1e-12
    # small group: natural share ~0.09, temperature share ~0.24
    assert rows["small"]["temp_weight"] > rows["small"]["share"]
    assert rows["big"]["temp_weight"] < rows["big"]["share"]


def test_prefix_filter_join_is_exact_vs_naive(spark):
    """The prefix-filter similarity join must find EXACTLY the pairs a
    naive all-pairs Jaccard finds — completeness is the whole point vs
    LSH."""
    from pyspark.sql import functions as F

    from warp_spark.pipeline.dedup import prefix_filter_jaccard_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    t = 0.9
    got = {
        (r["id_a"], r["id_b"])
        for r in prefix_filter_jaccard_pairs(docs, threshold=t).collect()
    }
    toks = F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    tk = docs.select(F.col("doc_id"), toks.alias("tk"))
    naive = (
        tk.alias("a").crossJoin(tk.alias("b"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .withColumn(
            "j",
            F.size(F.array_intersect("a.tk", "b.tk")).cast("double")
            / F.size(F.array_union("a.tk", "b.tk")),
        )
        .filter(F.col("j") >= t)
    )
    want = {(r["a.doc_id"] if "a.doc_id" in r else r[0], r[1])
            for r in naive.select(F.col("a.doc_id"), F.col("b.doc_id")).collect()}
    assert got == want
    assert len(got) > 0  # non-degenerate corpus slice


def test_bottomk_sample_deterministic_and_mergeable(spark):
    """Bottom-k is RNG-free: same rows every run, and the bottom-k of a
    union equals the bottom-k of the per-shard bottom-k's (the property
    that lets executors keep only k candidates each)."""
    from warp_spark.sampling import bottomk_sample

    df = spark.range(0, 500).withColumnRenamed("id", "k")
    a = sorted(r["k"] for r in bottomk_sample(df, "k", 20).collect())
    b = sorted(r["k"] for r in bottomk_sample(df, "k", 20).collect())
    assert a == b and len(a) == 20
    lo = df.where("k < 250")
    hi = df.where("k >= 250")
    merged = bottomk_sample(
        bottomk_sample(lo, "k", 20).unionByName(bottomk_sample(hi, "k", 20)),
        "k",
        20,
    )
    assert sorted(r["k"] for r in merged.collect()) == a


def test_bottomk_sample_per_group(spark):
    from pyspark.sql import functions as F

    from warp_spark.sampling import bottomk_sample

    df = spark.range(0, 300).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("g")
    )
    out = bottomk_sample(df, "k", 10, group_col="g")
    per = {r["g"]: r["n"] for r in out.groupBy("g").count().withColumnRenamed("count", "n").collect()}
    assert per == {0: 10, 1: 10, 2: 10}


def test_kmv_distinct_estimate_and_exact_path(spark):
    """Small cardinality (< k) reports the exact distinct-hash count;
    large cardinality estimates within the sketch's error envelope."""
    from pyspark.sql import functions as F

    from warp_spark.sampling import kmv_distinct

    small = spark.range(0, 1000).select((F.col("id") % 50).alias("v"))
    row = kmv_distinct(small, "v", k=256).collect()[0]
    assert row["n_hashes"] == 50 and row["est_distinct"] == 50.0

    big = spark.range(0, 20000).select(F.col("id").alias("v"))
    row = kmv_distinct(big, "v", k=256).collect()[0]
    # rel std err ≈ 1/sqrt(k-2) ≈ 6.3%; 4σ envelope
    assert abs(row["est_distinct"] - 20000) / 20000 < 0.25
    assert row["n_hashes"] == 20000


def test_prefix_filter_shingle_mode_is_exact_vs_naive(spark):
    """Shingle-element mode: exactly the pairs naive all-pairs shingle
    Jaccard finds — the exact-complete ground truth for the set metric
    MinHash+LSH approximates."""
    from pyspark.sql import functions as F

    from warp_spark.pipeline.dedup import prefix_filter_jaccard_pairs, shingles

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    t = 0.5
    got = {
        (r["id_a"], r["id_b"])
        for r in prefix_filter_jaccard_pairs(
            docs, threshold=t, elements="shingles"
        ).collect()
    }
    tk = docs.select(F.col("doc_id"), shingles(F.col("text")).alias("tk"))
    naive = (
        tk.alias("a")
        .crossJoin(tk.alias("b"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .withColumn(
            "j",
            F.size(F.array_intersect("a.tk", "b.tk")).cast("double")
            / F.size(F.array_union("a.tk", "b.tk")),
        )
        .filter(F.col("j") >= t)
    )
    want = {
        (r[0], r[1])
        for r in naive.select(F.col("a.doc_id"), F.col("b.doc_id")).collect()
    }
    assert got == want
    assert len(got) > 0  # non-degenerate at this threshold


def test_check_rules_and_enforce(spark):
    """Rule table in one pass: NULL rule results are violations; enforce
    keeps exactly the all-pass rows."""
    from pyspark.sql import functions as F

    from warp_spark.validate import check_rules, enforce

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 100.0)], "id int, x double"
    )
    out = {r["rule"]: r for r in check_rules(df, {
        "x_positive": F.col("x") > 0,          # -5 fails, NULL fails
        "id_not_null": F.col("id").isNotNull(),
    }).collect()}
    assert out["x_positive"]["n_violations"] == 2
    assert out["x_positive"]["violation_ppm"] == 500000
    assert not out["x_positive"]["passed"]
    assert out["id_not_null"]["n_violations"] == 0 and out["id_not_null"]["passed"]
    kept = sorted(r["id"] for r in enforce(df, {"x_positive": F.col("x") > 0}).collect())
    assert kept == [1, 4]


def test_check_rules_single_scan(spark):
    """All rules fold into ONE aggregate over one scan — no per-rule
    jobs (the plan holds a single FileScan/aggregate pair)."""
    from pyspark.sql import functions as F

    from warp_spark.validate import check_rules

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    plan = check_rules(df, {
        "a": F.col("o_totalprice") > 0,
        "b": F.col("o_orderkey").isNotNull(),
        "c": F.col("o_custkey") > 0,
    })._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1, plan


def test_ivfpq_topk_recall_and_probe_honesty(spark):
    from warp_spark.pipeline.similarity import (
        brute_force_topk,
        ivf_assign,
        ivf_centroids,
        ivfpq_topk,
    )
    import numpy as np

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    ex = {(r["query_id"], r["neighbor_id"]) for r in brute_force_topk(q, emb, k=5).collect()}
    got = ivfpq_topk(q, emb, k=5, n_centroids=16, nprobe=4, rerank=50).collect()
    rr = {(r["query_id"], r["neighbor_id"]) for r in got}
    # recall is bounded above by IVF's candidate recall (nprobe lists);
    # at the narrow nprobe=4 probe it still clears the old lenient floor
    assert len(rr & ex) / len(ex) >= 0.3
    # the catalog's documented operating point (r7 sweep: 0.86/0.88/0.92
    # at sf0.001/0.01/0.1) clears the 0.8 floor the entry now asserts
    op = {
        (r["query_id"], r["neighbor_id"])
        for r in ivfpq_topk(
            q, emb, k=5, n_centroids=16, nprobe=12, rerank=100
        ).collect()
    }
    assert len(op & ex) / len(ex) >= 0.8
    assert all(1 <= r["rank"] <= 5 for r in got)
    assert all(r["query_id"] != r["neighbor_id"] for r in got)
    # index honesty: every returned neighbor really lives in one of its
    # query's probed lists — the inverted file pruned, it didn't leak
    cents = ivf_centroids(emb, 16)
    assign = {
        r["vec_id"]: r["cid"]
        for r in emb.select(
            "vec_id", ivf_assign(F.col("embedding"), cents).alias("cid")
        ).collect()
    }
    cmat = np.stack([v for _, v in cents]).astype(np.float64)
    cmat = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
    qrows = q.select("vec_id", "embedding").collect()
    for qr in qrows:
        qv = np.array(qr["embedding"], dtype=np.float64)
        qv = qv / np.linalg.norm(qv)
        probes = set(np.argsort(-(qv @ cmat.T), kind="stable")[:4].tolist())
        for r in got:
            if r["query_id"] == qr["vec_id"]:
                assert assign[r["neighbor_id"]] in probes
    # deterministic end-to-end (RNG-free training + stable sorts)
    again = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in
             ivfpq_topk(q, emb, k=5, n_centroids=16, nprobe=4, rerank=50).collect()}
    assert again == {(r["query_id"], r["neighbor_id"], r["rank"]) for r in got}


def test_ivfpq_recall_sweep_grid_pinned(spark):
    """Pin the r7 operating-point sweep as an artifact: the whole
    nprobe×rerank recall grid, not just the 0.8 floor.  The pipeline is
    RNG-free and the corpus fixed, so recall is EXACT — an embedding-
    distribution or index change that erodes the catalog margin
    localizes to a cell here instead of surfacing as a bare floor
    failure.  Measured r8 on sf0.001 (synthetic embeddings are nearly
    unclustered, so recall tracks the probed fraction — see memory of
    the r7 sweep: 12/16 at rerank=100 gave 0.86/0.88/0.92 tri-SF)."""
    from warp_spark.pipeline.similarity import brute_force_topk, ivfpq_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    ex = {(r["query_id"], r["neighbor_id"]) for r in brute_force_topk(q, emb, k=5).collect()}
    expected = {
        (4, 50): 0.58, (4, 100): 0.58,
        (8, 50): 0.74, (8, 100): 0.74,
        (12, 50): 0.84, (12, 100): 0.86,
        (16, 50): 0.98, (16, 100): 1.0,
    }
    got = {}
    for (nprobe, rerank), want in expected.items():
        rr = {
            (r["query_id"], r["neighbor_id"])
            for r in ivfpq_topk(
                q, emb, k=5, n_centroids=16, nprobe=nprobe, rerank=rerank
            ).collect()
        }
        got[(nprobe, rerank)] = round(len(rr & ex) / len(ex), 3)
    assert got == expected, f"recall grid moved: {got} vs pinned {expected}"
    # the catalog operating point keeps a real margin over its 0.8 floor
    assert got[(12, 100)] >= 0.86


def test_redact_pii_semantics(spark):
    from warp_spark.pipeline.text import redact_pii

    rows = [
        (1, "mail me at a.b+c@ex-ample.org or x@y.io thanks"),
        (2, "call 555-123-4567 and 555-000-1111"),
        (3, "hosts 10.0.0.1 and 192.168.255.254 up"),
        (4, "ssn 123-45-6789 on file"),
        # sequencing: both dotted quads are consumed by the IPv4 rule
        # BEFORE the loose phone rule (which also matches dotted digit
        # runs) gets to see them — n_phone stays 0
        (5, "hosts 10.0.0.1 then 10.0.0.2"),
        # and an SSN-shaped group is taken by the SSN rule, not phone
        (6, "no pii here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert (got[1]["n_email"], got[1]["n_phone"]) == (2, 0)
    assert got[2]["n_phone"] == 2
    assert (got[3]["n_ipv4"], got[3]["n_phone"]) == (2, 0)
    assert (got[4]["n_ssn"], got[4]["n_phone"]) == (1, 0)
    assert (got[5]["n_ipv4"], got[5]["n_phone"]) == (2, 0)
    assert all(
        got[6][c] == 0 for c in ("n_email", "n_ipv4", "n_ssn", "n_phone")
    )
    # the md5 is of the REDACTED text: identical inputs with different
    # PII spellings redact to identical bytes
    pair = spark.createDataFrame(
        [(10, "reach a@b.co now"), (11, "reach c.d@e-f.org now")],
        "doc_id long, text string",
    )
    h = [r["redacted_md5"] for r in redact_pii(pair).collect()]
    assert h[0] == h[1]


def test_semantic_contamination_semantics(spark):
    from warp_spark.pipeline.similarity import semantic_contamination

    ev = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    tr = spark.createDataFrame(
        [
            (1, [2.0, 0.0, 0.0, 0.0]),   # parallel to eval 100 → sim 1.0
            (2, [0.0, 0.0, 3.0, 0.0]),   # orthogonal to both → 0.0
            (3, [1.0, 1.0, 0.0, 0.0]),   # 45° to both → ~0.7071
        ],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r for r in semantic_contamination(tr, ev, 0.5).collect()}
    assert got[1]["max_sim"] == 1.0 and got[1]["contaminated"]
    assert got[2]["max_sim"] == 0.0 and not got[2]["contaminated"]
    assert got[3]["max_sim"] == pytest.approx(0.707107, abs=1e-6)
    assert got[3]["contaminated"]
    # exactly one row per training vector, none fabricated
    assert set(got) == {1, 2, 3}


def test_fuzzy_best_match_single_edit_complete(spark):
    """Prefix+suffix blocking must be COMPLETE for single-edit pairs:
    every dirty record derived by one edit finds its clean source, at
    the right distance, through at least one of the two block keys —
    including edits placed to defeat each key individually."""
    from warp_spark.pipeline.dedup import fuzzy_best_match

    clean = spark.createDataFrame(
        [(i, f"{i * 2654435761 % 10**8:08d}") for i in range(1, 30)],
        "rec_id long, name string",
    )
    rows = []
    for i, nm in [(r["rec_id"], r["name"]) for r in clean.collect()]:
        if i % 4 == 1:
            d = nm[:3] + nm[4:]          # interior deletion: breaks neither key
        elif i % 4 == 2:
            d = nm[0] + "x" + nm[2:]     # front substitution: breaks the prefix key
        elif i % 4 == 3:
            d = nm + "q"                 # append: breaks the suffix key
        else:
            d = nm
        rows.append((i, d))
    dirty = spark.createDataFrame(rows, "rec_id long, name string")
    got = {r["a_id"]: r for r in
           fuzzy_best_match(dirty, clean, max_dist=1).collect()}
    assert set(got) == set(range(1, 30))   # complete: every dirty resolved
    for i in range(1, 30):
        assert got[i]["b_id"] == i         # ... to its own source
        assert got[i]["dist"] == (0 if i % 4 == 0 else 1)
        assert got[i]["n_cand"] >= 1


def test_duplicate_span_stats_semantics(spark):
    """A hand-built corpus where the duplicated 3-gram instances are
    knowable by eye: docs 1 and 2 share 'a b c'; doc 3 repeats its own
    3-gram ('x y z x y z' — within-doc multiplicity counts, the
    ExactSubstr semantics); doc 4 is unique; doc 5 is too short."""
    from warp_spark.pipeline.dedup import duplicate_span_stats

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),          # grams: 'a b c', 'b c d'
            (2, "a b c e"),          # grams: 'a b c', 'b c e'
            (3, "x y z x y z"),      # grams: xyz, yzx, zxy, xyz
            (4, "p q r s"),          # unique
            (5, "u v"),              # < n tokens: excluded
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in duplicate_span_stats(docs, n=3).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert (out[1]["total_grams"], out[1]["dup_grams"]) == (2, 1)
    assert (out[2]["total_grams"], out[2]["dup_grams"]) == (2, 1)
    # doc 3: 4 gram instances, 'x y z' occurs twice -> both instances dup
    assert (out[3]["total_grams"], out[3]["dup_grams"]) == (4, 2)
    assert (out[4]["total_grams"], out[4]["dup_grams"]) == (2, 0)
    assert out[1]["dup_ppm"] == 500000
    assert out[3]["dup_ppm"] == 500000
    assert out[4]["dup_ppm"] == 0


def test_deterministic_shuffle_reproducible_and_dense(spark):
    """Same seed → identical order; different seed → different order;
    per-shard positions are dense 1..len(shard); n_shards validated."""
    from warp_spark.sampling import deterministic_shuffle

    docs = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    a = deterministic_shuffle(docs, seed="s1", n_shards=8).collect()
    b = deterministic_shuffle(docs, seed="s1", n_shards=8).collect()
    c = deterministic_shuffle(docs, seed="s2", n_shards=8).collect()
    key = lambda rows: sorted((r["doc_id"], r["shard"], r["pos_in_shard"]) for r in rows)
    assert key(a) == key(b)
    assert key(a) != key(c)
    assert {r["shard"] for r in a} <= set(range(8))
    by_shard = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos_in_shard"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    with pytest.raises(ValueError):
        deterministic_shuffle(docs, n_shards=7)


def test_deterministic_shuffle_partition_parallel_window(spark):
    """The rank must be PARTITION BY shard — a global-window plan would
    be the one-task serialization this op exists to avoid."""
    from warp_spark.sampling import deterministic_shuffle

    docs = spark.range(0, 50).select(F.col("id").alias("doc_id"))
    plan = deterministic_shuffle(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # hashpartitioning on shard, never SinglePartition feeding the window
    assert "hashpartitioning(shard" in plan


def test_mask_duplicate_spans_interval_merge(spark):
    """Overlapping duplicated 3-gram instances must coalesce into one
    maximal region (no double-counted tokens); disjoint ones must not.
    Doc 1/2 share 'a b c d' → two overlapping grams each, one region
    of 4 tokens; doc 3 repeats its own gram at positions 1 and 7 →
    two disjoint regions."""
    from warp_spark.pipeline.dedup import mask_duplicate_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d x"),            # grams: abc(1-3), bcd(2-4) both dup
            (2, "a b c d y"),
            (3, "k l m p q r k l m"),    # 'k l m' at 1-3 and 7-9
            (4, "k l m z1 z2 z3"),        # makes 'k l m' corpus-dup
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in mask_duplicate_spans(docs, n=3).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    r1 = out[1]
    assert (r1["n_dup_instances"], r1["n_regions"], r1["masked_tokens"]) == (2, 1, 4)
    assert r1["total_tokens"] == 5
    assert r1["masked_ppm"] == 800000
    r3 = out[3]
    assert (r3["n_dup_instances"], r3["n_regions"], r3["masked_tokens"]) == (2, 2, 6)
    r4 = out[4]
    assert (r4["n_dup_instances"], r4["n_regions"], r4["masked_tokens"]) == (1, 1, 3)


def test_mask_duplicate_spans_single_sort_for_windows(spark):
    """All three window passes (prev-max, flag, running region id) must
    share one (doc, start) sort — the plan may contain exactly one
    Exchange keyed on the document id for the island stage."""
    from warp_spark.pipeline.dedup import mask_duplicate_spans

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], "doc_id long, text string"
    )
    plan = (
        mask_duplicate_spans(docs, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("hashpartitioning(doc_id") <= 2  # island window + final agg reuse


def test_deterministic_shuffle_global_matches_serial_order(spark):
    """The two-phase prefix position must equal the serial definition
    row_number() OVER (ORDER BY shuffle_key, id) — verified by sorting
    the output by key and checking positions are the dense 1..N in
    that order — and must be reproducible under the seed."""
    from warp_spark.sampling import deterministic_shuffle_global

    docs = spark.range(0, 300).select(F.col("id").alias("doc_id"))
    out = deterministic_shuffle_global(docs, seed="s1", num_partitions=7).collect()
    assert len(out) == 300
    by_key = sorted(out, key=lambda r: (r["shuffle_key"], r["doc_id"]))
    assert [r["position"] for r in by_key] == list(range(1, 301))
    again = deterministic_shuffle_global(docs, seed="s1", num_partitions=7).collect()
    assert sorted((r["doc_id"], r["position"]) for r in out) == sorted(
        (r["doc_id"], r["position"]) for r in again
    )


def test_span_census_hash_transform_not_reevaluated(spark):
    """The gram-hash transform must appear exactly once per census leg
    (census + join-back = 2), never a third time under a size()/count
    projection — the re-evaluation read 24.6s vs 2.1s at sf0.1 before
    the count was derived from the token-array length instead."""
    from warp_spark.pipeline.dedup import duplicate_span_stats, mask_duplicate_spans

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], "doc_id long, text string"
    )
    for fn in (duplicate_span_stats, mask_duplicate_spans):
        plan = fn(docs, n=3)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("xxhash64") <= 2, fn.__name__


def test_token_budget_fill_matches_single_window_reference(spark):
    """The grouped two-phase prefix must equal the plain per-group
    running-sum window for every group, including a group whose total
    sits under the budget (select-all) and exact boundary hits."""
    from pyspark.sql import Window

    from warp_spark.sampling import token_budget_fill

    rows = [(i, f"g{i % 3}", (i * 7) % 13 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, g string, w long")
    got = {
        (r["g"], r["id"], r["cum_weight"])
        for r in token_budget_fill(
            df, "g", "w", budget=150,
            order_cols=[F.col("w").desc(), F.col("id")],
            num_partitions=7,
        ).collect()
    }
    w = Window.partitionBy("g").orderBy(F.col("w").desc(), "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ref = {
        (r["g"], r["id"], r["cum"])
        for r in df.withColumn("cum", F.sum("w").over(w))
        .filter(F.col("cum") <= 150)
        .collect()
    }
    assert got == ref and got
    # tiny group under budget: every row selected; default order is
    # weight DESC, so the w=6 row fills first (cum 6), then w=5 (cum 11)
    small = spark.createDataFrame([(1, "x", 5), (2, "x", 6)], "id long, g string, w long")
    out = token_budget_fill(small, "g", "w", budget=100).collect()
    assert {(r["id"], r["cum_weight"]) for r in out} == {(2, 6), (1, 11)}
    # equal-weight tie exactly at the budget boundary: the default
    # order tiebreaks on a full-row content hash, so which row fills
    # the last slot is deterministic across runs (ADVICE r7)
    tie = spark.createDataFrame(
        [(1, "t", 10), (2, "t", 10), (3, "t", 10)], "id long, g string, w long"
    )
    picks = [
        tuple(sorted(r["id"] for r in token_budget_fill(tie, "g", "w", budget=20).collect()))
        for _ in range(3)
    ]
    assert len(picks[0]) == 2 and len(set(picks)) == 1, picks


def test_scd2_intervals_runs_and_ties(spark):
    import datetime as dt

    from warp_spark.scd import scd2_intervals

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        # user 1: a,a,b,a — three runs; tie at minute 2 resolved by id
        (1, "a", ts(0), 10),
        (1, "a", ts(1), 11),
        (1, "b", ts(2), 12),
        (1, "a", ts(2), 13),  # same ts as id 12 → ordered after by id
        # user 2: single run
        (2, "c", ts(0), 20),
        (2, "c", ts(5), 21),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )
    got = sorted(
        (r["user_id"], r["event_type"], r["valid_from"], r["valid_to"], r["n_events"])
        for r in scd2_intervals(
            df, "user_id", "event_type", "ts", tiebreak_cols=["event_id"]
        ).collect()
    )
    assert got == [
        (1, "a", ts(0), ts(2), 2),
        (1, "a", ts(2), None, 1),
        (1, "b", ts(2), ts(2), 1),
        (2, "c", ts(0), None, 2),
    ]


def test_dsir_importance_prefers_target_like_docs(spark):
    """Raw docs written in the target's vocabulary must outscore raw
    docs from a disjoint vocabulary, and every raw doc (only raw docs)
    must be scored."""
    from warp_spark.pipeline.text import dsir_importance

    target_text = "alpha beta gamma delta alpha beta"
    rows = (
        [(i, target_text) for i in range(0, 10)]  # target slice: ids < 10
        + [(10, "alpha beta gamma delta"), (11, "zig zag zog quux")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["dsir_log2w"])
        for r in dsir_importance(df, is_target=F.col("doc_id") < 10).collect()
    }
    assert set(got) == {10, 11}  # raw pool only
    assert got[10][0] == 4 and got[11][0] == 4
    assert got[10][1] > got[11][1]


def test_curation_ablation_funnel_is_monotone(spark):
    """Survivorship can only shrink stage to stage, the input row is
    ppm=1e6, and stage 3→4 (dedup) keeps exactly one doc per surviving
    fingerprint."""
    from warp_spark.catalog import QUERIES

    rows = {r["stage"]: r for r in QUERIES["curation_ablation_funnel"](
        spark, "/root/testdata/sf0.001").collect()}
    order = ["0_input", "1_langid", "2_quality", "3_repetition", "4_dedup"]
    assert set(rows) == set(order)
    assert rows["0_input"]["retained_ppm"] == 1_000_000
    for a, b in zip(order, order[1:]):
        assert rows[b]["n_docs"] <= rows[a]["n_docs"]
        assert rows[b]["n_tokens"] <= rows[a]["n_tokens"]
        assert rows[b]["retained_ppm"] <= rows[a]["retained_ppm"]


def test_ngram_novelty_semantics(spark):
    """First doc owns all its grams; an exact copy later owns none; a
    half-overlapping doc owns exactly the new grams; short docs get a
    zero row (not dropped)."""
    from warp_spark.pipeline.text import ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),        # grams: abc, bcd -> both novel
            (2, "a b c d"),        # same grams, first_doc=1 -> 0 novel
            (3, "c d e f"),        # cde, def novel; (no shared 3-gram)
            (4, "x y"),            # too short: no grams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(docs, n=3).collect()}
    assert out[1]["n_grams"] == 2 and out[1]["novel_grams"] == 2
    assert out[1]["novelty_ppm"] == 1_000_000
    assert out[2]["n_grams"] == 2 and out[2]["novel_grams"] == 0
    assert out[2]["novelty_ppm"] == 0
    assert out[3]["novel_grams"] == 2
    assert out[4]["n_grams"] == 0 and out[4]["novelty_ppm"] == 0


def test_duplication_profile_semantics(spark):
    """Whitespace variants cluster with their originals; dup_chars
    prices keeping the smallest copy; singletons reclaim nothing."""
    from warp_spark.pipeline.dedup import duplication_profile

    docs = spark.createDataFrame(
        [
            (1, "hello  world", 12),
            (2, " hello world ", 13),   # same normalized text
            (3, "hello world", 11),     # same normalized text
            (4, "unique doc", 10),
        ],
        "doc_id long, text string, n_chars long",
    )
    out = {r["cluster_size"]: r for r in duplication_profile(docs).collect()}
    assert out[1]["n_clusters"] == 1 and out[1]["dup_docs"] == 0
    assert out[1]["dup_chars"] == 0
    assert out[3]["n_clusters"] == 1 and out[3]["n_docs"] == 3
    assert out[3]["dup_docs"] == 2
    # keep the 11-char copy: reclaim 12 + 13
    assert out[3]["dup_chars"] == 25


def test_oov_report_semantics(spark):
    """With a vocab of the top-2 tokens, everything else is OOV; ppm is
    the exact floor(x+0.5) of the group rate."""
    from warp_spark.pipeline.text import oov_report

    docs = spark.createDataFrame(
        [
            (1, "en", "web", "aa aa bb"),
            (2, "en", "web", "aa zz"),
            (3, "fr", "book", "qq rr"),
        ],
        "doc_id long, lang string, source string, text string",
    )
    out = {
        (r["lang"], r["source"]): r
        for r in oov_report(
            docs, group_cols=["lang", "source"], vocab_size=2
        ).collect()
    }
    # corpus counts: aa=3, bb=1, qq=1, rr=1, zz=1 -> vocab = {aa, bb}
    en = out[("en", "web")]
    assert en["total_tokens"] == 5 and en["oov_tokens"] == 1  # zz
    assert en["oov_ppm"] == 200_000
    fr = out[("fr", "book")]
    assert fr["oov_tokens"] == 2 and fr["oov_ppm"] == 1_000_000


def test_burst_islands_merge_consecutive(spark):
    """Adjacent hot 10-minute buckets merge into one island; a gap
    splits islands; the cross-multiply threshold is strict."""
    import datetime as dt

    import __spark_entry__ as m
    from pyspark.sql import functions as F

    # build an events-shaped frame: type A has 3 active buckets with
    # counts 8, 8, 1 -> mean 17/3; hot iff 2*cnt*3 > 3*17 i.e. cnt > 8.5
    # -> NO hot bucket; type B counts 9, 1, 9 (buckets 0, 1, 2):
    # hot iff 2*cnt*3 > 3*19 i.e. cnt > 9.5 -> none. Use sharper skew:
    # type C counts 30, 30, 1, 1 over buckets 0,1,3 ->
    # hot iff 2*cnt*4 > 3*62 -> cnt > 23.25: buckets 0,1 hot, adjacent
    # -> ONE island of 2 buckets, 60 events, peak 30.
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    def burst(tp, bucket, n):
        nonlocal eid
        for i in range(n):
            rows.append((eid, base + dt.timedelta(minutes=10 * bucket, seconds=i % 600), 1, tp, 1.0, "{}"))
            eid += 1
    burst("C", 0, 30); burst("C", 1, 30); burst("C", 3, 1); burst("C", 4, 1)
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    import tempfile, os, shutil
    d = tempfile.mkdtemp(prefix="burst_test_")
    try:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        out = m.queries()["events_burst_islands"](spark, d).collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert len(out) == 1
    r = out[0]
    assert r["event_type"] == "C" and r["n_buckets"] == 2
    assert r["peak_per_bucket"] == 30 and r["burst_events"] == 60
    assert r["burst_start"] == base and r["burst_end"] == base + dt.timedelta(minutes=10)


def test_epoch_allocation_hamilton(spark):
    """Quotas sum exactly to the budget; leftovers go to the largest
    remainders; remainder ties break on source name ascending."""
    from warp_spark.sampling import epoch_allocation

    df = spark.createDataFrame(
        [("a", 3), ("b", 3), ("c", 4)], "src string, w long"
    )
    out = {r["src"]: r for r in epoch_allocation(df, "src", "w", budget=11).collect()}
    assert {k: v["alloc"] for k, v in out.items()} == {"a": 3, "b": 3, "c": 5}
    assert sum(v["alloc"] for v in out.values()) == 11
    assert out["c"]["extra"] == 1 and out["a"]["extra"] == 0
    # remainder tie: both rem 1, leftover 1 -> 'a' wins by name
    df2 = spark.createDataFrame([("a", 1), ("b", 1)], "src string, w long")
    out2 = {r["src"]: r["alloc"] for r in epoch_allocation(df2, "src", "w", budget=3).collect()}
    assert out2 == {"a": 2, "b": 1}


def test_active_users_cover_explode(spark):
    """min(i)-per-(cover_day,user) classifies recency exactly: a user
    active on day 0 counts in DAU(d0), WAU through d6, MAU through
    d29 and not after; overlapping activity dedups to the most recent."""
    import datetime as dt
    import os
    import shutil
    import tempfile

    import __spark_entry__ as m

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        # user 1 active day0 and day2; user 2 only day0
        (1, base, 1, "a", 1.0, "{}"),
        (2, base + dt.timedelta(days=2), 1, "a", 1.0, "{}"),
        (3, base, 2, "a", 1.0, "{}"),
        # user 3 active day9 (keeps the grid alive through day 9)
        (4, base + dt.timedelta(days=9), 3, "a", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    )
    d = tempfile.mkdtemp(prefix="active_users_test_")
    try:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        out = {r["day"].isoformat(): r for r in m.queries()["events_active_users"](spark, d).collect()}
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert out["2024-03-01"]["dau"] == 2  # users 1, 2
    assert out["2024-03-02"]["dau"] == 0 and out["2024-03-02"]["wau"] == 2
    assert out["2024-03-03"]["dau"] == 1  # user 1 again
    # day 8 (index 7 after day0): day0 activity left the 7-day window,
    # but user 1's day-2 activity keeps them in WAU
    assert out["2024-03-08"]["wau"] == 1
    assert out["2024-03-08"]["mau"] == 2
    assert out["2024-03-10"]["dau"] == 1 and out["2024-03-10"]["mau"] == 3
    # grid stops at the last activity day
    assert max(out) == "2024-03-10"


def _bm25_reference(corpus, queries, k1=1.2, b=0.75):
    """Pure-Python BM25 mirroring bm25_topk's EXACT parenthesization
    and ascending-term fold order, so score_ppm matches bit-for-bit."""
    import math

    toks = {d: t.lower().split() for d, t in corpus}
    n_docs = len(corpus)
    total_dl = sum(len(v) for v in toks.values())
    out = {}
    for qid, qterms in queries:
        scores = {}
        for doc_id, tlist in toks.items():
            s = 0.0
            for term in sorted(set(qterms)):
                tf = tlist.count(term)
                if tf == 0:
                    continue
                df = sum(1 for v in toks.values() if term in v)
                idf = math.log2((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                norm = tf + k1 * (
                    1.0 - b + b * len(tlist) * float(n_docs) / float(total_dl)
                )
                s = s + idf * (tf * (k1 + 1.0)) / norm
            if s != 0.0 or any(t in tlist for t in qterms):
                scores[doc_id] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        out[qid] = [
            (rank + 1, doc_id, math.floor(sc * 1_000_000.0 + 0.5))
            for rank, (doc_id, sc) in enumerate(ranked)
        ]
    return out


def test_bm25_semantics_vs_reference(spark):
    """Exact score_ppm parity with a mirrored Python fold, idf edge
    cases (term in every doc stays positive via the +1; absent terms
    contribute nothing), and length normalization (same tf, longer doc
    scores strictly lower)."""
    from warp_spark.pipeline.text import bm25_topk

    corpus = [
        (1, "apple banana apple"),
        (2, "apple cherry"),
        (3, "cherry cherry cherry cherry"),
        (4, "apple fig grape kiwi"),
        (5, "apple lime"),  # apple in 4/5 docs: near-saturated df
    ]
    queries = [
        (10, ["apple"]),
        (20, ["cherry", "missing"]),  # absent term contributes nothing
        (30, ["apple", "cherry"]),  # multi-term ascending fold
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {}
    for r in bm25_topk(docs, queries, k=10).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score_ppm"])
        )
    for q in got:
        got[q].sort()
    want = _bm25_reference(corpus, queries)
    assert got == {q: v for q, v in want.items() if v}
    # length normalization: docs 2 and 4 both have tf(apple)=1 but
    # dl 2 vs 4 — the shorter doc must score strictly higher
    q10 = {doc: ppm for _, doc, ppm in got[10]}
    assert q10[2] > q10[4]
    # idf positivity: apple appears in 4 of 5 docs and still scores > 0
    assert all(ppm > 0 for _, _, ppm in got[10])


def test_bm25_tiebreak_and_k(spark):
    """Identical docs produce identical scores and rank by doc_id
    ascending; k caps per-query results; empty corpus returns an
    empty frame with the output schema."""
    from warp_spark.pipeline.text import bm25_topk

    docs = spark.createDataFrame(
        [(7, "zebra zebra"), (3, "zebra zebra"), (5, "zebra zebra"), (9, "other")],
        "doc_id long, text string",
    )
    rows = bm25_topk(docs, [(1, ["zebra"])], k=2).collect()
    assert [(r["rank"], r["doc_id"]) for r in sorted(rows, key=lambda r: r["rank"])] == [
        (1, 3),
        (2, 5),
    ]  # k=2 keeps the two smallest doc_ids of the three-way tie
    assert len({r["score_ppm"] for r in rows}) == 1
    empty = bm25_topk(
        spark.createDataFrame([], "doc_id long, text string"), [(1, ["zebra"])]
    )
    assert empty.columns == ["query_id", "rank", "doc_id", "score_ppm"]
    assert empty.count() == 0


def test_zipf_spectrum_exact_power_law(spark):
    """A corpus constructed with count(token_r) = 2^(10−r) must fit
    slope = −1 exactly in log2 space (x = log2 r needs geometric ranks
    for exactness, so check the algebra on the r ∈ {1,2,4,8} subset by
    construction: counts 512,256,128,64 at ranks 1..4 give slope
    log2-linear with slope −(log2 512 − log2 64)/(log2 4 − log2 1) =
    ... — instead pin the closed-form least squares computed in
    Python float arithmetic, mirrored parenthesization)."""
    import math

    from warp_spark.pipeline.text import zipf_spectrum

    # 4 tokens with counts 512, 256, 128, 64 -> one doc per occurrence
    rows = []
    for r, (tok, cnt) in enumerate(
        [("aa", 512), ("bb", 256), ("cc", 128), ("dd", 64)], start=1
    ):
        rows.extend((i, tok) for i in range(cnt))
    docs = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(rows)], "doc_id long, text string"
    )
    out = zipf_spectrum(docs, k=10).collect()
    assert [r["token"] for r in out] == ["aa", "bb", "cc", "dd"]
    assert [r["rank"] for r in out] == [1, 2, 3, 4]
    assert [r["cnt"] for r in out] == [512, 256, 128, 64]
    n = 960
    assert out[0]["freq_ppm"] == math.floor(512 * 1_000_000.0 / n + 0.5)
    assert out[-1]["cum_freq_ppm"] == 1_000_000
    assert out[0]["vocab_size"] == 4
    # mirrored least squares in Python
    xs = [math.log2(float(r)) for r in (1, 2, 3, 4)]
    ys = [math.log2(float(c)) for c in (512, 256, 128, 64)]
    k = 4.0
    sx, sy = 0.0, 0.0
    for v in xs:
        sx = sx + v
    for v in ys:
        sy = sy + v
    sxy, sxx = 0.0, 0.0
    for a, b in zip(xs, ys):
        sxy = sxy + a * b
    for a in xs:
        sxx = sxx + a * a
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert out[0]["zipf_slope_ppm"] == math.floor(slope * 1_000_000.0 + 0.5)
    assert slope < -0.9  # decaying spectrum reads as Zipf-like


def test_heaps_growth_semantics(spark):
    """Thresholds are powers of two plus the max+1 closer; vocab and
    token counts are monotone along the prefix; an all-novel corpus
    (every doc introduces new grams) fits beta near 1, and duplicating
    the corpus tail-end adds tokens but no vocab, dragging beta down."""
    from warp_spark.pipeline.text import heaps_growth

    novel = [(i, f"w{i}a w{i}b w{i}c w{i}d") for i in range(8)]
    out = heaps_growth(
        spark.createDataFrame(novel, "doc_id long, text string")
    ).collect()
    ts = [r["threshold"] for r in out]
    assert ts == [1, 2, 4, 8]
    assert [r["n_docs"] for r in out] == [1, 2, 4, 8]
    assert [r["cum_tokens"] for r in out] == [4, 8, 16, 32]
    # every doc has 2 distinct 3-grams, none shared
    assert [r["gram_vocab"] for r in out] == [2, 4, 8, 16]
    beta_novel = out[0]["heaps_beta_ppm"]
    assert abs(beta_novel - 1_000_000) < 5_000  # V doubles when N does

    dup = novel + [(8 + i, novel[0][1]) for i in range(8)]  # copies add N, not V
    out2 = heaps_growth(
        spark.createDataFrame(dup, "doc_id long, text string")
    ).collect()
    assert out2[-1]["gram_vocab"] == 16  # unchanged vocabulary
    assert out2[-1]["heaps_beta_ppm"] < beta_novel


def test_heaps_growth_empty_corpus(spark):
    """Empty documents frame: max(doc_id) is NULL — must short-circuit
    to a typed empty result, not TypeError on int(None) (r9 advice,
    mirroring the bm25_topk empty-corpus guard)."""
    from warp_spark.pipeline.text import heaps_growth

    out = heaps_growth(
        spark.createDataFrame([], "doc_id long, text string")
    )
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "threshold", "n_docs", "cum_tokens",
        "gram_vocab", "heaps_beta_ppm", "heaps_intercept_ppm",
    ]


def test_ntile_global_matches_spark_window(spark):
    """The distributed closed-form ntile must equal Spark's own
    ntile() window for every n mod k residue (1..25 rows, k=4) and for
    a larger shuffled frame — including the n < k edge where later
    buckets stay empty."""
    from pyspark.sql import Window
    from warp_spark.catalog import _ntile_global

    for n in list(range(1, 26)) + [997]:
        df = spark.range(n).select(
            F.col("id"), (F.col("id") * 37 % 1000).alias("v")
        )
        keys = [F.col("v"), F.col("id")]
        want = {
            (r["id"],): r["b"]
            for r in df.select(
                "id", F.ntile(4).over(Window.orderBy(*keys)).alias("b")
            ).collect()
        }
        got = {
            (r["id"],): r["b"]
            for r in _ntile_global(df, keys, 4, "b").collect()
        }
        assert got == want, n


def test_pmi_bigrams_exact_small_corpus(spark):
    """Closed-form check: in a corpus where 'new york' always co-occurs
    and 'the the' pairs are frequent but independent, the collocation
    must out-lift the chance pair, and every lift must equal
    N·c_ab/(c_left·c_right) computed in Python."""
    from warp_spark.pipeline.text import pmi_bigrams

    docs = spark.createDataFrame(
        [(i, "new york " * 3 + "the a " * 5) for i in range(8)],
        "doc_id long, text string",
    )
    out = pmi_bigrams(docs, k=50, min_count=5).collect()
    by_pair = {(r["w1"], r["w2"]): r for r in out}
    n = sum(r["c_ab"] for r in out if True)  # all pairs survive the floor here
    # recompute every lift from the emitted integer counts
    for r in out:
        assert r["pmi_lift"] == (n * r["c_ab"]) / (r["c_left"] * r["c_right"])
    assert ("new", "york") in by_pair and ("the", "a") in by_pair
    assert by_pair[("new", "york")]["pmi_lift"] > by_pair[("the", "a")]["pmi_lift"]
    # ordering: non-increasing lift, ties broken (w1, w2) ascending
    lifts = [r["pmi_lift"] for r in out]
    assert lifts == sorted(lifts, reverse=True)


def test_attribution_last_touch_edges(spark, tmp_path):
    """Strict-precede and lookback edges: a same-microsecond touch does
    NOT attribute (purchase sorts first at equal ts), a touch exactly
    7 days earlier DOES (inclusive cutoff), one micro-second beyond is
    'direct', the latest of several touches wins, and a same-ts touch
    tie breaks to the higher event_id."""
    import datetime as dt
    import __spark_entry__ as m

    t0 = dt.datetime(2025, 1, 10, 12, 0, 0)
    week = dt.timedelta(days=7)
    us = dt.timedelta(microseconds=1)
    rows = [
        # u1: click then view (later touch wins) then purchase
        (1, t0 - dt.timedelta(hours=2), 1, "click", 0.0, "{}"),
        (2, t0 - dt.timedelta(hours=1), 1, "view", 0.0, "{}"),
        (3, t0, 1, "purchase", 10.0, "{}"),
        # u2: touch at the same microsecond as the purchase -> direct
        (4, t0, 2, "click", 0.0, "{}"),
        (5, t0, 2, "purchase", 20.0, "{}"),
        # u3: touch exactly 7 days before -> attributed (inclusive)
        (6, t0 - week, 3, "view", 0.0, "{}"),
        (7, t0, 3, "purchase", 30.0, "{}"),
        # u4: touch 7 days + 1 us before -> direct
        (8, t0 - week - us, 4, "click", 0.0, "{}"),
        (9, t0, 4, "purchase", 40.0, "{}"),
        # u5: two touches at the same ts -> higher event_id (view) wins
        (10, t0 - us, 5, "click", 0.0, "{}"),
        (11, t0 - us, 5, "view", 0.0, "{}"),
        (12, t0, 5, "purchase", 50.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {
        r["channel"]: (r["n_purchases"], r["total_cents"])
        for r in m.queries()["events_attribution_last_touch"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {
        "view": (3, 9000),   # u1 (view beats earlier click), u3, u5
        "direct": (2, 6000),  # u2 same-us touch, u4 beyond lookback
    }


def test_mmr_diversify_prefers_diversity(spark):
    """On a corpus where the two most relevant candidates are
    near-duplicates of each other, plain top-k returns both but MMR's
    step 2 must skip the duplicate for a less relevant, more novel
    vector; step 1 is always the relevance argmax; ranks are 1..k and
    mmr_score = 0.5*rel - 0.5*max_sim exactly."""
    from warp_spark.pipeline.similarity import mmr_diversify

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),       # query
        (1, [0.99, 0.14, 0.0, 0.0]),     # near-dup of 2, slightly less rel
        (2, [0.992, 0.126, 0.0, 0.0]),   # most relevant
        (3, [0.7, 0.0, 0.71, 0.0]),      # less relevant, orthogonal-ish
        (4, [0.7, 0.0, 0.0, 0.71]),      # ditto, other axis
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    out = mmr_diversify(
        df.filter("vec_id = 0"), df.filter("vec_id != 0"), k=3, n_candidates=4
    ).collect()
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert out[0]["vec_id"] == 2          # relevance argmax first
    assert out[1]["vec_id"] in (3, 4)     # near-dup 1 skipped at step 2
    ids = [r["vec_id"] for r in out]
    assert 1 not in ids[:2]
    for r in out:
        assert r["mmr_score"] == 0.5 * r["rel"] - 0.5 * r["max_sim"]
    assert out[0]["max_sim"] == 0.0


def _write_tbl(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/{name}.parquet")


def test_contamination_matrix_semantics(spark, tmp_path):
    """Two sources sharing a near-dup pair must show a cross-source
    cell; within-source dups show on the diagonal; untouched source
    pairs are absent (no zero-fill)."""
    import __spark_entry__ as m

    base = "alpha beta gamma delta epsilon zeta eta theta " * 6
    rows = [
        (0, base, "en", "srcA", len(base)),
        (1, base + "tail", "en", "srcB", len(base) + 4),   # cross A-B dup
        (2, base + "xyz", "en", "srcA", len(base) + 3),    # within-A dup
        (3, "totally different words nothing shared here at all " * 6,
         "en", "srcC", 300),
    ]
    _write_tbl(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {
        (r["src_lo"], r["src_hi"]): r
        for r in m.queries()["curation_contamination_matrix"](
            spark, str(tmp_path)
        ).collect()
    }
    assert ("srcA", "srcB") in out and out[("srcA", "srcB")]["cross_source"]
    assert ("srcA", "srcA") in out and not out[("srcA", "srcA")]["cross_source"]
    assert not any("srcC" in k for k in out)
    assert out[("srcA", "srcB")]["max_jaccard"] >= 0.5


def test_cohort_ltv_semantics(spark, tmp_path):
    """Cohorts key on the FIRST PURCHASE day (views don't open a
    cohort); offsets are day diffs; cents are exact floors."""
    import datetime as dt
    import __spark_entry__ as m

    d0 = dt.datetime(2025, 3, 1, 10, 0, 0)
    day = dt.timedelta(days=1)
    rows = [
        (1, d0 - 5 * day, 1, "view", 0.0, "{}"),          # ignored for cohort
        (2, d0, 1, "purchase", 10.004, "{}"),             # cohort day 0
        (3, d0 + 2 * day, 1, "purchase", 5.999, "{}"),    # offset 2
        (4, d0 + day, 2, "purchase", 20.5, "{}"),         # second cohort
    ]
    _write_tbl(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    out = {
        (str(r["cohort"]), r["day_offset"]): (r["n_buyers"], r["revenue_cents"])
        for r in m.queries()["events_cohort_ltv"](spark, str(tmp_path)).collect()
    }
    assert out == {
        ("2025-03-01", 0): (1, 1000),  # floor(10.004*100) = 1000
        ("2025-03-01", 2): (1, 599),   # floor(5.999*100)  = 599
        ("2025-03-02", 0): (1, 2050),
    }


def test_k_anonymity_semantics(spark, tmp_path):
    """Class sizes bucket exactly: a singleton QI class lands in '1',
    a 3-row class in '2-4'; ppm shares are exact integer division."""
    import __spark_entry__ as m

    rows = [(i, "t", "en", "srcA", 100) for i in range(3)] + [
        (9, "t", "fr", "srcB", 999)
    ]
    _write_tbl(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {
        r["class_size"]: (r["n_classes"], r["n_rows"], r["rows_ppm"])
        for r in m.queries()["privacy_k_anonymity"](spark, str(tmp_path)).collect()
    }
    assert out == {"1": (1, 1, 250000), "2-4": (1, 3, 750000)}


def test_session_funnel_semantics(spark, tmp_path):
    """A view->click->purchase chain inside one 30-min session converts;
    the same chain split across a >30-min gap does not; a click BEFORE
    the view does not count."""
    import datetime as dt
    import __spark_entry__ as m

    t0 = dt.datetime(2025, 1, 1, 12, 0, 0)
    mi = dt.timedelta(minutes=1)
    rows = [
        # u1: full chain in-session -> converts
        (1, t0, 1, "view", 0.0, "{}"),
        (2, t0 + 2 * mi, 1, "click", 0.0, "{}"),
        (3, t0 + 5 * mi, 1, "purchase", 1.0, "{}"),
        # u2: purchase in a LATER session (45-min gap) -> no conversion
        (4, t0, 2, "view", 0.0, "{}"),
        (5, t0 + 2 * mi, 2, "click", 0.0, "{}"),
        (6, t0 + 47 * mi, 2, "purchase", 1.0, "{}"),
        # u3: click precedes the view -> stage 2 never reached
        (7, t0, 3, "click", 0.0, "{}"),
        (8, t0 + 1 * mi, 3, "view", 0.0, "{}"),
        (9, t0 + 2 * mi, 3, "purchase", 1.0, "{}"),
    ]
    _write_tbl(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    r = m.queries()["events_session_funnel"](spark, str(tmp_path)).collect()[0]
    # sessions with a view: u1, u2 (first session), u3 = 3... u2's second
    # session has no view, u3's session HAS a view (after the click)
    assert r["n_sessions_view"] == 3
    assert r["n_click_after_view"] == 2   # u1 and u2 (u2 converts stage 2
    # in-session; only its purchase falls into the later session)
    assert r["n_purchase_after_click"] == 1
    assert r["session_conversion"] == round(1 / 3, 6)


def test_hourly_percentiles_semantics(spark, tmp_path):
    """Discrete percentiles pick actual values: for 1..20 in one hour,
    P50 = 10 (ceil(0.5*20)) and P95 = 19 (ceil(0.95*20)); a second hour
    with 3 values picks its own middle."""
    import datetime as dt
    import __spark_entry__ as m

    t0 = dt.datetime(2025, 1, 1, 8, 30, 0)
    rows = [
        (i, t0, 1, "view", float(i), "{}") for i in range(1, 21)
    ] + [
        (100 + j, t0 + dt.timedelta(hours=1), 1, "view", float(j * 7), "{}")
        for j in (1, 2, 3)
    ]
    _write_tbl(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    out = {
        str(r["hour"]): (r["n_events"], r["p50_value"], r["p95_value"])
        for r in m.queries()["events_hourly_percentiles"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out["2025-01-01 08:00:00"] == (20, 10.0, 19.0)
    assert out["2025-01-01 09:00:00"] == (3, 14.0, 21.0)


def test_basket_lift_semantics(spark, tmp_path):
    """Lift is the exact rational N*c_ab/(c_a*c_b): parts 1,2 always
    co-occur (lift = N/c since marginals equal c_ab) and out-lift a
    chance pair; pairs under the support floor are absent."""
    import __spark_entry__ as m

    rows = []
    for o in range(1, 5):           # parts 1,2 in all 4 orders
        rows += [(o, 1, o), (o, 2, o)]
    rows += [(1, 3, 99), (2, 3, 98)]  # part 3 in orders 1,2
    rows += [(3, 4, 97)]              # part 4 only once -> floor kills pairs
    li = [
        (o, p, 1, ln, 1.0, 10.0, 0.0, 0.0, "N", "O", "1995-01-01")
        for (o, p, ln) in rows
    ]
    _write_tbl(
        spark, tmp_path, "lineitem", li,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate string",
    )
    out = {
        (r["part_a"], r["part_b"]): r
        for r in m.queries()["basket_lift_topk"](spark, str(tmp_path)).collect()
    }
    assert out[(1, 2)]["lift"] == 4 * 4 / (4 * 4)          # = 1.0, c_ab=4
    assert out[(1, 3)]["lift"] == 4 * 2 / (4 * 2)          # 1.0 too
    assert out[(1, 2)]["c_ab"] == 4 and out[(1, 3)]["c_ab"] == 2
    assert not any(4 in k for k in out)                    # floor applied


def test_pareto_frontier_2d_matches_bruteforce(spark):
    """The monotone 2-D factorization must equal the textbook O(n²)
    dominance test on a frame with every edge case: ties on one
    metric, ties on BOTH metrics (mutually non-dominating — all
    survive), duplicated frontier points, and strictly interior rows."""
    from warp_spark.stats import pareto_frontier_2d

    rows = [
        (0, 10, 1), (1, 9, 5), (2, 9, 5),    # tie on both -> both survive
        (3, 8, 7), (4, 8, 3),                # equal m1, smaller m2 dominated
        (5, 5, 7),                            # dominated by (3): m1 8>=5, m2 ==7? 7>=7 strict in m1
        (6, 3, 9), (7, 1, 1),                # (7) interior
        (8, 10, 1),                           # duplicate of (0)
    ]
    df = spark.createDataFrame(rows, "id long, m1 long, m2 long")
    got = sorted(
        r["id"] for r in pareto_frontier_2d(df, "m1", "m2").collect()
    )
    # brute force: survive iff no other row weakly dominates with a strict edge
    def dom(a, b):  # a dominates b
        return a[1] >= b[1] and a[2] >= b[2] and (a[1] > b[1] or a[2] > b[2])

    want = sorted(r[0] for r in rows if not any(dom(o, r) for o in rows if o[0] != r[0]))
    assert got == want
    assert 1 in got and 2 in got          # both-metric ties both survive
    assert 5 not in got and 7 not in got  # interior rows gone


def test_changepoint_cusum_finds_injected_shift(spark, tmp_path):
    """A level shift in the hourly series must put the |CUSUM| peak at
    the last pre-shift hour, and the scaled statistic must equal
    n·prefix − i·total recomputed in Python exactly."""
    import datetime

    import __spark_entry__ as m

    rows = []
    eid = 0
    for h in range(12):
        val = 10.0 if h < 6 else 110.0   # shift after hour 5
        for j in range(4):
            rows.append(
                (eid, datetime.datetime(2024, 1, 1, h, 5 * j), 1, "view", val, "{}")
            )
            eid += 1
    _write_tbl(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    out = m.queries()["events_changepoint_cusum"](spark, str(tmp_path)).collect()
    assert len(out) == 12
    xs = [r["x_cents"] for r in out]
    n, total = len(xs), sum(xs)
    prefix = 0
    for i, r in enumerate(out, start=1):
        prefix += xs[i - 1]
        assert r["cusum_scaled"] == n * prefix - i * total
    peaks = [i for i, r in enumerate(out) if r["is_peak"]]
    assert peaks == [5]  # last pre-shift hour (0-indexed)


def test_l_diversity_semantics(spark, tmp_path):
    """Class sizes and l-counts are exact: a class whose members share
    one sensitive value reports l=1 regardless of k."""
    import __spark_entry__ as m

    rows = [
        # class (srcA, en, 0): doc_ids 0,8,16 -> topic 0,0,0 => l=1, c=3
        (0, "t", "en", "srcA", 10), (8, "t", "en", "srcA", 10),
        (16, "t", "en", "srcA", 10),
        # class (srcB, en, 0): doc_ids 1,2 -> topics 1,2 => l=2, c=2
        (1, "t", "en", "srcB", 20), (2, "t", "en", "srcB", 20),
    ]
    _write_tbl(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r["l"]: r for r in m.queries()["privacy_l_diversity"](spark, str(tmp_path)).collect()}
    assert out[1]["n_classes"] == 1 and out[1]["n_rows"] == 3
    assert out[2]["n_classes"] == 1 and out[2]["n_rows"] == 2
    assert out[1]["corpus_min_l"] == 1 and out[2]["corpus_min_l"] == 1
    assert out[1]["rows_ppm"] == 3 * 1_000_000 // 5


def test_seasonal_dow_isodow_arithmetic(spark):
    """((epoch_day + 3) mod 7) + 1 must equal Python's isoweekday for a
    full spread of dates (engine-neutral dow was the design point)."""
    import datetime

    days = [datetime.date(2024, 1, 1) + datetime.timedelta(days=i) for i in range(45)]
    df = spark.createDataFrame([(d,) for d in days], "day date")
    from pyspark.sql import functions as F

    got = df.select(
        "day",
        ((F.datediff("day", F.lit("1970-01-01").cast("date")) + 3) % 7 + 1).alias("dw"),
    ).collect()
    for r in got:
        assert r["dw"] == r["day"].isoweekday(), r


def test_anomaly_mad_flags_injected_outlier(spark, tmp_path):
    """One huge hour must be flagged while leaving the median/MAD of
    the quiet hours untouched (the robustness a z-score lacks: the
    outlier would inflate mean and stddev and could mask itself)."""
    import datetime

    import __spark_entry__ as m

    rows, eid = [], 0
    for h in range(11):
        rows.append((eid, datetime.datetime(2024, 1, 1, h), 1, "view", 10.0 + (h % 3), "{}"))
        eid += 1
    rows.append((eid, datetime.datetime(2024, 1, 1, 11), 1, "view", 9000.0, "{}"))
    _write_tbl(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    out = m.queries()["events_anomaly_mad"](spark, str(tmp_path)).collect()
    flagged = [r for r in out if r["is_anomaly"]]
    assert [r["cents"] for r in flagged] == [900000]
    quiet = [r for r in out if not r["is_anomaly"]]
    assert all(r["med_cents"] == 1100 for r in out)   # lower median of 10,11,12-ish
    assert all(r["mad_cents"] == 100 for r in out)
    assert len(quiet) == 11


def test_hhi_monopoly_and_uniform(spark, tmp_path):
    """A single-supplier nation scores HHI = 10^12 exactly; four equal
    suppliers score 4·250000² = 2.5·10^11."""
    import __spark_entry__ as m

    sup = [(1, 0), (2, 1), (3, 1), (4, 1), (5, 1)]  # nation 0: monopoly
    li = []
    lk = 0
    for s in (1,):                      # nation 0, one supplier
        li.append((lk, 0, s, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", "1995-01-01")); lk += 1
    for s in (2, 3, 4, 5):              # nation 1, four equal suppliers
        li.append((lk, 0, s, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", "1995-01-01")); lk += 1
    _write_tbl(
        spark, tmp_path, "lineitem",
        [(r[0], r[2], r[2], r[3], r[4], r[5], r[6], r[7], r[8], r[9], r[10]) for r in li],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string, l_shipdate string",
    )
    _write_tbl(spark, tmp_path, "supplier",
               [(s, n) for s, n in sup], "s_suppkey long, s_nationkey long")
    _write_tbl(spark, tmp_path, "nation",
               [(0, "MONO"), (1, "QUAD")], "n_nationkey long, n_name string")
    out = {r["n_name"]: r for r in
           m.queries()["market_concentration_hhi"](spark, str(tmp_path)).collect()}
    assert out["MONO"]["hhi_ppm2"] == 1_000_000 ** 2
    assert out["MONO"]["top_share_ppm"] == 1_000_000
    assert out["QUAD"]["hhi_ppm2"] == 4 * 250_000 ** 2
    assert out["QUAD"]["n_suppliers"] == 4


def test_readability_vowel_groups(spark, tmp_path):
    """Maximal vowel runs count once each; the scaled ratio is the
    exact integer division."""
    import __spark_entry__ as m

    rows = [(0, "queue beat rhythm", "en", "s", 17)]
    # queue: ueue -> 1 run; beat: ea -> 1; rhythm: y -> 1  => 3 runs, 3 words
    _write_tbl(spark, tmp_path, "documents", rows,
               "doc_id long, text string, lang string, source string, n_chars long")
    r = m.queries()["text_readability"](spark, str(tmp_path)).collect()[0]
    assert r["n_words"] == 3 and r["n_vowel_groups"] == 3
    assert r["syll_per_100w_milli"] == 3 * 100000 // 3
    assert r["complexity"] == "simple"


def test_holt_linear_recurrence_exact(spark):
    """The fold must equal the recurrence computed in Python float64
    step-for-step (alpha=beta=0.5 halvings), and a perfectly linear
    series must converge toward its slope with forecast_next = l + b."""
    import datetime

    from warp_spark.streaming.windows import holt_linear

    xs = [10.0, 20.0, 30.0, 40.0, 50.0]
    rows = [
        (i, datetime.datetime(2024, 1, 1, 0, i), 7, "purchase", x, "{}")
        for i, x in enumerate(xs)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = sorted(
        holt_linear(df, "ts", "user_id", "value").collect(),
        key=lambda r: r["event_id"],
    )
    l, b = xs[0], 0.0
    want = [(l, b)]
    for x in xs[1:]:
        ln = 0.5 * x + 0.5 * (l + b)
        b = 0.5 * (ln - l) + 0.5 * b
        l = ln
        want.append((l, b))
    for r, (wl, wb) in zip(got, want):
        assert r["level"] == wl and r["trend"] == wb      # bit-exact
        assert r["forecast_next"] == wl + wb
    assert abs(got[-1]["trend"] - 10.0) < 3.0             # approaching slope


def test_png_histogram_matches_decode(spark, tmp_path):
    """Per-(doc, bin) counts must equal numpy's bincount of the decoded
    pixels; empty bins are absent; counts sum to the pixel count."""
    import numpy as np

    import __spark_entry__ as m
    from warp_spark.pipeline.codecs import decode_png, synth_png_payloads

    rows = [(i, "t", "en", "s", 10) for i in range(5)]
    _write_tbl(spark, tmp_path, "documents", rows,
               "doc_id long, text string, lang string, source string, n_chars long")
    out = m.queries()["multimodal_image_histogram"](spark, str(tmp_path)).collect()
    docs = spark.read.parquet(f"{tmp_path}/documents.parquet")
    payloads = {r["doc_id"]: bytes(r["payload"])
                for r in synth_png_payloads(docs).collect()}
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], {})[r["bin"]] = r["n_px"]
    for did, payload in payloads.items():
        flat = decode_png(payload).reshape(-1).astype(np.int64)
        counts = np.bincount(flat // 16, minlength=16)
        want = {b: int(c) for b, c in enumerate(counts) if c}
        assert got[did] == want
        assert sum(got[did].values()) == flat.size


def test_time_to_conversion_semantics(spark, tmp_path):
    """Converting users report exact µs lag from first exposure to
    first purchase; never-converting users are absent; a purchase as
    the very first event reports lag 0."""
    import datetime

    import __spark_entry__ as m

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (0, t0, 1, "view", 1.0, "{}"),
        (1, t0 + datetime.timedelta(microseconds=1500), 1, "purchase", 5.0, "{}"),
        (2, t0, 2, "view", 1.0, "{}"),                      # never converts
        (3, t0, 3, "purchase", 2.0, "{}"),                  # instant convert
    ]
    _write_tbl(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    out = {r["user_id"]: r for r in
           m.queries()["events_time_to_conversion"](spark, str(tmp_path)).collect()}
    assert set(out) == {1, 3}
    assert out[1]["latency_us"] == 1500
    assert out[3]["latency_us"] == 0


def test_fulfillment_latency_histogram_picks(spark, tmp_path):
    """The bounded-histogram percentile pick must implement
    quantile_disc exactly: smallest value whose cumulative count
    reaches ceil(q·n) — checked on an even-n group where lower/upper
    middle differ."""
    import datetime

    import __spark_entry__ as m

    od = datetime.datetime(1995, 1, 1)
    lats = [1, 2, 3, 10]  # n=4: p50 -> ceil(2)=2nd smallest = 2; p95 -> ceil(3.8)=4th = 10
    orders = [(k, od, "1-URGENT") for k in range(4)]
    li = [(k, od + datetime.timedelta(days=lats[k])) for k in range(4)]
    _write_tbl(spark, tmp_path, "orders", orders,
               "o_orderkey long, o_orderdate timestamp_ntz, o_orderpriority string")
    _write_tbl(spark, tmp_path, "lineitem", li,
               "l_orderkey long, l_shipdate timestamp_ntz")
    r = m.queries()["orders_fulfillment_latency"](spark, str(tmp_path)).collect()[0]
    assert (r["n_lines"], r["min_days"], r["p50_days"], r["p95_days"], r["max_days"]) == (
        4, 1, 2, 10, 10
    )


def test_vocab_coverage_semantics(spark, tmp_path):
    """Thresholds are powers of two plus the vocab closer; cum at a
    threshold is the sum of the k largest gram counts regardless of
    tiebreak; the last row covers everything (ppm = 1e6)."""
    import __spark_entry__ as m

    rows = [
        (0, "a b c a b c a b c", "en", "s", 17),   # grams: abc x3? (3-gram windows)
        (1, "a b c d e", "en", "s", 9),
        (2, "x y z", "en", "s", 5),
    ]
    _write_tbl(spark, tmp_path, "documents", rows,
               "doc_id long, text string, lang string, source string, n_chars long")
    out = m.queries()["text_vocab_coverage"](spark, str(tmp_path)).collect()
    ks = [r["k_top_grams"] for r in out]
    # vocab: doc0 windows: abc,bca,cab,abc,bca,cab,abc -> types abc,bca,cab
    # doc1: abc,bcd,cde ; doc2: xyz  => types {abc,bca,cab,bcd,cde,xyz} = 6
    assert ks == [1, 2, 4, 6]
    total = out[0]["total_instances"]
    assert total == 7 + 3 + 1  # instances: doc0 7 windows, doc1 3, doc2 1
    # top-1 gram is abc with 4 instances (3 from doc0 + 1 from doc1)
    assert out[0]["covered_instances"] == 4
    assert out[-1]["covered_instances"] == total
    assert out[-1]["coverage_ppm"] == 1_000_000
    # monotone non-decreasing coverage
    cums = [r["covered_instances"] for r in out]
    assert cums == sorted(cums)


def test_inactivity_churn_threshold(spark, tmp_path):
    """Idle gap is exact µs against the corpus max; the 12 h threshold
    splits users strictly-greater-than."""
    import datetime

    import __spark_entry__ as m

    t0 = datetime.datetime(2024, 1, 10, 12, 0, 0)
    rows = [
        (0, t0, 1, "view", 1.0, "{}"),                                  # frontier user
        (1, t0 - datetime.timedelta(hours=12), 2, "view", 1.0, "{}"),   # exactly 12h: NOT churned
        (2, t0 - datetime.timedelta(hours=12, microseconds=1), 3, "view", 1.0, "{}"),
    ]
    _write_tbl(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    out = {r["user_id"]: r for r in
           m.queries()["events_inactivity_churn"](spark, str(tmp_path)).collect()}
    assert not out[1]["churned"] and out[1]["idle_us"] == 0
    assert not out[2]["churned"] and out[2]["idle_us"] == 12 * 3600 * 1_000_000
    assert out[3]["churned"] and out[3]["idle_us"] == 12 * 3600 * 1_000_000 + 1


def test_engagement_gini_extremes(spark, tmp_path):
    """Uniform counts score exactly 0; heavy concentration approaches 1
    — both verified against the closed rank form by hand."""
    import datetime

    import __spark_entry__ as m

    t0 = datetime.datetime(2024, 1, 1)

    def run(counts):
        rows, eid = [], 0
        for uid, c in enumerate(counts):
            for _ in range(c):
                rows.append((eid, t0, uid, "view", 1.0, "{}"))
                eid += 1
        _write_tbl(
            spark, tmp_path, "events", rows,
            "event_id long, ts timestamp_ntz, user_id long, event_type string,"
            " value double, props string",
        )
        return m.queries()["events_engagement_gini"](spark, str(tmp_path)).collect()[0]

    r = run([5, 5, 5, 5])
    assert r["gini_ppm"] == 0
    r = run([1, 1, 1, 97])
    # s = 1+2+3+4*97 = 394; (2*394 - 5*100)*1e6 // (4*100) = 288e6 // 400
    assert r["gini_ppm"] == (2 * 394 - 5 * 100) * 1_000_000 // (4 * 100)
    assert r["rank_weighted_sum"] == 394


def test_audio_energy_matches_decode(spark, tmp_path):
    """Energy/peak/loud-count must equal numpy over the decoded
    samples — the kernel is audited against the real codec, the oracle
    against the generation rule."""
    import numpy as np

    import __spark_entry__ as m
    from warp_spark.pipeline.codecs import decode_wav, synth_wav_payloads

    rows = [(i, "t", "en", "s", 10) for i in range(7)]
    _write_tbl(spark, tmp_path, "documents", rows,
               "doc_id long, text string, lang string, source string, n_chars long")
    out = {r["doc_id"]: r for r in
           m.queries()["multimodal_audio_energy"](spark, str(tmp_path)).collect()}
    docs = spark.read.parquet(f"{tmp_path}/documents.parquet")
    for r in synth_wav_payloads(docs).collect():
        s, _ = decode_wav(bytes(r["payload"]))
        flat = s.reshape(-1).astype(np.int64)
        got = out[r["doc_id"]]
        assert got["energy"] == int((flat * flat).sum())
        assert got["peak"] == int(np.abs(flat).max())
        assert got["n_loud"] == int((np.abs(flat) >= 1000).sum())
        assert got["n_samples"] == flat.size


def test_jaccard_links_semantics(spark):
    """A path x–a–y predicts (x, y) with cn=1, union=1 (ppm 10^6);
    adjacent pairs are excluded; a square predicts both diagonals."""
    from warp_spark.pipeline.graph import jaccard_links

    # square 1-2-3-4-1: diagonals (1,3) and (2,4) share 2 neighbors
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    out = {(r["x"], r["y"]): r for r in jaccard_links(edges, k=10).collect()}
    assert set(out) == {(1, 3), (2, 4)}
    for r in out.values():
        assert r["cn"] == 2 and r["un"] == 2 and r["jacc_ppm"] == 1_000_000

    # path x(10)-a(11)-y(12): predict (10, 12) only
    edges = spark.createDataFrame([(10, 11), (11, 12)], "src long, dst long")
    out = jaccard_links(edges, k=10).collect()
    assert [(r["x"], r["y"], r["cn"], r["un"], r["jacc_ppm"]) for r in out] == [
        (10, 12, 1, 1, 1_000_000)
    ]


def test_jaccard_links_hub_cap_bounds_census(spark):
    """The max_center_degree valve (r10 verdict finding 1) must be a
    REAL bound: on a star-skewed graph, (a) pairs whose only common
    neighbor is the super-hub vanish under the cap while low-degree
    structure survives with unchanged scores, and (b) the wedge census
    the self-join actually generates is ≤ C(cap, 2) · |surviving
    centers| — the hub's quadratic blowup never reaches the join."""
    from pyspark.sql import functions as F

    from warp_spark.pipeline.graph import jaccard_links

    # hub 0 touches 40 leaves (1..40); separately a path 100-101-102
    # whose center (101) has degree 2.
    hub_edges = [(0, i) for i in range(1, 41)]
    edges = spark.createDataFrame(
        hub_edges + [(100, 101), (101, 102)], "src long, dst long"
    )

    # Uncapped: every leaf pair (i, j) is predicted through the hub —
    # C(40, 2) = 780 pairs — plus (100, 102) through the path center.
    uncapped = jaccard_links(edges, k=1000).collect()
    assert len(uncapped) == 780 + 1

    # Cap 10 < deg(hub)=40: hub wedges are gone; deg(101)=2 survives.
    capped = jaccard_links(edges, k=1000, max_center_degree=10).collect()
    assert [(r["x"], r["y"], r["cn"], r["un"], r["jacc_ppm"]) for r in capped] == [
        (100, 102, 1, 1, 1_000_000)
    ]

    # The census bound itself: replay the capped wedge self-join and
    # count the rows it generates — must be ≤ C(cap, 2) per surviving
    # center, and must exclude the hub's 780 wedges entirely.
    cap = 10
    u, v = F.col("src"), F.col("dst")
    und = (
        edges.select(F.least(u, v).alias("u"), F.greatest(u, v).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = und.union(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy(F.col("u").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    ok = deg.where(F.col("deg") <= cap).select(F.col("node").alias("u"))
    base = sym.join(ok, "u")
    w1 = base.select(F.col("u").alias("a"), F.col("v").alias("x"))
    w2 = base.select(F.col("u").alias("a"), F.col("v").alias("y"))
    census = w1.join(w2, "a").where(F.col("x") < F.col("y")).count()
    n_centers = ok.count()
    assert census <= cap * (cap - 1) // 2 * n_centers
    assert census == 1  # only 101 generates a wedge; 780 hub wedges gone


def test_resource_allocation_links_semantics(spark):
    """RA scores are exact integer sums of 10^6 DIV deg(center): a
    square's diagonal collects two degree-2 centers (2 x 500000); a
    path's endpoints collect one (500000); under the hub cap a pair
    whose only common neighbor is the hub vanishes while niche
    structure keeps its exact score."""
    from warp_spark.pipeline.graph import resource_allocation_links

    # square 1-2-3-4-1: diagonals (1,3),(2,4) via two deg-2 centers
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    out = {
        (r["x"], r["y"]): r
        for r in resource_allocation_links(edges, k=10).collect()
    }
    assert set(out) == {(1, 3), (2, 4)}
    for r in out.values():
        assert r["cn"] == 2 and r["ra_ppm"] == 1_000_000

    # hub 0 over leaves 1..30 plus path 100-101-102: cap kills the
    # hub's C(30,2) pairs, keeps (100,102) at exactly 500000
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 31)] + [(100, 101), (101, 102)],
        "src long, dst long",
    )
    capped = resource_allocation_links(edges, k=1000, max_center_degree=10).collect()
    assert [(r["x"], r["y"], r["cn"], r["ra_ppm"]) for r in capped] == [
        (100, 102, 1, 500_000)
    ]
    uncapped = resource_allocation_links(edges, k=1000).collect()
    # leaf pairs through the deg-30 hub score 10^6 DIV 30 = 33333
    assert len(uncapped) == 30 * 29 // 2 + 1
    hub_pair = [r for r in uncapped if (r["x"], r["y"]) == (1, 2)][0]
    assert hub_pair["ra_ppm"] == 33_333


def test_dedup_index_append_equals_rebuild(spark, tmp_path):
    """Append-then-probe must equal full-rebuild-then-probe EXACTLY
    (r11 verdict item 4): the dedup_index_append entry builds a base
    index (doc_id%20<12), absorbs the 12..15 slice via
    append_dedup_index, and probes — the result must be bit-identical
    to probing the one-shot standing index (dedup_index_probe).  Also
    pins the degrade path: an artifact whose build-time cap fired
    refuses the append (returns False) instead of silently diverging
    from rebuild semantics."""
    import __spark_entry__ as m
    from warp_spark.pipeline.dedup import append_dedup_index, persist_dedup_index

    key = lambda r: (r["doc_id"], r["dup_of"], r["best_jaccard"], r["is_dup"])  # noqa: E731
    appended = sorted(map(key, m.queries()["dedup_index_append"](spark, SF).collect()))
    oneshot = sorted(map(key, m.queries()["dedup_index_probe"](spark, SF).collect()))
    assert appended == oneshot and len(appended) > 0

    # degrade path: cap=0 drops every posting at build time — the row
    # count no longer equals docs × bands-per-doc, so append refuses
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, "one two three four five six")],
        "doc_id long, text string",
    )
    p = str(tmp_path / "idx")
    persist_dedup_index(docs, p, max_corpus_bucket=0)
    new = spark.createDataFrame(
        [(3, "seven eight nine ten eleven twelve")], "doc_id long, text string"
    )
    assert append_dedup_index(spark, p, new) is False


def test_wedge_census_artifact_equals_inquery(spark, tmp_path):
    """The persisted wedge census (r11 verdict item 2) must feed BOTH
    capped scorers to results identical to the direct census-in-query
    computation — one quadratic pass serving two entries is only an
    optimization if it is invisible in the values — and the catalog's
    wedge stamp must CHAIN the edge artifact's content stamp (an edge
    content change at unchanged cardinality rebuilds the census)."""
    import os

    from pyspark.sql import functions as F  # noqa: F401

    import warp_spark.catalog as cat
    from warp_spark.pipeline.graph import (
        jaccard_links,
        load_wedge_census,
        persist_wedge_census,
        resource_allocation_links,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5), (5, 1), (5, 6)],
        "src long, dst long",
    )
    p = str(tmp_path / "wedges")
    persist_wedge_census(edges, p, max_center_degree=3)
    census = load_wedge_census(spark, p)
    key = lambda r: tuple(r[c] for c in sorted(r.asDict()))  # noqa: E731
    for fn in (jaccard_links, resource_allocation_links):
        direct = sorted(map(key, fn(edges, k=100, max_center_degree=3).collect()))
        fed = sorted(
            map(key, fn(edges, k=100, max_center_degree=3, census=census).collect())
        )
        assert fed == direct and len(fed) > 0

    # chain-stamp: rewriting lineitem content (same cardinality) flips
    # the edge stamp, which must flip the wedge stamp through the chain
    # — assert BOTH artifacts rebuild, end-to-end (r12 verdict item 6)
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)

    def write_li(rows):
        spark.createDataFrame(
            rows, "l_orderkey long, l_partkey long"
        ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/lineitem.parquet")

    def edge_stamp():
        path = cat._ensure_graph_edges(spark, sf)
        with open(os.path.join(path, "_EDGES_COMPLETE")) as f:
            return f.read().strip()

    def wedge_stamp():
        path = cat._ensure_graph_wedges(spark, sf)
        with open(os.path.join(path, "_WEDGES_COMPLETE")) as f:
            return f.read().strip()

    write_li([(1, 10), (1, 11), (2, 11), (2, 12)])
    e_a, w_a = edge_stamp(), wedge_stamp()
    write_li([(1, 10), (1, 11), (2, 11), (2, 13)])
    e_b, w_b = edge_stamp(), wedge_stamp()
    assert e_a != e_b  # edge artifact rebuilt on content change
    assert w_a != w_b  # ...and the wedge artifact followed the chain
    assert (edge_stamp(), wedge_stamp()) == (e_b, w_b)  # idempotent


def test_persist_edges_roundtrip_and_content_stamp(spark, tmp_path):
    """persist_edges canonicalizes (u<v, no loops, no dups) at write
    time and load_edges round-trips the exact set; the catalog's
    _ensure_graph_edges stamp must key on CONTENT, not just row count
    — a same-cardinality content change rebuilds (the r10 ADVICE
    staleness discipline)."""
    from pyspark.sql import functions as F

    from warp_spark.pipeline.graph import load_edges, persist_edges

    edges = spark.createDataFrame(
        # dup (1,2) both ways, a self-loop, and (3,4)
        [(1, 2), (2, 1), (5, 5), (4, 3)],
        "src long, dst long",
    )
    p = str(tmp_path / "edges")
    persist_edges(edges, p)
    got = sorted(
        (r["src"], r["dst"]) for r in load_edges(spark, p).collect()
    )
    assert got == [(1, 2), (3, 4)]

    # content-fingerprint stamp, tested BEHAVIORALLY against the real
    # helper (r11 ADVICE: no replicated arithmetic, no source-string
    # matching): run _ensure_graph_edges on a tmp sf_dir, rewrite the
    # lineitem data at the SAME cardinality with different keys, run it
    # again — the marker stamp must differ (the rebuild trigger), which
    # also exercises the part-file stat signature (an overwrite changes
    # only files INSIDE lineitem.parquet/, never the sf_dir itself).
    import os

    import warp_spark.catalog as cat

    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)

    def write_li(rows):
        spark.createDataFrame(
            rows, "l_orderkey long, l_partkey long"
        ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/lineitem.parquet")

    def stamp():
        path = cat._ensure_graph_edges(spark, sf)
        with open(os.path.join(path, "_EDGES_COMPLETE")) as f:
            return f.read().strip()

    write_li([(1, 10), (1, 11)])
    s_a = stamp()
    write_li([(1, 10), (1, 12)])  # same cardinality, different keys
    s_b = stamp()
    assert s_a != s_b
    # idempotence: unchanged content reuses the stamp (no rebuild churn)
    assert stamp() == s_b
    # and the rebuilt artifact reflects the NEW content
    got2 = sorted(
        (r["src"], r["dst"])
        for r in load_edges(spark, cat._graph_edges_path(sf)).collect()
    )
    assert got2 == [(10, 12)]


def test_pq_reconstruction_matches_numpy(spark):
    """The audit kernel's cosine must equal a driver-side numpy
    reconstruction for every vector, and corrupting a code must lower
    that vector's cosine."""
    import numpy as np

    from warp_spark.catalog import _ensure_ann_index, _t
    from warp_spark.pipeline.similarity import (
        load_ivfpq_index,
        pq_reconstruction,
    )

    sf = "/root/testdata/sf0.001"
    path = _ensure_ann_index(spark, sf)
    _c, codebooks, codes, storage = load_ivfpq_index(spark, path)
    got = {r["vec_id"]: r["recon_cos"]
           for r in pq_reconstruction(codes, storage, codebooks).collect()}
    books = np.stack([np.array(b, dtype=np.float64) for b in codebooks])
    rows = codes.join(
        storage, codes["neighbor_id"] == storage["vec_id"]
    ).select("vec_id", "codes", "embedding").limit(25).collect()
    for r in rows:
        x = np.array(r["embedding"], dtype=np.float64)
        x = x / np.linalg.norm(x)
        rec = np.concatenate([books[j][c] for j, c in enumerate(r["codes"])])
        want = round(float(x @ rec / np.linalg.norm(rec)), 6)
        assert got[r["vec_id"]] == want
        bad = list(r["codes"])
        bad[0] = (bad[0] + 16) % 32
        rec_bad = np.concatenate([books[j][c] for j, c in enumerate(bad)])
        assert float(x @ rec_bad / np.linalg.norm(rec_bad)) < want


def test_open_backlog_event_diff(spark, tmp_path):
    """+1/−1 census: overlapping orders stack, the day after the last
    close returns to zero, and an order open-and-closed the same day
    contributes +1 that day and −1 the next."""
    import datetime

    import __spark_entry__ as m

    d = lambda s: datetime.datetime(2024, 1, s)  # noqa: E731
    orders = [(1, d(1)), (2, d(2)), (3, d(2))]
    li = [(1, d(3)), (2, d(2)), (3, d(5))]  # order1 open 1-3, order2 2-2, order3 2-5
    _write_tbl(spark, tmp_path, "orders", orders,
               "o_orderkey long, o_orderdate timestamp_ntz")
    _write_tbl(spark, tmp_path, "lineitem", li,
               "l_orderkey long, l_shipdate timestamp_ntz")
    out = {str(r["day"]): r for r in
           m.queries()["orders_open_backlog"](spark, str(tmp_path)).collect()}
    assert out["2024-01-01"]["backlog"] == 1
    assert out["2024-01-02"]["backlog"] == 3      # all three open
    assert out["2024-01-03"]["backlog"] == 2      # order2 closed (1st..2nd)
    assert out["2024-01-04"]["backlog"] == 1      # order1 closed after 3rd
    assert out["2024-01-06"]["backlog"] == 0      # order3 closed after 5th
    assert out["2024-01-02"]["n_opened"] == 2


def test_dau_wau_cover_explode(spark, tmp_path):
    """WAU at day d counts users active in [d-6, d]; stickiness is the
    exact ppm ratio; a user active once stays in WAU for 7 days."""
    import datetime

    import __spark_entry__ as m

    t = lambda s, u: (s * 100 + u, datetime.datetime(2024, 1, s), u, "view", 1.0, "{}")  # noqa: E731
    rows = [t(1, 1), t(1, 2), t(8, 1)]  # u2 active only day 1; u1 days 1 and 8
    _write_tbl(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    out = {str(r["day"]): r for r in
           m.queries()["events_dau_wau_stickiness"](spark, str(tmp_path)).collect()}
    # only days with DAU>0 emit (inner join): Jan 1 and Jan 8
    assert set(out) == {"2024-01-01", "2024-01-08"}
    assert out["2024-01-01"]["dau"] == 2 and out["2024-01-01"]["wau"] == 2
    # on Jan 8, day-1 actives have aged out of the trailing window (1+6=7 < 8)
    assert out["2024-01-08"]["dau"] == 1 and out["2024-01-08"]["wau"] == 1
    assert out["2024-01-01"]["stickiness_ppm"] == 1_000_000


def test_prefix_sum_global_matches_spark_window(spark):
    """The decimal-exact two-phase global cumsum (_prefix_sum_global,
    the parts_abc backbone) must equal Spark's own un-partitioned
    running-sum window — including descending order keys, ties broken
    by id, and frames smaller than the partition count."""
    from pyspark.sql import Window
    from warp_spark.catalog import _prefix_sum_global

    for n in [1, 2, 7, 997]:
        df = spark.range(n).select(
            F.col("id"),
            ((F.col("id") * 37 % 100) + 1).cast("decimal(38,0)").alias("v"),
        )
        keys = [F.col("v").desc(), F.col("id")]
        wkeys = [F.col("v").desc(), F.col("id").asc()]
        w = Window.orderBy(*wkeys).rowsBetween(Window.unboundedPreceding, 0)
        want = {
            r["id"]: int(r["c"])
            for r in df.select("id", F.sum("v").over(w).alias("c")).collect()
        }
        got = {
            r["id"]: int(r["c"])
            for r in _prefix_sum_global(df, keys, "v", "c").collect()
        }
        assert got == want, n


def test_spearman_and_ks_known_values(spark, tmp_path):
    """Pin the two new exact-stats kernels on hand-checkable data by
    running the catalog entries against a synthetic sf_dir: Spearman
    must hit exactly +1 on a perfectly monotone (tie-free) relation,
    and the KS sup-gap must be exact on a two-segment split with a
    known distribution shift."""
    import math

    from warp_spark.catalog import QUERIES

    d = str(tmp_path)
    # lineitem: price = qty * 100 (monotone, tie-free) -> rho = +1
    spark.createDataFrame(
        [(float(q), float(q)) for q in range(1, 41)],
        "l_quantity double, l_extendedprice double",
    ).write.parquet(f"{d}/lineitem.parquet")
    row = QUERIES["stats_spearman_price_qty"](spark, d).collect()[0]
    assert row["n"] == 40 and abs(row["spearman_rho"] - 1.0) < 1e-12

    # orders/customer: BUILDING uniform on {1..4}, MACHINERY all at 4
    # F1(3) = 3/4, F2(3) = 0 -> D = 3/4; cross-multiplied d_scaled =
    # max|n2*C1 - n1*C2| = |4*3 - 4*0| = 12; d_ppm = 750000
    spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([1, 2, 3, 4, 4, 4, 4, 4])],
        "o_custkey long, o_totalprice double",
    ).write.parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        [(i, "BUILDING" if i < 4 else "MACHINERY") for i in range(8)],
        "c_custkey long, c_mktsegment string",
    ).write.parquet(f"{d}/customer.parquet")
    row = QUERIES["stats_ks_two_sample"](spark, d).collect()[0]
    assert (row["n1"], row["n2"]) == (4, 4)
    assert row["d_scaled"] == 12
    assert row["d_ppm"] == math.floor(12 * 1_000_000 / 16)


def test_ivfpq_fused_assign_encode_and_train_equal_two_step(spark):
    """r14 optimization pins: (a) ivfpq_train's single hash-ordered
    draw yields element-for-element the same model as the two-collect
    form (ivf_centroids + pq_codebooks); (b) the fused one-crossing
    ivfpq_assign_encode equals ivf_assign + pq_encode row-for-row."""
    from warp_spark.pipeline.similarity import (
        ivf_assign,
        ivf_centroids,
        ivfpq_assign_encode,
        ivfpq_train,
        pq_codebooks,
        pq_encode,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents, books = ivfpq_train(emb, n_centroids=16, m=16, n_codes=32)
    assert cents == ivf_centroids(emb, n_centroids=16)
    assert books == pq_codebooks(emb, m=16, n_codes=32)

    enc = ivfpq_assign_encode(F.col("embedding"), cents, books)
    fused = {
        r["vec_id"]: (r["e"]["centroid_id"], tuple(r["e"]["codes"]))
        for r in emb.select("vec_id", enc.alias("e")).collect()
    }
    twostep = {
        r["vec_id"]: (r["cid"], tuple(r["c"]))
        for r in emb.select(
            "vec_id",
            ivf_assign(F.col("embedding"), cents).alias("cid"),
            pq_encode(F.col("embedding"), books).alias("c"),
        ).collect()
    }
    assert fused == twostep


def test_profile_columns_equals_wide_aggregate(spark):
    # r15 optimization: profile_columns is now a union of per-column
    # two-phase aggregates instead of one wide multi-countDistinct
    # aggregate (whose Expand re-emits every row once per column).
    # Pin the new shape value- and schema-identical to the old one on
    # data with nulls, duplicates, an all-null column, and mixed types.
    from warp_spark.stats import profile_columns

    df = spark.createDataFrame(
        [
            (1, "a", 2.5, None),
            (2, "a", None, None),
            (3, None, 2.5, None),
            (3, "b", -1.0, None),
            (None, "b", 0.0, None),
        ],
        "k long, s string, v double, z string",
    )
    cols = ["k", "s", "v", "z"]

    def old_shape(d):
        aggs = [F.count(F.lit(1)).alias("__n")]
        for c in cols:
            aggs.extend(
                [
                    F.count(F.col(c)).alias(f"__nn_{c}"),
                    F.countDistinct(F.col(c)).alias(f"__nd_{c}"),
                    F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
                    F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
                ]
            )
        one = d.agg(*aggs)
        rows = [
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_value"),
                F.col(f"__mx_{c}").alias("max_value"),
            )
            for c in cols
        ]
        return one.select(F.explode(F.array(*rows)).alias("r")).select("r.*")

    new = profile_columns(df, cols)
    old = old_shape(df)
    assert new.schema == old.schema
    key = lambda r: r["column_name"]
    assert sorted(map(tuple, new.collect()), key=lambda t: t[0]) == sorted(
        map(tuple, old.collect()), key=lambda t: t[0]
    )
    # spot-check the semantics directly
    got = {r["column_name"]: r for r in new.collect()}
    assert got["k"]["n_rows"] == 5 and got["k"]["n_nulls"] == 1
    assert got["k"]["n_distinct"] == 3 and got["k"]["min_value"] == "1"
    assert got["z"]["n_distinct"] == 0 and got["z"]["min_value"] is None
    assert got["v"]["min_value"] == "-1.0" and got["v"]["max_value"] == "2.5"
