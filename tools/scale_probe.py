#!/usr/bin/env python
"""Empirical scaling probe for the LLM-pipeline operators.

Scales the sf0.1 corpus 1× / 4× / 16× by replicating rows with offset
ids and a per-replica text/vector perturbation (so near-dup structure
stays realistic instead of every replica forming one giant LSH bucket),
then times each operator. Near-linear growth in the times column =
the plan scales; super-linear = a shuffle/skew problem to fix.

Usage: python tools/scale_probe.py [sf_dir]   (writes SCALE.md)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from warp_spark import get_spark  # noqa: E402


def scaled_docs(docs: DataFrame, mult: int) -> DataFrame:
    """mult replicas; each replica perturbs the text head with a replica
    token so replicas are near-dups (realistic) not exact dups."""
    n = docs.count()
    r = docs.crossJoin(F.broadcast(
        docs.sparkSession.range(mult).select(F.col("id").alias("rep"))
    ))
    return r.select(
        (F.col("doc_id") + F.col("rep") * n).alias("doc_id"),
        F.when(F.col("rep") == 0, F.col("text")).otherwise(
            F.concat(F.lit("rep"), F.col("rep").cast("string"), F.lit(" "), F.col("text"))
        ).alias("text"),
    )


def scaled_vecs(emb: DataFrame, mult: int) -> DataFrame:
    """mult replicas; each replica rotates the vector by a tiny
    per-replica epsilon on one coordinate (keeps cosine structure)."""
    n = emb.count()
    r = emb.crossJoin(F.broadcast(
        emb.sparkSession.range(mult).select(F.col("id").alias("rep"))
    ))
    return r.select(
        (F.col("vec_id") + F.col("rep") * n).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: x + (F.col("rep") * 0.001) * (i % 3 - 1)
        ).alias("embedding"),
    )


def scaled_events(ev: DataFrame, mult: int) -> DataFrame:
    """mult replicas on disjoint user_id ranges — key cardinality grows
    with data (the realistic shape for an event stream)."""
    r = ev.crossJoin(F.broadcast(
        ev.sparkSession.range(mult).select(F.col("id").alias("rep"))
    ))
    return r.select(
        (F.col("user_id") + F.col("rep") * 100000).alias("user_id"),
        (F.col("event_id") + F.col("rep") * 100000000).alias("event_id"),
        "ts", "event_type", "value",
    )


def timed(label: str, build, results: list):
    t0 = time.time()
    df = build()
    n = df.count()
    dt = time.time() - t0
    results.append((label, dt, n))
    print(f"  {label:34s} {dt:7.2f}s  rows={n}", flush=True)
    return dt


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale-probe")

    from warp_spark.pipeline.dedup import (
        connected_components_star,
        exact_duplicates,
        minhash_lsh_candidates,
        simhash_near_pairs,
    )
    from warp_spark.pipeline.similarity import (
        brute_force_topk,
        cosine_near_pairs,
        ivf_topk,
        lsh_topk,
        pq_codebooks,
        pq_topk,
    )
    from warp_spark.pipeline.dedup import containment_pairs, incremental_dedup
    from warp_spark.pipeline.packing import pack_chunks
    from warp_spark.pipeline.text import build_vocab, tokenize_ids, winnow_overlap_candidates
    from warp_spark.pipeline.similarity import spherical_kmeans
    from warp_spark.streaming.windows import ewma, trailing_zscore

    from warp_spark.asof import asof_join
    from warp_spark.catalog import _events
    from warp_spark.pipeline.text import analyze

    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    emb0 = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    ev0 = _events(spark, sf_dir).select("user_id", "event_id", "ts", "event_type", "value")

    def asof_enrich(ev: DataFrame) -> DataFrame:
        purchases = ev.filter(F.col("event_type") == "purchase")
        clicks = (
            ev.filter(F.col("event_type") == "click")
            .groupBy("user_id", "ts")
            .agg(F.max("value").alias("click_value"))
        )
        return asof_join(purchases, clicks, on="ts", by="user_id")

    results: list[tuple[str, float, int]] = []
    for mult in (1, 4, 16):
        docs = scaled_docs(docs0, mult).persist()
        emb = scaled_vecs(emb0, mult).persist()
        ev = scaled_events(ev0, mult).persist()
        nd, ne = docs.count(), emb.count()
        nev = ev.count()
        print(f"mult={mult}: {nd} docs, {ne} vectors, {nev} events", flush=True)
        q = emb.filter(F.col("vec_id") < 10)
        # n_blocks grows with corpus so per-group matmuls stay memory-bounded
        nb = max(8, 8 * mult // 2)
        timed(f"exact_dedup x{mult}", lambda: exact_duplicates(docs), results)
        timed(f"minhash_lsh x{mult}", lambda: minhash_lsh_candidates(docs), results)
        timed(f"simhash x{mult}", lambda: simhash_near_pairs(docs), results)
        timed(f"text_analyze x{mult}", lambda: analyze(docs), results)
        timed(f"asof_join x{mult}", lambda: asof_enrich(ev), results)
        timed(f"cosine_near_pairs x{mult}", lambda: cosine_near_pairs(emb, 0.4, n_blocks=nb), results)
        timed(f"ann_bruteforce x{mult}", lambda: brute_force_topk(q, emb), results)
        timed(f"ann_ivf x{mult}", lambda: ivf_topk(q, emb, n_centroids=16, nprobe=4), results)
        timed(f"ann_lsh_mp x{mult}", lambda: lsh_topk(q, emb, num_planes=4, num_tables=8, multi_probe=True), results)
        cb = pq_codebooks(emb)  # train once per scale, reuse (the scale discipline)
        timed(f"ann_pq_rerank x{mult}", lambda: pq_topk(q, emb, rerank=50, codebooks=cb), results)
        timed(f"winnow_overlap x{mult}", lambda: winnow_overlap_candidates(docs), results)
        timed(f"pack_chunks x{mult}", lambda: pack_chunks(docs), results)
        vocab = build_vocab(docs)  # train once per scale, reuse (IVF discipline)
        timed(f"tokenize_ids x{mult}", lambda: tokenize_ids(docs, vocab), results)
        timed(
            f"incremental_dedup x{mult}",
            lambda: incremental_dedup(
                docs.filter(F.col("doc_id") % 5 != 0),
                docs.filter(F.col("doc_id") % 5 == 0),
            ),
            results,
        )
        timed(f"trailing_zscore x{mult}", lambda: trailing_zscore(ev, "ts", "event_type"), results)
        timed(f"ewma x{mult}", lambda: ewma(ev, "ts", "user_id", "value"), results)
        timed(
            f"kmeans_2iter x{mult}",
            lambda: spherical_kmeans(emb, k=8, iters=2)[0],
            results,
        )
        pairs = minhash_lsh_candidates(docs).persist()
        pairs.count()
        timed(f"star_components x{mult}", lambda: connected_components_star(docs, pairs), results)
        timed(f"containment x{mult}", lambda: containment_pairs(docs, pairs), results)
        # --- round-3/4 heavyweights (VERDICT r3 item 7) ---
        from warp_spark.pipeline.dedup import (
            canonical_clusters,
            cluster_representatives,
            ngram_jaccard_pairs,
        )
        from warp_spark.pipeline.text import (
            bigram_lm_scores,
            bloom_contamination,
            bpe_train,
            quality_features,
            train_bloom_filter,
        )
        from warp_spark.pipeline.similarity import quantized_topk
        from warp_spark.stats import exact_corr_matrix

        def keep_best():
            ver = ngram_jaccard_pairs(docs, pairs, threshold=0.5)
            clusters = canonical_clusters(docs, ver)
            scores = docs.select(
                "doc_id",
                quality_features(F.col("text"))["quality_score"].alias("quality_score"),
            )
            return cluster_representatives(clusters, scores)

        timed(f"keep_best x{mult}", keep_best, results)
        timed(f"lm_score x{mult}", lambda: bigram_lm_scores(docs), results)
        timed(
            f"corr_matrix x{mult}",
            lambda: exact_corr_matrix(
                ev,
                {
                    "value": (F.col("value"), 1000),
                    "uid": (F.col("user_id"), 1),
                    "eid": (F.col("event_id"), 1),
                },
            ),
            results,
        )
        bench_docs = docs.filter(F.col("doc_id") % 10 == 0)
        bloom = train_bloom_filter(bench_docs)  # trained artifact, reused
        timed(
            f"bloom_probe x{mult}",
            lambda: bloom_contamination(docs.filter(F.col("doc_id") % 10 != 0), bloom),
            results,
        )
        timed(f"ann_quantized x{mult}", lambda: quantized_topk(q, emb), results)
        # bpe_train returns the merge list (driver artifact) — time the
        # whole train loop (3 iterations; pair counts are vocab-bounded)
        t0 = time.time()
        merges = bpe_train(docs, n_merges=3)
        dt = time.time() - t0
        results.append((f"bpe_train3 x{mult}", dt, len(merges)))
        print(f"  {'bpe_train3 x' + str(mult):34s} {dt:7.2f}s  rows={len(merges)}", flush=True)
        # --- round-4 additions ---
        from warp_spark.pipeline.dedup import prefix_filter_jaccard_pairs
        from warp_spark.sampling import bottomk_sample, kmv_distinct

        timed(
            f"prefix_filter x{mult}",
            lambda: prefix_filter_jaccard_pairs(docs, 0.7, elements="shingles"),
            results,
        )
        timed(
            f"kmv_distinct x{mult}",
            lambda: kmv_distinct(ev, "user_id", group_col="event_type"),
            results,
        )
        timed(f"bottomk_sample x{mult}", lambda: bottomk_sample(docs, "doc_id", 100), results)
        pairs.unpersist()
        docs.unpersist(); emb.unpersist(); ev.unpersist()

    lines = [
        "# SCALE — empirical scaling of the pipeline operators",
        "",
        f"Corpus: `{sf_dir}` documents/embeddings/events replicated with",
        "per-replica perturbation (near-dup-realistic; events get disjoint",
        "user ranges so key cardinality grows with data). local[32]; times",
        "are single runs on a shared box with bursty hypervisor steal —",
        "read the *growth*, not the absolute numbers, and discount",
        "single-cell outliers. Cells are `time (output rows)`.",
        "",
        "| operator | 1× | 4× | 16× | time growth | output growth |",
        "|---|---|---|---|---|---|",
    ]
    by_op: dict[str, list] = {}
    for label, dt, n in results:
        op = label.rsplit(" x", 1)[0]
        by_op.setdefault(op, []).append((dt, n))
    for op, tn in by_op.items():
        ts = [t for t, _ in tn]
        ns = [n for _, n in tn]
        growth = ts[-1] / ts[0] if ts[0] > 0 else float("nan")
        ogrowth = ns[-1] / ns[0] if ns[0] > 0 else float("nan")
        lines.append(
            f"| {op} | {ts[0]:.2f}s ({ns[0]:,}) | {ts[1]:.2f}s ({ns[1]:,}) | "
            f"{ts[2]:.2f}s ({ns[2]:,}) | {growth:.1f}× | {ogrowth:.0f}× |"
        )
    lines += [
        "",
        "How to read it:",
        "",
        "- **Input-linear operators** (exact_dedup, text_analyze, asof_join,",
        "  ann_ivf) stay within ~16× time at 16× data — the plans scale: one",
        "  bounded shuffle, no driver collects, no quadratic candidate blowup.",
        "- **Near-dup pair finders** (minhash_lsh, simhash, cosine_near_pairs)",
        "  have output that is inherently quadratic in duplication depth:",
        "  every replica pairs with every other replica of the same doc, so",
        "  16× replication multiplies *output* ~256×, not 16×. Judge them by",
        "  time-vs-OUTPUT growth — all three produce 260-530× the pairs in",
        "  well under 260× the time, sub-linear per result row.",
        "- **ann_bruteforce** scans corpus×queries by construction (the exact",
        "  recall baseline); `ann_ivf`, `ann_lsh_mp` (8-table multi-probe",
        "  LSH, recall@5 ≈ 0.98-1.0) and `ann_pq_rerank` (product-",
        "  quantized ADC + exact shortlist re-rank, recall@5 0.90-0.98,",
        "  16 B/vector) are the scale paths — flat at constant query",
        "  count; PQ additionally shrinks the scannable corpus ~16×.",
        "- **star_components** (large-star/small-star, Kiveris et al.",
        "  SoCC'14) is timed over the minhash pair graph: O(log²) rounds",
        "  regardless of diameter; min-label propagation remains the",
        "  low-diameter default. Both warn on max_iter truncation.",
        "- **winnow_overlap** (rolling-hash winnowing fingerprints) shares",
        "  the bucket-join shape of the other pair finders — only",
        "  (id, fingerprint) tuples shuffle, never text.",
        "- **pack_chunks** (distributed prefix-sum packing), **tokenize_ids**",
        "  (map-side literal-vocab probe; vocab re-trained per scale) and",
        "  **trailing_zscore** (hourly-grid window) are input-linear by",
        "  construction. **incremental_dedup** expands batch×corpus pairs",
        "  only — time tracks the 20% batch slice, while pair output grows",
        "  with duplication depth like the other near-dup finders.",
        "  **ewma** folds each user's chain once (one groupBy shuffle);",
        "  **kmeans_2iter** is flat-per-iteration (map-side scoring + a",
        "  k×dim aggregate); **containment** re-verifies the SAME pair",
        "  table as star_components, so its growth tracks pair output.",
        "- **Round-3/4 heavyweights** (the VERDICT-r3 probe set):",
        "  **keep_best** runs Jaccard verification over the quadratically-",
        "  growing minhash pair table (290× pairs at 16×) yet its time",
        "  grows only ~input-linearly — verification is candidates-only and",
        "  the cluster/argmax stages shuffle (id, label, score) tuples,",
        "  never text. **lm_score** and **bpe_train3** are vocab-bounded:",
        "  the bigram model and the per-iteration pair counts grow with",
        "  vocabulary (Zipf-slow), not corpus, so 16× data costs ~3.5×.",
        "  **corr_matrix** is one wide map-side aggregate (all moments in a",
        "  single pass) — flat output, sublinear time. **bloom_probe** is",
        "  the flattest heavyweight: the filter is a closure literal and",
        "  probing never shuffles (plan-pinned join-free in",
        "  tests/test_scale_ops.py). **ann_quantized** scans corpus×queries",
        "  like the exact baseline but on int8 — same flat-at-constant-",
        "  query-count shape, 4× less broadcast/scan traffic.",
        "- **Round-4 additions**: **prefix_filter** (exact shingle-set",
        "  similarity join, PPJoin positional pruning) produces the",
        "  quadratic-in-duplication-depth pair output like the other",
        "  near-dup finders (~2600× pairs at 16×) in ~16× time —",
        "  sub-linear per result row; the prefix index keeps candidates",
        "  bounded by rare-shingle document frequencies.",
        "  **kmv_distinct** and **bottomk_sample** are the flattest rows",
        "  in the table (≤ 1.8× at 16× data): a KMV sketch shuffles one",
        "  (group, hash) distinct table and bottom-k ships k·P rows",
        "  through TakeOrderedAndProject — both O(model), not O(data),",
        "  past the scan.",
        "",
        "Other round-3 scale notes:",
        "",
        "- `random(n)` compiles to `TakeOrderedAndProject` (per-partition",
        "  top-n + n·P-row merge — two-phase reservoir shape, no Exchange,",
        "  no global sort; plan-pinned in tests/test_plans.py).",
        "- `variancePopulation` differential runs on decimal(38,0) cent",
        "  moments (sumExact); at sf100 the (Σcents)² term approaches",
        "  decimal38's ceiling (~5.6e37 of 1e38) — split into per-bucket",
        "  partials or use relative comparison beyond that.",
    ]
    # preserve the relational (TPC-H) section appended by
    # tools/scale_probe_tpch.py — this probe owns only the pipeline part
    suffix = ""
    try:
        old = open("SCALE.md").read()
        idx = old.find("\n## Relational")
        if idx != -1:
            suffix = old[idx:]
    except FileNotFoundError:
        pass
    with open("SCALE.md", "w") as f:
        f.write("\n".join(lines) + "\n" + suffix)
    print("wrote SCALE.md", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
