"""The shared artifact-publication discipline (warp_spark/artifacts.py):
unique sibling scratch dirs, the flock-guarded two-rename swap, and the
no-re-append preconditions of the three index append legs (r12 verdict
items 2-3 / r12 ADVICE)."""

import os
import threading
import time

import pytest


def test_unique_sibling_tmp_is_unique_and_adjacent(tmp_path):
    from warp_spark.artifacts import unique_sibling_tmp

    path = str(tmp_path / "artifact")
    a = unique_sibling_tmp(path, tag="build")
    b = unique_sibling_tmp(path, tag="build")
    assert a != b  # two concurrent builders never share a scratch tree
    for t in (a, b):
        assert os.path.isdir(t)
        # same parent as the target => same filesystem => atomic rename
        assert os.path.dirname(t) == str(tmp_path)
        assert os.path.basename(t).startswith("artifact.build.")


def test_swap_artifact_dir_blocks_on_the_flock(tmp_path):
    """The swap must serialize on <path>.lock: while another writer
    holds the flock, swap_artifact_dir may not touch the published
    tree.  This is the discipline the r12 compaction legs skipped —
    they rmtree'd the live artifact with no lock at all."""
    import fcntl

    from warp_spark.artifacts import swap_artifact_dir

    path = str(tmp_path / "art")
    os.makedirs(path)
    with open(os.path.join(path, "data"), "w") as f:
        f.write("old")
    tmp = str(tmp_path / "art.staged")
    os.makedirs(tmp)
    with open(os.path.join(tmp, "data"), "w") as f:
        f.write("new")

    lk = open(path + ".lock", "w")
    fcntl.flock(lk, fcntl.LOCK_EX)
    t = threading.Thread(target=swap_artifact_dir, args=(path, tmp))
    t.start()
    try:
        # the swap is blocked on the flock: the published tree must
        # still be the OLD one for as long as we hold the lock
        time.sleep(0.4)
        assert t.is_alive()
        with open(os.path.join(path, "data")) as f:
            assert f.read() == "old"
    finally:
        fcntl.flock(lk, fcntl.LOCK_UN)
        lk.close()
    t.join(timeout=10)
    assert not t.is_alive()
    with open(os.path.join(path, "data")) as f:
        assert f.read() == "new"
    # the displaced tree and the staged tree are both reclaimed
    leftovers = [n for n in os.listdir(tmp_path) if ".trash." in n or n == "art.staged"]
    assert leftovers == []


def test_swap_artifact_dir_first_publish(tmp_path):
    """No prior tree: the swap is a single rename, no trash dance."""
    from warp_spark.artifacts import swap_artifact_dir

    path = str(tmp_path / "fresh")
    tmp = str(tmp_path / "fresh.staged")
    os.makedirs(tmp)
    with open(os.path.join(tmp, "data"), "w") as f:
        f.write("v1")
    swap_artifact_dir(path, tmp)
    with open(os.path.join(path, "data")) as f:
        assert f.read() == "v1"
    assert not os.path.exists(tmp)


def test_compaction_survives_a_concurrent_reader_loop(spark, tmp_path):
    """Compact the dedup index while a reader hammers the artifact:
    the reader may hit the momentary two-rename ENOENT window (it
    retries, the standing self-heal contract) but must NEVER observe a
    half-deleted or half-built tree — every successful read of the
    stats tier parses to the same doc count before, during, and after
    the swap."""
    from warp_spark.pipeline.dedup import compact_dedup_index, persist_dedup_index

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i} delta epsilon zeta eta theta") for i in range(40)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "idx")
    persist_dedup_index(docs, path)
    stop = threading.Event()
    bad: list = []
    counts: list = []

    def reader():
        while not stop.is_set():
            try:
                n = int(spark.read.parquet(f"{path}/stats").first()["n_docs"])
                counts.append(n)
                if n != 40:
                    bad.append(n)
            except Exception:
                # ENOENT window or in-flight listing: acceptable, retry
                pass

    t = threading.Thread(target=reader)
    t.start()
    try:
        for _ in range(3):
            compact_dedup_index(spark, path)
    finally:
        stop.set()
        t.join(timeout=30)
    assert not bad, f"reader observed inconsistent stats: {bad}"
    assert counts, "reader never completed a read"
    # post-state intact
    assert int(spark.read.parquet(f"{path}/stats").first()["n_docs"]) == 40


def test_append_refuses_redelivered_slice(spark, tmp_path):
    """No-re-append precondition across all three index families (r12
    verdict item 3): feeding a slice that contains already-indexed ids
    must return False (caller rebuilds honestly) instead of silently
    doubling postings/codes and inflating the stats."""
    from warp_spark.pipeline.dedup import append_dedup_index, persist_dedup_index
    from warp_spark.pipeline.similarity import append_ivfpq_index, persist_ivfpq_index
    from warp_spark.pipeline.text import append_bm25_index, build_bm25_index

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i} delta epsilon zeta eta theta") for i in range(20)],
        "doc_id long, text string",
    )
    base = docs.filter("doc_id < 12")
    slice_ = docs.filter("doc_id >= 12")

    p = str(tmp_path / "dedup")
    persist_dedup_index(base, p)
    assert append_dedup_index(spark, p, slice_) is True
    n_after = spark.read.parquet(f"{p}/bands").count()
    assert append_dedup_index(spark, p, slice_) is False  # exact re-delivery
    assert append_dedup_index(spark, p, docs.filter("doc_id >= 15")) is False  # overlap
    # the refused appends wrote NOTHING
    assert spark.read.parquet(f"{p}/bands").count() == n_after

    p = str(tmp_path / "bm25")
    build_bm25_index(base, p)
    assert append_bm25_index(spark, p, slice_) is True
    n_post = spark.read.parquet(f"{p}/postings").count()
    n_docs = int(spark.read.parquet(f"{p}/stats").first()["n_docs"])
    assert n_docs == 20
    assert append_bm25_index(spark, p, slice_) is False
    assert spark.read.parquet(f"{p}/postings").count() == n_post
    assert int(spark.read.parquet(f"{p}/stats").first()["n_docs"]) == 20

    import random

    rng = random.Random(7)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    vb, vs = emb.filter("vec_id < 30"), emb.filter("vec_id >= 30")
    p = str(tmp_path / "ann")
    persist_ivfpq_index(vb, p, n_centroids=4, m=4, n_codes=8)
    assert append_ivfpq_index(spark, p, vs) is True
    n_codes = spark.read.parquet(f"{p}/codes").count()
    assert append_ivfpq_index(spark, p, vs) is False
    assert spark.read.parquet(f"{p}/codes").count() == n_codes


def test_publish_artifact_concurrent_builders_do_not_clobber(tmp_path):
    """Two _publish_artifact calls racing on the same path must each
    complete and leave ONE winner's consistent tree (r12 ADVICE: the
    old fixed '.build' sibling let builder B rmtree builder A's
    in-progress scratch).  Build bodies deliberately overlap in time."""
    from warp_spark.catalog import _publish_artifact

    path = str(tmp_path / "art")
    errs: list = []

    def build(tag):
        def body(tmp):
            with open(os.path.join(tmp, "payload"), "w") as f:
                f.write(tag)
            time.sleep(0.3)  # keep both scratch trees alive at once

        try:
            _publish_artifact(path, "_DONE", f"stamp-{tag}", body)
        except Exception as e:  # pragma: no cover - the failure we pin
            errs.append(e)

    ts = [threading.Thread(target=build, args=(tag,)) for tag in ("a", "b")]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=30)
    assert not errs
    with open(os.path.join(path, "payload")) as f:
        payload = f.read()
    with open(os.path.join(path, "_DONE")) as f:
        stamp = f.read().strip()
    # whichever builder won, its marker and payload are the SAME build
    assert stamp == f"stamp-{payload}"
    assert not [n for n in os.listdir(tmp_path) if ".build." in n or ".trash." in n]


def test_delete_from_dedup_index_equals_rebuild_on_remaining(spark, tmp_path):
    """Index DELETE (the third mutation verb): removing a slice from a
    persisted dedup index must leave band postings, shingles, and
    stats IDENTICAL to a fresh build over the remaining corpus — and
    the honest-refusal contract must trip on an id that was never
    indexed and on an id indexed under different text."""
    from pyspark.sql import functions as F

    from warp_spark.pipeline.dedup import (
        delete_from_dedup_index,
        persist_dedup_index,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i} delta epsilon zeta eta theta") for i in range(20)],
        "doc_id long, text string",
    )
    keep, drop = docs.filter("doc_id < 14"), docs.filter("doc_id >= 14")
    p_del, p_ref = str(tmp_path / "del"), str(tmp_path / "ref")
    persist_dedup_index(docs, p_del)
    assert delete_from_dedup_index(spark, p_del, drop) is True
    persist_dedup_index(keep, p_ref)
    for sub, key in (("bands", None), ("shingles", None), ("stats", None)):
        a = sorted(map(str, spark.read.parquet(f"{p_del}/{sub}").collect()))
        b = sorted(map(str, spark.read.parquet(f"{p_ref}/{sub}").collect()))
        assert a == b and len(a) > 0, sub

    # refusal: id never indexed
    ghost = spark.createDataFrame(
        [(99, "nine nine nine nine nine nine")], "doc_id long, text string"
    )
    n_rows = spark.read.parquet(f"{p_del}/bands").count()
    assert delete_from_dedup_index(spark, p_del, ghost) is False
    # refusal: id indexed under DIFFERENT text (signature mismatch)
    wrong = spark.createDataFrame(
        [(3, "totally different content here now friend")], "doc_id long, text string"
    )
    assert delete_from_dedup_index(spark, p_del, wrong) is False
    # refused deletes wrote nothing
    assert spark.read.parquet(f"{p_del}/bands").count() == n_rows
    assert int(spark.read.parquet(f"{p_del}/stats").first()["n_docs"]) == 14


def test_dedup_index_delete_entry_takes_the_fast_path(spark):
    """The catalog entry must exercise the PRUNED delete, not the
    fallback rebuild: on the shipped corpus delete_from_dedup_index
    accepts the 12..15 slice (every id indexed under exactly its
    text), so the marker reads 'deleted', never 'rebuilt'."""
    import os

    import __spark_entry__ as m
    import warp_spark.catalog as cat

    sf = "/root/testdata/sf0.001"
    m.queries()["dedup_index_delete"](spark, sf).count()
    path = cat._artifact_path("warp_dedup_idxdel_v1", sf)
    with open(os.path.join(path, "_INDEX_COMPLETE")) as f:
        assert "deleted" in f.read()


def test_delete_from_bm25_index_equals_rebuild_on_remaining(spark, tmp_path):
    """BM25 delete must leave postings and stats identical to a fresh
    build over the remaining corpus, and refuse absent ids or text
    drift."""
    from warp_spark.pipeline.text import build_bm25_index, delete_from_bm25_index

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i} delta epsilon zeta eta theta") for i in range(20)],
        "doc_id long, text string",
    )
    keep, drop = docs.filter("doc_id < 14"), docs.filter("doc_id >= 14")
    p_del, p_ref = str(tmp_path / "del"), str(tmp_path / "ref")
    build_bm25_index(docs, p_del)
    assert delete_from_bm25_index(spark, p_del, drop) is True
    build_bm25_index(keep, p_ref)
    for sub in ("postings", "stats"):
        a = sorted(map(str, spark.read.parquet(f"{p_del}/{sub}").collect()))
        b = sorted(map(str, spark.read.parquet(f"{p_ref}/{sub}").collect()))
        assert a == b and len(a) > 0, sub
    ghost = spark.createDataFrame(
        [(99, "nine nine nine")], "doc_id long, text string"
    )
    assert delete_from_bm25_index(spark, p_del, ghost) is False
    wrong = spark.createDataFrame(
        [(3, "totally different words now")], "doc_id long, text string"
    )
    assert delete_from_bm25_index(spark, p_del, wrong) is False
    assert int(spark.read.parquet(f"{p_del}/stats").first()["n_docs"]) == 14


def test_delete_from_ivfpq_index_inverts_append(spark, tmp_path):
    """Under a frozen model, append and delete are exact inverses:
    delete(append(build(B), S), S) must equal build(B) table-for-table
    — and absent/drifted vectors refuse."""
    import random

    from pyspark.sql import functions as F

    from warp_spark.pipeline.similarity import (
        append_ivfpq_index,
        delete_from_ivfpq_index,
        persist_ivfpq_index,
    )

    rng = random.Random(11)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    base, slice_ = emb.filter("vec_id < 30"), emb.filter("vec_id >= 30")
    p_del, p_ref = str(tmp_path / "del"), str(tmp_path / "ref")
    persist_ivfpq_index(base, p_del, n_centroids=4, m=4, n_codes=8)
    append_ivfpq_index(spark, p_del, slice_)
    assert delete_from_ivfpq_index(spark, p_del, slice_) is True
    persist_ivfpq_index(base, p_ref, n_centroids=4, m=4, n_codes=8)
    for sub in ("codes", "storage", "centroids", "codebooks"):
        a = sorted(map(str, spark.read.parquet(f"{p_del}/{sub}").collect()))
        b = sorted(map(str, spark.read.parquet(f"{p_ref}/{sub}").collect()))
        assert a == b and len(a) > 0, sub
    # refusal: id never indexed
    ghost = spark.createDataFrame(
        [(999, [0.5] * 16)], "vec_id long, embedding array<float>"
    )
    assert delete_from_ivfpq_index(spark, p_del, ghost) is False
    # refusal: id indexed under a DIFFERENT vector
    drift = emb.filter("vec_id = 3").select(
        "vec_id", F.transform("embedding", lambda x: x + F.lit(2.0)).alias("embedding")
    )
    assert delete_from_ivfpq_index(spark, p_del, drift) is False


def test_mutation_verbs_serialize_on_the_index_root_lock(spark, tmp_path):
    """r13 verdict item 3: EVERY mutation verb (append / delete /
    compact) must hold the canonical <index>.lock for its whole
    read-verify-write span — an external holder of the root lock
    blocks the verb entirely, so two verbs on the same index can
    never interleave their sub-artifact swaps or both pass a
    precondition."""
    import fcntl

    from warp_spark.pipeline.dedup import (
        append_dedup_index,
        compact_dedup_index,
        delete_from_dedup_index,
        persist_dedup_index,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i} delta epsilon zeta eta theta") for i in range(20)],
        "doc_id long, text string",
    )
    p = str(tmp_path / "idx")
    persist_dedup_index(docs.filter("doc_id < 14"), p)

    for verb in (
        lambda: append_dedup_index(spark, p, docs.filter("doc_id >= 14")),
        lambda: delete_from_dedup_index(spark, p, docs.filter("doc_id >= 14")),
        lambda: compact_dedup_index(spark, p),
    ):
        lk = open(p + ".lock", "w")
        fcntl.flock(lk, fcntl.LOCK_EX)
        before = sorted(map(str, spark.read.parquet(f"{p}/stats").collect()))
        t = threading.Thread(target=verb)
        t.start()
        try:
            time.sleep(0.5)
            # the verb is parked on the root flock: it has not read,
            # verified, or written ANYTHING yet
            assert t.is_alive()
            assert sorted(map(str, spark.read.parquet(f"{p}/stats").collect())) == before
        finally:
            fcntl.flock(lk, fcntl.LOCK_UN)
            lk.close()
        t.join(timeout=120)
        assert not t.is_alive()


def test_delete_racing_compact_converges_on_remaining(spark, tmp_path):
    """Cross-verb interleaving (r13 verdict item 3): a delete and a
    compact fired concurrently at the same index must serialize on the
    root lock — whichever order wins, the surviving tree equals a
    fresh build over the remaining corpus (compaction is content-
    preserving, so delete-then-compact == compact-then-delete)."""
    from warp_spark.pipeline.dedup import (
        compact_dedup_index,
        delete_from_dedup_index,
        persist_dedup_index,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i} delta epsilon zeta eta theta") for i in range(20)],
        "doc_id long, text string",
    )
    p_race, p_ref = str(tmp_path / "race"), str(tmp_path / "ref")
    persist_dedup_index(docs, p_race)
    results = {}

    def do_delete():
        results["deleted"] = delete_from_dedup_index(
            spark, p_race, docs.filter("doc_id >= 14")
        )

    threads = [
        threading.Thread(target=do_delete),
        threading.Thread(target=compact_dedup_index, args=(spark, p_race)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
        assert not t.is_alive()
    assert results["deleted"] is True
    persist_dedup_index(docs.filter("doc_id < 14"), p_ref)
    for sub in ("bands", "shingles", "stats"):
        a = sorted(map(str, spark.read.parquet(f"{p_race}/{sub}").collect()))
        b = sorted(map(str, spark.read.parquet(f"{p_ref}/{sub}").collect()))
        assert a == b and len(a) > 0, sub


def test_delete_from_bm25_index_refuses_zero_token_rows(spark, tmp_path):
    """r13 verdict item 7: a slice row whose text tokenizes to nothing
    has no postings to verify, so its indexed-ness is unverifiable —
    a never-indexed zero-token id would otherwise pass the 0 == 0
    verification and over-decrement n_docs.  Such slices refuse, and
    the refused delete writes nothing."""
    from warp_spark.pipeline.text import build_bm25_index, delete_from_bm25_index

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i} delta") for i in range(10)],
        "doc_id long, text string",
    )
    p = str(tmp_path / "bm25")
    build_bm25_index(docs, p)
    n_post = spark.read.parquet(f"{p}/postings").count()

    # a NEVER-indexed empty doc smuggled into an otherwise-valid slice
    sneaky = docs.filter("doc_id >= 8").union(
        spark.createDataFrame([(99, "   ")], "doc_id long, text string")
    )
    assert delete_from_bm25_index(spark, p, sneaky) is False
    # null text is the same unverifiable shape
    nully = spark.createDataFrame([(98, None)], "doc_id long, text string")
    assert delete_from_bm25_index(spark, p, nully) is False
    # the refused deletes wrote NOTHING
    assert spark.read.parquet(f"{p}/postings").count() == n_post
    assert int(spark.read.parquet(f"{p}/stats").first()["n_docs"]) == 10
