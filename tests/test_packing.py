"""Sequence packing (concat-and-chop chunk assignment): the distributed
prefix-sum layout must be exactly the sequential one — offsets chain
with no gaps, chunk ranges follow from offsets, and the whole pipeline
agrees with a brute-force driver-side computation."""

import pytest
from pyspark.sql import functions as F

from warp_spark.pipeline.packing import chunk_summary, pack_chunks
from warp_spark.pipeline.text import token_count

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_offsets_chain_exactly(spark, docs):
    rows = pack_chunks(docs, chunk_tokens=128, num_partitions=4).orderBy("doc_id").collect()
    assert rows[0]["token_offset"] == 0
    for prev, cur in zip(rows, rows[1:]):
        assert cur["token_offset"] == prev["token_offset"] + prev["n_tokens"]


def test_matches_brute_force(spark, docs):
    c = 64
    got = {
        r["doc_id"]: (r["token_offset"], r["first_chunk"], r["last_chunk"], r["spans_boundary"])
        for r in pack_chunks(docs, chunk_tokens=c, num_partitions=8).collect()
    }
    counts = [
        (r["doc_id"], r["n"])
        for r in docs.select("doc_id", token_count(F.col("text")).alias("n"))
        .orderBy("doc_id")
        .collect()
    ]
    off = 0
    for doc_id, n in counts:
        first, last = off // c, (off + n - 1) // c
        assert got[doc_id] == (off, first, last, first != last)
        off += n


def test_chunk_ranges_consistent(spark, docs):
    out = pack_chunks(docs, chunk_tokens=512)
    bad = out.filter(
        (F.col("first_chunk") > F.col("last_chunk"))
        | (F.col("n_chunks") != F.col("last_chunk") - F.col("first_chunk") + 1)
        | (F.col("spans_boundary") != (F.col("first_chunk") != F.col("last_chunk")))
        | (F.floor(F.col("token_offset") / 512) != F.col("first_chunk"))
    )
    assert bad.count() == 0


def test_summary(spark, docs):
    packed = pack_chunks(docs, chunk_tokens=256)
    s = chunk_summary(packed).collect()[0]
    total = packed.agg(F.sum("n_tokens")).collect()[0][0]
    assert s["n_docs"] == docs.count()
    assert s["total_tokens"] == total
    # last chunk id is the one containing the final token
    assert s["n_chunks"] == (total - 1) // 256 + 1
    assert 0 <= s["boundary_docs"] <= s["n_docs"]


def test_rejects_bad_chunk_size(spark, docs):
    with pytest.raises(ValueError):
        pack_chunks(docs, chunk_tokens=0)


def test_chunk_documents_overlap(spark):
    from warp_spark.pipeline.packing import chunk_documents

    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, text), (2, "short doc")], "doc_id long, text string")
    got = chunk_documents(df, window=4, stride=3).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r
    # doc 1: 10 tokens, window 4, stride 3 → ceil((10-4)/3)+1 = 3 chunks
    assert sorted(by_doc[1]) == [0, 1, 2]
    assert by_doc[1][0]["chunk_text"] == "t0 t1 t2 t3"
    assert by_doc[1][1]["chunk_text"] == "t3 t4 t5 t6"
    assert by_doc[1][2]["chunk_text"] == "t6 t7 t8 t9"
    assert all(r["chunk_tokens"] == 4 for r in by_doc[1].values())
    # doc 2: 2 tokens → one short chunk
    assert sorted(by_doc[2]) == [0]
    assert by_doc[2][0]["chunk_text"] == "short doc"
    assert by_doc[2][0]["chunk_tokens"] == 2
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(df, window=0)


def test_assign_split_stable_under_append(spark):
    from warp_spark.sampling import assign_split

    base = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    bigger = spark.createDataFrame([(i,) for i in range(400)], "doc_id long")
    a = {r["doc_id"]: r["split"] for r in assign_split(base, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in assign_split(bigger, "doc_id").collect()}
    # append-stability: every original id keeps its split
    assert all(b[k] == v for k, v in a.items())
    assert set(b.values()) == {"train", "val", "test"}
    # rough proportions at n=400 (md5 is uniform; loose bounds)
    frac_train = sum(1 for v in b.values() if v == "train") / len(b)
    assert 0.8 < frac_train < 0.97
