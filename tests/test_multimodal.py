"""Multimodal plumbing tests: binary column + typed metadata, Arrow
decode batches, binary-in/binary-out resize, row-amplifying frame
sampling. Codecs are deterministic stubs; the plumbing is real."""

import pytest
from pyspark.sql import functions as F

from warp_spark.pipeline.multimodal import (
    attach_binary,
    decode_features,
    frame_sample,
    resize_stub,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return attach_binary(spark.read.parquet(DOCS).limit(50))


def test_attach_binary_typed_metadata(docs):
    schema = dict(docs.dtypes)
    assert schema["payload"] == "binary"
    assert schema["payload_meta"].startswith("struct<modality:string,mime:string,n_bytes:")
    r = docs.select("payload", "payload_meta").first()
    assert r["payload_meta"]["n_bytes"] == len(r["payload"])


def test_decode_features_deterministic(docs):
    a = {r["doc_id"]: tuple(r) for r in decode_features(docs).collect()}
    b = {r["doc_id"]: tuple(r) for r in decode_features(docs).collect()}
    assert a == b and len(a) == 50
    first = decode_features(docs).first()
    assert 64 <= first["width"] < 512 and 1 <= first["n_frames"] <= 5


def test_resize_keeps_contract(docs):
    out = resize_stub(docs, max_side=256)
    assert out.schema == docs.schema  # binary-in/binary-out
    pairs = (
        docs.select("doc_id", F.octet_length("payload").alias("before"))
        .join(out.select("doc_id", F.octet_length("payload").alias("after")), "doc_id")
        .collect()
    )
    assert all(r["after"] <= r["before"] for r in pairs)


def test_frame_sample_amplification(docs):
    frames = frame_sample(docs, every_n=1)
    meta = decode_features(docs)
    per_doc = {r["doc_id"]: r["n_frames"] for r in meta.collect()}
    got = frames.groupBy("doc_id").count().collect()
    assert {r["doc_id"]: r["count"] for r in got} == per_doc
    # frame payloads are real slices: re-joining them never exceeds source
    sizes = frames.groupBy("doc_id").agg(F.sum("frame_bytes").alias("total")).collect()
    n_bytes = {r["doc_id"]: r["n_bytes"] for r in meta.collect()}
    assert all(r["total"] <= n_bytes[r["doc_id"]] for r in sizes)


def test_audio_features_shape_and_determinism(spark):
    from warp_spark.pipeline.multimodal import attach_binary, audio_features

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    with_payload = attach_binary(docs)
    a = audio_features(with_payload).collect()
    b = audio_features(with_payload).collect()
    assert len(a) == 50
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    for r in a:
        assert r["sample_rate"] in (8000, 16000, 44100)
        assert r["n_windows"] >= 1
        assert 0.0 <= r["rms"] <= 1.0
