"""Source/sink tests: the reference's CSV golden-file suite
(Warp/Tests/QBETests.swift:57-147, fixtures per FIXTURES.md §1) and the
JSON three-shape detection (JSONStream.swift:18-168)."""

import json

import pytest

from warp_spark.sources import read_csv, read_json, write_csv, write_json


def rows(df):
    return [tuple(r) for r in df.collect()]


# --- CSV golden files (separator ';', quote '"', escape '""') --------------

def test_csv_regular(spark, tmp_path):
    p = tmp_path / "regular.csv"
    p.write_text("a;b;c\n1;2;3\n4;5;6\n7;8;9\n")
    df = read_csv(spark, str(p), separator=";")
    assert df.columns == ["a", "b", "c"]
    assert sorted(rows(df)) == [(1, 2, 3), (4, 5, 6), (7, 8, 9)]


def test_csv_missing_columns_pad(spark, tmp_path):
    # short row '1;2' → [1, 2, NULL] (QBETests.swift:110-122)
    p = tmp_path / "missing.csv"
    p.write_text("a;b;c\n1;2\n4;5;6\n")
    df = read_csv(spark, str(p), separator=";")
    assert sorted(rows(df), key=str) == [(1, 2, None), (4, 5, 6)]


def test_csv_extraneous_columns_truncate(spark, tmp_path):
    # long row '4;5;6;10' → [4, 5, 6] (QBETests.swift:123-127)
    p = tmp_path / "extra.csv"
    p.write_text("a;b;c\n1;2;3\n4;5;6;10\n")
    df = read_csv(spark, str(p), separator=";")
    assert df.columns == ["a", "b", "c"]
    assert sorted(rows(df)) == [(1, 2, 3), (4, 5, 6)]


def test_csv_escapes(spark, tmp_path):
    # header contains the separator (quoted); a cell contains separator +
    # newline; expected raster [[1,'a;\nb',3],[4,'5',6]] (QBETests.swift:128-146)
    p = tmp_path / "escapes.csv"
    p.write_text('"a;a";b;c\n1;"a;\nb";3\n4;5;6\n')
    df = read_csv(spark, str(p), separator=";")
    assert df.columns == ["a;a", "b", "c"]
    got = sorted(rows(df), key=lambda t: str(t[0]))
    assert got == [(1, "a;\nb", 3), (4, "5", 6)]


def test_csv_quote_escape_doubled(spark, tmp_path):
    p = tmp_path / "quotes.csv"
    p.write_text('a;b\n1;"say ""hi"""\n')
    df = read_csv(spark, str(p), separator=";")
    assert rows(df) == [(1, 'say "hi"')]


def test_csv_duplicate_headers_deduped(spark, tmp_path):
    p = tmp_path / "dup.csv"
    p.write_text("x;x;X\n1;2;3\n")
    df = read_csv(spark, str(p), separator=";")
    assert df.columns == ["x", "x_2", "X_3"]


def test_csv_no_inference_all_strings(spark, tmp_path):
    p = tmp_path / "str.csv"
    p.write_text("a;b\n1;2\n")
    df = read_csv(spark, str(p), separator=";", infer_schema=False)
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string", "string"]
    assert rows(df) == [("1", "2")]


def test_csv_roundtrip_write_read(spark, tmp_path):
    df = spark.createDataFrame([(1, "x"), (2, "y;z")], "a int, b string")
    out = tmp_path / "out"
    write_csv(df, str(out), separator=";")
    back = read_csv(spark, str(out), separator=";")
    assert sorted(rows(back)) == [(1, "x"), (2, "y;z")]


def test_csv_write_timestamp_iso8601(spark, tmp_path):
    df = spark.sql("SELECT timestamp'2001-01-01 00:00:00' AS ts")
    out = tmp_path / "ts"
    write_csv(df, str(out), separator=",")
    back = read_csv(spark, str(out), infer_schema=False)
    assert rows(back) == [("2001-01-01T00:00:00Z",)]


def test_csv_write_array_as_pack(spark, tmp_path):
    df = spark.sql("SELECT array('a,b', 'c$d') AS xs")
    out = tmp_path / "arr"
    write_csv(df, str(out))
    back = read_csv(spark, str(out), infer_schema=False)
    # pack escaping: ',' → $0, '$' → $1 (Value.swift:266-380)
    assert rows(back) == [("a$0b,c$1d",)]


# --- JSON three shapes (JSONStream.swift:18-168) ---------------------------

def test_json_array_of_objects(spark, tmp_path):
    p = tmp_path / "objs.json"
    p.write_text(json.dumps([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]))
    df = read_json(spark, str(p))
    assert sorted(df.columns) == ["a", "b"]
    assert sorted(rows(df)) == [(1, "x"), (2, "y")]


def test_json_array_of_values(spark, tmp_path):
    p = tmp_path / "vals.json"
    p.write_text("[1, 2, 3]")
    df = read_json(spark, str(p))
    assert df.columns == ["items"]
    assert sorted(r[0] for r in df.collect()) == [1, 2, 3]


def test_json_single_value(spark, tmp_path):
    p = tmp_path / "scalar.json"
    p.write_text('"hello"')
    df = read_json(spark, str(p))
    assert df.columns == ["data"]
    assert rows(df) == [("hello",)]


def test_json_ndjson(spark, tmp_path):
    p = tmp_path / "nd.json"
    p.write_text('{"a": 1}\n{"a": 2}\n')
    df = read_json(spark, str(p), multi_line=False)
    assert sorted(r["a"] for r in df.collect()) == [1, 2]


def test_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "x")], "a int, b string")
    out = tmp_path / "out"
    write_json(df, str(out))
    back = read_json(spark, str(out), multi_line=False)
    assert rows(back.select("a", "b")) == [(1, "x")]
