"""DBF (dBase III/IV) source/sink (reference:
WarpConduit/Sources/DBFStream.swift:16-132 reads via shapelib;
Warp/Sources/Model/Steps/QBEDBFStep.swift:16-118 writes).

Implemented against the public dBase file-format spec — fixed 32-byte
header + 32-byte field descriptors + fixed-width ASCII records — with no
third-party dependency. Field types covered: C (character), N/F
(numeric), L (logical), D (date); memo fields are surfaced as their raw
block reference.

Scale note: DBF is a legacy interchange format with a hard 2 GB / 1e9
record format limit, so files are inherently single-machine sized. The
reader parses on the driver and distributes immediately via
``createDataFrame`` (guarded); a directory of .dbf files parallelizes
per-file through ``spark.read.format('binaryFile')`` + ``mapInPandas``.
"""

from __future__ import annotations

import datetime as _dt
import glob
import os
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MAX_DRIVER_RECORDS = 5_000_000


def _parse_header(buf: bytes):
    """-> (n_records, header_len, record_len, fields) where fields is
    [(name, type_char, length, decimals)]."""
    if len(buf) < 32:
        raise ValueError("not a DBF file: truncated header")
    n_records, header_len, record_len = struct.unpack("<IHH", buf[4:12])
    fields = []
    off = 32
    while off + 1 < header_len and buf[off] != 0x0D:
        desc = buf[off : off + 32]
        name = desc[:11].split(b"\x00")[0].decode("ascii", "replace")
        ftype = chr(desc[11])
        length = desc[16]
        decimals = desc[17]
        fields.append((name, ftype, length, decimals))
        off += 32
    return n_records, header_len, record_len, fields


def _decode_cell(raw: bytes, ftype: str, decimals: int):
    text = raw.decode("latin-1").strip()
    if ftype in ("N", "F"):
        if not text:
            return None
        try:
            return float(text) if (decimals or "." in text) else int(text)
        except ValueError:
            return None
    if ftype == "L":
        if text in "YyTt":
            return True
        if text in "NnFf":
            return False
        return None
    if ftype == "D":
        if len(text) == 8 and text.isdigit():
            try:
                return _dt.date(int(text[:4]), int(text[4:6]), int(text[6:8]))
            except ValueError:
                return None
        return None
    return text if text else None


def _parse_records(buf: bytes) -> pd.DataFrame:
    n_records, header_len, record_len, fields = _parse_header(buf)
    cols: dict[str, list] = {name: [] for name, *_ in fields}
    pos = header_len
    for _ in range(n_records):
        rec = buf[pos : pos + record_len]
        pos += record_len
        if len(rec) < record_len or rec[:1] == b"\x1a":
            break
        if rec[:1] == b"*":  # soft-deleted record
            continue
        off = 1
        for name, ftype, length, decimals in fields:
            cols[name].append(_decode_cell(rec[off : off + length], ftype, decimals))
            off += length
    return pd.DataFrame(cols)


def read_dbf(spark: SparkSession, path: str) -> DataFrame:
    """Read one .dbf file (driver-side parse, guarded) or a directory /
    glob of them (distributed: one task per file via binaryFile +
    mapInPandas — DBF's 2 GB format cap makes per-file the natural
    parallel grain)."""
    paths = glob.glob(path) if any(c in path for c in "*?[") else [path]
    if len(paths) == 1 and os.path.isfile(paths[0]):
        with open(paths[0], "rb") as f:
            buf = f.read()
        n_records = _parse_header(buf)[0]
        if n_records > MAX_DRIVER_RECORDS:
            raise ValueError(
                f"DBF has {n_records} records; read a directory of files for "
                "the distributed path"
            )
        pdf = _parse_records(buf)
        return spark.createDataFrame(pdf)

    binary = spark.read.format("binaryFile").load(path)
    sample_path = binary.select("path").first()[0]
    with open(sample_path.removeprefix("file:"), "rb") as f:
        schema = spark.createDataFrame(_parse_records(f.read()).head(10)).schema

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for content in b["content"]:
                yield _parse_records(bytes(content))

    return binary.select("content").mapInPandas(parse, schema)


def write_dbf(df: DataFrame, path: str, max_rows: int = MAX_DRIVER_RECORDS) -> None:
    """Write a DataFrame to one .dbf file (dBase III). Strings become C
    fields (width = max observed, ≤254), ints/floats N fields, booleans
    L, dates D. Driver-side by format necessity (single file, 2 GB cap)."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(f"refusing to write >{max_rows} rows to a single DBF")
    names = df.columns

    def field_spec(name):
        vals = [r[name] for r in rows if r[name] is not None]
        if vals and all(isinstance(v, bool) for v in vals):
            return (name, "L", 1, 0)
        if vals and all(isinstance(v, int) and not isinstance(v, bool) for v in vals):
            return (name, "N", max(18, max(len(str(v)) for v in vals)), 0)
        if vals and all(isinstance(v, float) for v in vals):
            return (name, "N", 20, 6)
        if vals and all(isinstance(v, (_dt.date, _dt.datetime)) for v in vals):
            return (name, "D", 8, 0)
        width = min(254, max([len(str(v)) for v in vals] + [1]))
        return (name, "C", width, 0)

    specs = [field_spec(n) for n in names]
    record_len = 1 + sum(s[2] for s in specs)
    header_len = 32 + 32 * len(specs) + 1
    today = _dt.date.today()
    out = bytearray()
    out += struct.pack(
        "<BBBBIHH20x",
        0x03,
        today.year % 100,
        today.month,
        today.day,
        len(rows),
        header_len,
        record_len,
    )
    for name, ftype, length, decimals in specs:
        out += struct.pack(
            "<11sc4xBB14x", name.encode("ascii", "replace")[:11], ftype.encode(), length, decimals
        )
    out += b"\x0d"

    def cell(v, ftype, length, decimals):
        if v is None:
            return b" " * length
        if ftype == "L":
            return b"T" if v else b"F"
        if ftype == "N":
            s = f"{v:.{decimals}f}" if decimals else str(int(v))
            return s.rjust(length)[:length].encode("ascii", "replace")
        if ftype == "D":
            return v.strftime("%Y%m%d").encode()
        return str(v).ljust(length)[:length].encode("latin-1", "replace")

    for r in rows:
        out += b" "
        for name, ftype, length, decimals in specs:
            out += cell(r[name], ftype, length, decimals)
    out += b"\x1a"
    with open(path, "wb") as f:
        f.write(bytes(out))
