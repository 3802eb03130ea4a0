"""XML source/sink (reference: Warp/Sources/Model/Steps/QBEXMLStep.swift:16-120
exports a raster as XML; read parity via the same document shape).

Spark 4 ships the XML data source natively (the merged spark-xml), so
both directions are fully distributed: the writer emits one XML part
per partition, the reader splits row tags across tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    **options,
) -> DataFrame:
    """Read XML documents into a DataFrame; one row per ``row_tag``
    element, schema inferred from attributes/child elements."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
    **options,
) -> None:
    """Write a DataFrame as XML part files (``<root><row>…</row></root>``)."""
    writer = (
        df.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .mode(mode)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)
