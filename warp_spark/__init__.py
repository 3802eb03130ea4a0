"""warp_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of pixelspark/warp (see SURVEY.md).

Architecture: a thin, lazy operator algebra (`Dataset`) over Spark
DataFrames; an Excel-style scalar/aggregate function library compiled to
`pyspark.sql.Column` trees; a formula language parser; file/JDBC
sources; and large-scale data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) that the reference lacks.

Everything is declarative DataFrame/SQL so Catalyst plans the physical
execution (pushdown, join strategy, partial aggregation, AQE).
"""

from warp_spark.session import get_spark
from warp_spark.dataset import Dataset, Order
from warp_spark.aggregators import Aggregator
from warp_spark.infer import infer, suggest_formulas
from warp_spark.calculator import ExampleCalculator
from warp_spark.sampling import (
    assign_split,
    rebalance_sample,
    rebalance_weights,
    stratified_sample,
)
from warp_spark.pipeline.packing import chunk_documents, chunk_summary, pack_chunks
from warp_spark.layout import morton_index, write_zordered
from warp_spark.stats import exact_corr_matrix, profile_columns

__all__ = [
    "get_spark",
    "Dataset",
    "Order",
    "Aggregator",
    "infer",
    "suggest_formulas",
    "ExampleCalculator",
    "stratified_sample",
    "assign_split",
    "rebalance_weights",
    "rebalance_sample",
    "pack_chunks",
    "chunk_documents",
    "chunk_summary",
    "morton_index",
    "write_zordered",
    "exact_corr_matrix",
    "profile_columns",
]
__version__ = "0.1.0"
