from warp_spark.functions.scalar import FUNCTIONS, call

__all__ = ["FUNCTIONS", "call"]
