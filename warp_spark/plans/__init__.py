from warp_spark.plans.chain import Chain, step

__all__ = ["Chain", "step"]
