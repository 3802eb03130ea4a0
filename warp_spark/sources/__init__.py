from warp_spark.sources.csv import read_csv, write_csv
from warp_spark.sources.json import read_json, write_json

__all__ = ["read_csv", "write_csv", "read_json", "write_json"]
