from monster_etl_spark.sources.jsonl import read_json_lines, write_json_lines
from monster_etl_spark.sources.tsv import read_tsv

__all__ = ["read_json_lines", "write_json_lines", "read_tsv"]
