from monster_etl_spark.operators import transforms

__all__ = ["transforms"]
