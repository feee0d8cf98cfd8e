from monster_etl_spark.plans import v2f

__all__ = ["v2f"]
