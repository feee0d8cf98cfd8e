"""monster_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the *capabilities* of the reference repo
``broadinstitute/monster-etl`` (Scala/Scio/Beam, read-only at
``/root/reference``), re-expressed Spark-first:

- the reference's record-transform library (rename / remove / extract /
  collect / concat / snake-case / typed parses / array ops / path-derived
  columns) as ``DataFrame -> DataFrame`` functions built only from built-in
  column expressions (``monster_etl_spark.operators.transforms``);
- its sources/sinks (TSV-with-header sparse records, JSON-lines) as thin
  wrappers over ``spark.read``/``spark.write`` (``monster_etl_spark.sources``);
- its composed pipelines (P1-P5 in SURVEY.md §2.9) driven by declarative
  per-table configs (``monster_etl_spark.plans.v2f``);
- plus the relational surface the reference lacks (joins, aggregations,
  windows — native Spark) and large-scale training-data-pipeline operators
  (dedup families, similarity search, text analysis, multimodal plumbing,
  streaming) under ``operators``/``streaming``.

Everything here derives from public knowledge only: the Apache Spark API and
the reference repo's observable behavior.
"""

from monster_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
