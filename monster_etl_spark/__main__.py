"""CLI entry points — the engine analogue of the reference's caseapp mains
(``ExtractionPipeline.scala:27-38``, ``DatasetSpecificPipeline.scala:39-46``;
SURVEY.md §3.4 maps caseapp -> argparse).

    python -m monster_etl_spark v2f-extract --input-dir IN --output-dir OUT
    python -m monster_etl_spark v2f-dataset-specific --input-dir IN --output-dir OUT
    python -m monster_etl_spark run-pipeline --pipeline spec.json
    python -m monster_etl_spark sql --sf-dir DIR --query "SELECT ..."
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="monster_etl_spark")
    parser.add_argument("--master", default=None, help="Spark master (default local[$SPARK_GRAFT_CPUS])")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_ext = sub.add_parser("v2f-extract", help="TSV -> six JSON-lines tables (reference ExtractionPipeline)")
    p_ext.add_argument("--input-dir", required=True)
    p_ext.add_argument("--output-dir", required=True)

    p_ds = sub.add_parser("v2f-dataset-specific", help="JSON -> JSON (reference DatasetSpecificPipeline)")
    p_ds.add_argument("--input-dir", required=True)
    p_ds.add_argument("--output-dir", required=True)

    p_run = sub.add_parser("run-pipeline", help="run a declarative JSON pipeline spec")
    p_run.add_argument("--pipeline", required=True, help="path to the JSON spec")
    p_run.add_argument("--show", type=int, default=0, help="print N result rows")

    p_sql = sub.add_parser("sql", help="run SQL over the registered warehouse views")
    p_sql.add_argument("--sf-dir", required=True)
    p_sql.add_argument("--query", required=True)
    p_sql.add_argument("--limit", type=int, default=20)

    args = parser.parse_args(argv)

    from monster_etl_spark import get_spark

    spark = get_spark(app_name=f"monster-etl-spark-{args.cmd}", master=args.master)

    if args.cmd == "v2f-extract":
        from monster_etl_spark.plans.v2f import run_extraction_pipeline

        run_extraction_pipeline(spark, args.input_dir, args.output_dir)
    elif args.cmd == "v2f-dataset-specific":
        from monster_etl_spark.plans.v2f import run_dataset_specific_pipeline

        run_dataset_specific_pipeline(spark, args.input_dir, args.output_dir)
    elif args.cmd == "run-pipeline":
        from monster_etl_spark.plans.runner import run_pipeline

        with open(args.pipeline) as fh:
            spec = json.load(fh)
        df = run_pipeline(spark, spec)
        if args.show:
            for row in df.take(args.show):
                print(json.dumps(row.asDict(), default=str))
    elif args.cmd == "sql":
        from monster_etl_spark.sql import sql as run_sql

        for row in run_sql(spark, args.sf_dir, args.query).take(args.limit):
            print(json.dumps(row.asDict(), default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
