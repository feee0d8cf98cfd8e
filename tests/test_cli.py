"""CLI entry-point tests (the reference's caseapp mains analogue)."""

import json
import subprocess
import sys


def _run(*args):
    return subprocess.run(
        [sys.executable, "-m", "monster_etl_spark", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )


def test_cli_run_pipeline_with_join_and_aggregate(tmp_path):
    spec = {
        "source": {"format": "parquet", "path": "/root/testdata/sf0.001/lineitem.parquet"},
        "steps": [
            {"op": "filter", "condition": "l_quantity > 10"},
            {"op": "rename_fields", "mapping": {"l_orderkey": "o_orderkey"}},
            {
                "op": "join",
                "source": {"format": "parquet", "path": "/root/testdata/sf0.001/orders.parquet"},
                "select": ["o_orderkey", "o_orderstatus"],
                "on": ["o_orderkey"],
                "broadcast": True,
            },
            {
                "op": "aggregate",
                "group_by": ["o_orderstatus"],
                "aggs": {"n_items": "count(*)"},
            },
        ],
    }
    f = tmp_path / "spec.json"
    f.write_text(json.dumps(spec))
    res = _run("--master", "local[2]", "run-pipeline", "--pipeline", str(f), "--show", "5")
    assert res.returncode == 0, res.stderr[-2000:]
    rows = [json.loads(line) for line in res.stdout.splitlines() if line.startswith("{")]
    assert {r["o_orderstatus"] for r in rows} == {"O", "F", "P"}
    assert all(r["n_items"] > 0 for r in rows)


def test_cli_sql(tmp_path):
    res = _run(
        "--master", "local[2]", "sql",
        "--sf-dir", "/root/testdata/sf0.001",
        "--query", "SELECT count(*) AS n FROM nation",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    out = [json.loads(line) for line in res.stdout.splitlines() if line.startswith("{")]
    assert out == [{"n": 25}]


def test_cli_rejects_unknown_subcommand():
    res = _run("frobnicate")
    assert res.returncode != 0
    assert "invalid choice" in res.stderr
