"""Iterative graph primitives on DataFrames.

Near-dup pipelines end with "pick one survivor per duplicate *cluster*",
and clusters are the connected components of the pair graph. With no graph
library in scope, components are computed by iterative min-label
propagation over joins — the standard map-reduce formulation:

    label(n) <- min(label(n), min over neighbors m of label(m))

repeated until fixpoint. Converges in O(graph diameter) rounds; near-dup
graphs are collections of small cliques, so the loop is short. Each round
is one join + aggregate; ``localCheckpoint`` truncates the plan lineage so
the DAG does not grow with iterations (the classic iterative-Spark trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in ``pairs``; the component id is
    the minimum node id in the component (deterministic, engine-agnostic).

    Raises if the fixpoint is not reached within ``max_iter`` rounds (a
    diameter larger than max_iter — raise the bound for pathological
    chain-shaped graphs).
    """
    edges = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    edges = edges.union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    edges = edges.localCheckpoint(eager=True)

    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        neigh = (
            edges.join(labels, edges.b == labels.node)
            .groupBy(edges.a.alias("n"))
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neigh, labels.node == neigh.n, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("new")
            .join(labels.alias("old"), "node")
            .filter(F.col("new.label") != F.col("old.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")


def dedup_survivors(
    df: DataFrame, pairs: DataFrame, id_col: str, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """Keep one row per near-dup cluster: the row whose id IS the component
    label (the cluster minimum), plus every row not in any pair."""
    comps = connected_components(pairs, src, dst)
    losers = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
