"""[EXT] Duplicate-cluster extraction: connected components over the
near-duplicate pair graph.

Pair generators (Jaccard/MinHash/cosine) emit edges; a dedup pipeline
needs *clusters* (keep one doc per component, drop the rest), which is
transitive closure. Implemented as iterative minimum-label propagation
in plain DataFrame ops — the standard large-graph formulation (what
GraphX/GraphFrames run underneath): each round every node adopts the
smallest label in its neighborhood; converges in graph-diameter rounds.
Near-dup graphs are shallow (dup clusters are cliques-ish), so a handful
of rounds suffice at any scale.

Scale notes: each round is one shuffle (join on node) + an aggregation;
``localCheckpoint`` truncates the lineage so the plan does not grow
O(rounds); the early-exit count stops at fixpoint. Cluster id = the
component's minimum doc_id — deterministic, no arbitrary survivor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc1",
    dst: str = "doc2",
    max_iter: int = 25,
) -> DataFrame:
    """(node, cluster_id) for every node appearing in ``edges``;
    cluster_id = min node id of the component."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neigh = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neigh, labels["node"] == neigh["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("cluster_id"))


def dedup_survivors(
    docs: DataFrame, components: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Keep one doc per duplicate cluster (the min-id member) plus all
    docs not in any cluster — the drop-list complement an LLM dedup
    pass materializes."""
    tagged = docs.join(
        components, docs[id_col] == components["node"], "left"
    ).drop("node")
    return tagged.filter(
        F.col("cluster_id").isNull() | (F.col(id_col) == F.col("cluster_id"))
    ).drop("cluster_id")
