"""Connected components over the verified-pair edge set.

Replaces the reference's in-memory BFS (dedupe_logic/processor.py:206-228)
with iterative min-label propagation in pure DataFrame joins:

  label(v) <- min(label(v), min over neighbors u of label(u))

repeated to convergence. Each iteration is one equi-join + one groupBy-min —
both map-side-combinable shuffles Catalyst plans with AQE. `localCheckpoint`
after every iteration truncates the lineage so plan size stays constant.
Iterations ~ component diameter; dedup components are star/clique shaped
(exact-dup stars + dense near-dup cliques), so convergence is fast. The label
space is the id itself (min id wins), matching the deterministic cluster_id
definition used by the oracle.

Driver-side loop is unavoidable (Catalyst has no fixpoint operator); per-round
work is fully distributed — only the convergence *count* comes to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, max_iters: int = 50
) -> DataFrame:
    """edges: (id1, id2) undirected (any orientation). Returns
    (id, cluster_id) for every id that appears in an edge; cluster_id = min id
    of its component. Callers attach singletons via left join + coalesce.
    """
    sym = edges.select(
        F.col("id1").alias("src"), F.col("id2").alias("dst")
    ).union(edges.select(F.col("id2").alias("src"), F.col("id1").alias("dst")))
    sym = sym.dropDuplicates(["src", "dst"]).localCheckpoint()

    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("cluster_id"))
        .localCheckpoint()
    )

    for _ in range(max_iters):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.id)
            .select(F.col("src").alias("id"), "cluster_id")
            .union(labels)
            .groupBy("id")
            .agg(F.min("cluster_id").alias("cluster_id"))
        )
        new_labels = neighbor_min.localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def attach_singletons(all_ids: DataFrame, labels: DataFrame) -> DataFrame:
    """all_ids: (id). Every id gets a cluster_id; ids with no edges label
    themselves (reference: singletons are their own cluster,
    dedupe_logic/processor.py:211-228)."""
    return all_ids.join(labels, "id", "left").select(
        "id", F.coalesce("cluster_id", "id").alias("cluster_id")
    )
