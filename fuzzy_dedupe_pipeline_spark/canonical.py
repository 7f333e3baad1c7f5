"""Canonical output: representative selection + per-member cluster stats.

Reference semantics (dedupe_logic/processor.py:236-253):
  A3 representative = "most complete" record per cluster (arg-max over a key
     tuple) -> row_number()==1 over a window with a *total* order (the
     reference's Python max keeps first-seen on ties and compares a string
     reviews_count; we define a deterministic total order instead — documented
     deviation, SURVEY.md appendix)
  A4 duplicate_count = component size;
     per-member confidence = max confidence of any incident edge, default 1.0
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cluster_output(
    members: DataFrame,  # (id, cluster_id)
    edges: DataFrame,    # verified pairs: (id1, id2, confidence, ...)
    pages: DataFrame,    # (id, text_final) OR (id, text_len) for completeness ordering
) -> DataFrame:
    """clusters(url, cluster_id, confidence_score, duplicate_count,
    is_representative) — FIXTURES.md F5 shape."""
    sizes = members.groupBy("cluster_id").agg(
        F.count("*").cast("int").alias("duplicate_count")
    )
    # max incident-edge confidence per member (processor.py:249-252)
    incident = edges.select(
        F.col("id1").alias("id"), F.col("confidence")
    ).union(edges.select(F.col("id2").alias("id"), F.col("confidence")))
    member_conf = incident.groupBy("id").agg(
        F.max("confidence").alias("edge_conf")
    )

    lens = (
        pages.select("id", "text_len")
        if "text_len" in pages.columns
        else pages.select("id", F.length("text_final").alias("text_len"))
    )
    enriched = (
        members.join(sizes, "cluster_id")
        .join(member_conf, "id", "left")
        .join(lens, "id", "left")
        .select(
            "id",
            "cluster_id",
            "duplicate_count",
            F.coalesce("edge_conf", F.lit(1.0)).alias("confidence_score"),
            F.coalesce("text_len", F.lit(0)).alias("text_len"),
        )
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("text_len"), F.asc("id")  # completeness desc, id as total-order tiebreak
    )
    return enriched.select(
        F.col("id").alias("url"),
        "cluster_id",
        "confidence_score",
        "duplicate_count",
        (F.row_number().over(w) == 1).alias("is_representative"),
    )
