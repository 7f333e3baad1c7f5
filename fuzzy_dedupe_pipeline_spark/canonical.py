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


def quality_representatives(
    members: DataFrame,  # (id, cluster_id)
    scores: DataFrame,   # (id, <score_col>)
    score_col: str = "quality_score",
) -> DataFrame:
    """Quality-aware canonical selection: per near-dup cluster, keep the
    member with the HIGHEST quality score (ties -> smallest id) — what
    web-curation pipelines do with dedup clusters (keep the best page of a
    near-dup family, not an arbitrary one; C4/Gopher/Dolma all pick a
    survivor by a quality signal rather than first-seen). Extends A3: the
    reference's "most complete record" arg-max (dedupe_logic/
    processor.py:236-244) with the quality model standing in for field
    completeness.

    Returns (cluster_id, rep_id, rep_score, n_members).

    Scale shape: one equi-join of members to scores on id, then ONE
    partial-aggregable groupBy on cluster_id — the arg-max is a struct MIN
    over (-score, id), so map-side combine collapses every partition's
    contribution to one row per cluster BEFORE the exchange and a giant
    boilerplate cluster (millions of members) never sorts: no window, no
    per-cluster skew. (-x is exact in IEEE, so un-negating reproduces the
    score bit-for-bit.) Members without a score row are dropped by the
    inner join — score every doc first (quality_score_cols is map-only).
    """
    joined = members.join(scores.select("id", score_col), "id")
    return (
        joined.groupBy("cluster_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col(score_col)).alias("_neg_score"),
                    F.col("id").alias("_id"),
                )
            ).alias("_best"),
            F.count("*").cast("long").alias("n_members"),
        )
        .select(
            "cluster_id",
            F.col("_best._id").alias("rep_id"),
            (-F.col("_best._neg_score")).alias("rep_score"),
            "n_members",
        )
    )


def cluster_output(
    members: DataFrame,  # (id, cluster_id)
    edges: DataFrame,    # verified pairs: (id1, id2, confidence, ...)
    pages: DataFrame,    # (id, text_final) OR (id, text_len) for completeness ordering
) -> DataFrame:
    """clusters(url, cluster_id, confidence_score, duplicate_count,
    is_representative) — FIXTURES.md F5 shape.

    duplicate_count is a full-frame window count over the SAME cluster_id
    partitioning the representative pick already shuffles on (r6) — the
    former groupBy(cluster_id)+join shape paid an extra aggregate exchange
    and a join for a value the window partition holds for free (guide §2.4:
    window keyed like the preceding operation needs no second shuffle).
    Identical values: count over the whole partition = component size."""
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
        members.join(member_conf, "id", "left")
        .join(lens, "id", "left")
        .select(
            "id",
            "cluster_id",
            F.coalesce("edge_conf", F.lit(1.0)).alias("confidence_score"),
            F.coalesce("text_len", F.lit(0)).alias("text_len"),
        )
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("text_len"), F.asc("id")  # completeness desc, id as total-order tiebreak
    )
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return enriched.select(
        F.col("id").alias("url"),
        "cluster_id",
        "confidence_score",
        F.count("*").over(full).cast("int").alias("duplicate_count"),
        (F.row_number().over(w) == 1).alias("is_representative"),
    )
