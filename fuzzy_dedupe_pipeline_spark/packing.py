"""Sequence packing — curated documents into fixed-capacity context windows.

The step after dedup / filtering / sampling in a training-data pipeline:
the corpus is cut into training sequences of exactly ``capacity`` tokens.
Two standard shapes, both deterministic and resume-stable:

* ``pack_concat_chunks`` — GPT-style concat-then-chunk: within each
  content-stable pack group, documents are laid out in a deterministic
  order (the sampling module's Knuth mix; stable under repartition/resume,
  unlike any partition-order scheme) and the concatenated token stream is
  cut every ``capacity`` tokens, documents straddling cuts. Pure DataFrame:
  ONE hash shuffle on the group key, a window cumulative sum, integer
  arithmetic — whole-stage codegen end to end, and an ANSI-SQL oracle
  reproduces every output cell bit-for-bit (the driver correctness row).

* ``pack_first_fit`` — whole-document packing (no document crosses a
  sequence boundary; the padding-free bin-packing form): per group,
  first-fit-decreasing over (n_tokens desc, key asc). Runs as one
  applyInPandas stage with a numpy loads vector per group. FFD's classic
  guarantee — at most ONE bin per group ends at most half full — makes
  overall fill an invariant the gate query checks, not a hope. Documents
  longer than ``capacity`` get a singleton bin flagged ``overflow`` (never
  silently truncated; splitting is the concat-chunk form's job).

Scale: pack groups are pmod(mix(key), n_groups) — content-stable, and
``n_groups`` scales with the corpus so per-task state is O(group), never
O(corpus); both packers run inside a single shuffle stage and nothing
corpus-sized touches the driver. The FFD inner loop is a per-group numpy
first-fit scan (O(docs x bins) vector ops per task, bounded by the group);
the concat-chunk form has no Python at all.

Reference parity: the reference pipeline emits deduped records and stops
(reference/main.py); packing extends the surface to what its output feeds
at web scale — sequence construction for a training loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fuzzy_dedupe_pipeline_spark.sampling import mix_col
from fuzzy_dedupe_pipeline_spark.textstats import token_count_col


def pack_concat_chunks(
    docs: DataFrame,
    capacity: int,
    n_groups: int = 8,
    key_col: str = "doc_id",
    text_col: str = "text",
    salt: int = 0,
) -> DataFrame:
    """Concat-then-chunk layout: (key, pack_group, n_tokens, tok_start,
    bin_first, bin_last) — the doc's tokens occupy stream positions
    [tok_start, tok_start + n_tokens) of its group, i.e. training sequences
    bin_first..bin_last (0-based, each ``capacity`` tokens wide).

    Everything is integer arithmetic over per-doc token counts: one shuffle
    (the window's hash partitioning on pack_group), no UDFs, no state. The
    window's RANGE frame is safe because (mix, key) is a total order.
    """
    cap = int(capacity)
    if cap <= 0:
        raise ValueError("capacity must be positive")
    base = docs.select(
        F.col(key_col),
        F.pmod(mix_col(F.col(key_col), salt), F.lit(n_groups))
        .cast("int")
        .alias("pack_group"),
        token_count_col(F.col(text_col)).cast("long").alias("n_tokens"),
        mix_col(F.col(key_col), salt).alias("_mix"),
    )
    w = Window.partitionBy("pack_group").orderBy(
        F.col("_mix").asc(), F.col(key_col).asc()
    )
    staged = base.select(
        key_col,
        "pack_group",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("tok_start"),
    )
    first = F.floor(F.col("tok_start") / cap).cast("long")
    # empty docs (n_tokens = 0) occupy no positions: bin_last = bin_first
    last = F.greatest(
        first,
        F.floor((F.col("tok_start") + F.col("n_tokens") - 1) / cap).cast(
            "long"
        ),
    )
    return staged.select(
        key_col,
        "pack_group",
        "n_tokens",
        "tok_start",
        first.alias("bin_first"),
        last.alias("bin_last"),
    )


def pack_first_fit(
    docs: DataFrame,
    capacity: int,
    n_groups: int = 8,
    key_col: str = "doc_id",
    text_col: str = "text",
    salt: int = 0,
    key_type: str = "long",
) -> DataFrame:
    """Whole-document first-fit-decreasing: (key, pack_group, bin_id,
    n_tokens, overflow). bin_id is group-local (a global sequence id is
    (pack_group, bin_id)); ``overflow`` marks docs with n_tokens > capacity,
    each alone in its bin. Deterministic: the FFD order (n_tokens desc, key
    asc) and first-fit scan are pure functions of the group's rows.

    ``key_type`` declares the key's Spark type in the applyInPandas result
    schema (Arrow needs it static).
    """
    cap = int(capacity)
    if cap <= 0:
        raise ValueError("capacity must be positive")
    schema = (
        f"{key_col} {key_type}, pack_group int, bin_id long, "
        "n_tokens long, overflow boolean"
    )
    base = docs.select(
        F.col(key_col),
        F.pmod(mix_col(F.col(key_col), salt), F.lit(n_groups))
        .cast("int")
        .alias("pack_group"),
        token_count_col(F.col(text_col)).cast("long").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", key_col], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        toks = pdf["n_tokens"].to_numpy(dtype=np.int64)
        n = toks.size
        bin_of = np.empty(n, dtype=np.int64)
        loads = np.zeros(n, dtype=np.int64)  # <= one bin per doc
        nbins = 0
        for i in range(n):
            t = toks[i]
            if t > cap:
                bin_of[i] = nbins  # overflow: singleton bin
                loads[nbins] = t
                nbins += 1
                continue
            fit = np.nonzero(loads[:nbins] + t <= cap)[0]
            if fit.size:
                j = int(fit[0])
            else:
                j = nbins
                nbins += 1
            loads[j] += t
            bin_of[i] = j
        return pd.DataFrame(
            {
                key_col: pdf[key_col],
                "pack_group": pdf["pack_group"],
                "bin_id": bin_of,
                "n_tokens": toks,
                "overflow": toks > cap,
            }
        )

    return base.groupBy("pack_group").applyInPandas(pack, schema)


def packing_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """One-row summary of a pack_first_fit result: doc/bin/token counts,
    max bin load, achieved fill factor over non-overflow bins, and the FFD
    half-full invariant count (bins at most half full — FFD guarantees at
    most one per group). One partial-agg shuffle on (pack_group, bin_id)."""
    cap = int(capacity)
    bins = packed.groupBy("pack_group", "bin_id").agg(
        F.sum("n_tokens").alias("bin_tokens"),
        F.max(F.col("overflow").cast("int")).alias("is_overflow"),
        F.count("*").alias("bin_docs"),
    )
    reg = F.col("is_overflow") == 0
    return bins.agg(
        F.sum("bin_docs").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_bins"),
        F.sum("bin_tokens").cast("long").alias("total_tokens"),
        F.max(F.when(reg, F.col("bin_tokens"))).cast("long").alias("max_bin_tokens"),
        (
            F.sum(F.when(reg, F.col("bin_tokens")))
            / (F.count(F.when(reg, 1)) * F.lit(cap))
        ).alias("fill_factor"),
        F.count(F.when(reg & (F.col("bin_tokens") * 2 <= cap), 1))
        .cast("long")
        .alias("half_empty_bins"),
    )
