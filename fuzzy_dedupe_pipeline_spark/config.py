"""Dedupe pipeline configuration.

All constants that define the *semantics* of a run live here so that a rerun at
identical config is bit-for-bit reproducible (the north rule's "identical
shingle/signature config"). Threshold constants mirror the reference cascade:

- jaccard_threshold 0.8  <- semantic_threshold (dedupe_logic/processor.py:29,149)
- simhash_sim_threshold 0.85 <- address_threshold (processor.py:29,164)
- hybrid_secondary_threshold 0.7 <- the `address_score >= 0.7` arm of the
  hybrid rule (processor.py:161)
- confidence_cap 0.95 (processor.py:163,166)
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class DedupeConfig:
    # --- shingling / MinHash ---------------------------------------------
    shingle_k: int = 5          # word-shingle width over normalize_text output
    num_hashes: int = 128       # MinHash signature width
    lsh_bands: int = 32         # bands
    lsh_rows: int = 4           # rows per band; bands*rows == num_hashes
    seed: int = 42              # seeds the (a_i, b_i) permutation params

    # --- SimHash ----------------------------------------------------------
    simhash_bits: int = 64

    # --- substring (winnowed fingerprint) pass ----------------------------
    substring_gram: int = 35    # tokens per rolling-hash gram
    winnow_window: int = 16     # winnowing window (guarantee: runs >= gram+window-1 tokens)
    # substring verification: a shared verbatim run of R tokens yields ~R-k+1
    # shared k-shingles, so requiring >= 40 shared shingles ~ a >= 44-token
    # verified overlap (ratio-based containment fails when the run is embedded
    # in a much larger host doc). Docs shorter than ~44 tokens can't qualify.
    substring_min_shared_shingles: int = 40

    # --- verification cascade (reference J6 analog) ------------------------
    jaccard_threshold: float = 0.8        # primary theta (processor.py:149)
    simhash_sim_threshold: float = 0.85   # 'jaccard+simhash' arm (processor.py:164)
    hybrid_secondary_threshold: float = 0.7  # hybrid arm secondary (processor.py:161)
    confidence_cap: float = 0.95          # (processor.py:163,166)

    # --- verification -------------------------------------------------------
    # semi-join prefilter: only candidate endpoints' signatures enter the
    # verify scoring joins. Wins when candidates cover a small fraction of
    # docs (the 100 TB case); adds one id-only shuffle + a stage dependency,
    # so tiny corpora can disable it.
    verify_prefilter: bool = True

    # --- skew / scale knobs -------------------------------------------------
    max_band_bucket: int = 5000   # cap on rows per (band, hash) bucket; larger buckets
                                  # are dropped from pair-gen and logged to metrics
    cc_max_iters: int = 50        # connected-components iteration cap
    # reliable-checkpoint dir (HDFS/S3/local) for the CC iteration; None ->
    # localCheckpoint (fast, but blocks die with their executor — set this on
    # any real multi-executor cluster)
    checkpoint_dir: str | None = None
    shuffle_partitions: int | None = None  # None -> leave session setting

    def __post_init__(self) -> None:
        if self.lsh_bands * self.lsh_rows != self.num_hashes:
            raise ValueError(
                f"lsh_bands({self.lsh_bands}) * lsh_rows({self.lsh_rows}) "
                f"must equal num_hashes({self.num_hashes})"
            )


DEFAULT_CONFIG = DedupeConfig()
