"""fuzzy_dedupe_pipeline_spark — a from-scratch PySpark-native near-duplicate
detection + clustering engine.

Re-realizes the *semantics* of ClaytonS2013/fuzzy-dedupe-pipeline
(candidate-generation -> pair-verification -> cluster-merge -> canonical output,
see /root/reference/dedupe_logic/processor.py) as a scalable Spark batch job
over Common-Crawl-style web pages:

- candidate generation: MinHash/LSH banding + SimHash + winnowed substring
  fingerprints (replacing the reference's embedding+FAISS top-k self-join,
  dedupe_logic/processor.py:120-138)
- verification: exact Jaccard over shingle sets (replacing cosine >= 0.8,
  dedupe_logic/processor.py:149)
- clustering: iterative min-label-propagation connected components in pure
  DataFrame joins (replacing BFS, dedupe_logic/processor.py:206-228)
- canonical output: representative window + cluster stats
  (dedupe_logic/processor.py:236-253)

Everything is DataFrame-first: built-in pyspark.sql.functions where possible,
vectorized Arrow pandas UDFs for signature math, zero per-row Python UDFs.
"""

from fuzzy_dedupe_pipeline_spark.config import DedupeConfig

__all__ = ["DedupeConfig"]
__version__ = "0.1.0"
