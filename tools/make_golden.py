"""Generate golden parquet files for the driver-visible oracle checks of the
non-SQL-expressible queries (minhash_lsh_dedup, simhash_near_dup).

This is an INDEPENDENT single-process re-implementation of the dedup
semantics — plain Python sets + union-find + direct-formula hashing, no
Spark, no shared code with the engine's vectorized dataflow (the hash
definitions are shared *by spec*: xxhash64(seed 42) token hashes, the
polynomial gram hash sum h[s+j]*C^(w-1-j), splitmix64 finalizer, bit-vote
SimHash — all public constructions, reimplemented here scalar-wise from the
formulas; the engine computes them via numpy prefix tricks).

Outputs (committed to the repo; regenerate with `python tools/make_golden.py`):
  golden/minhash_clusters_sf001.parquet
      (doc_id, cluster_id, confidence_score, duplicate_count,
       is_representative) — expected flagship clustering of
      /root/testdata/sf0.01/documents.parquet at DedupeConfig defaults with
      the substring pass off. Truth = exact all-pairs Jaccard >= 0.8 over
      hashed shingle sets + exact-text groups; the engine's LSH band config
      (32 bands x 4 rows) has P(miss | J=0.8) < 6e-8, so candidate
      generation is lossless on this corpus and the outputs must be equal.
  golden/simhash_pairs_sf001.parquet
      (id1, id2, hamming, simhash_sim) — all pairs at hamming <= 8; the
      engine's 9-chunk pigeonhole banding is exhaustive for hamming <= 8 by
      construction, so again equality, not approximation.

The driver's DuckDB oracle reads these via read_parquet() — see
__spark_entry__.oracle_sql.
"""

from __future__ import annotations

import os
import sys
from itertools import combinations

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fuzzy_dedupe_pipeline_spark.oracle import normalize_text
from fuzzy_dedupe_pipeline_spark.pyxxh import xxh64_str

SF_DIR = os.environ.get("GOLDEN_SF_DIR", "/root/testdata/sf0.01")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "golden")

_M = (1 << 64) - 1
_GOLDEN = 0x9E3779B97F4A7C15
_C = 0x5DEECE66DB
K = 5                 # DedupeConfig.shingle_k
THETA = 0.8           # DedupeConfig.jaccard_threshold
SIM_T = 0.85          # DedupeConfig.simhash_sim_threshold
CAP = 0.95            # DedupeConfig.confidence_cap
MAX_HAMMING = 8       # __spark_entry__._q_simhash_pairs


def round6(x: float) -> float:
    """HALF_UP at 6dp — Spark's round() semantics; Python round() is
    banker's (half-even) and differs on exact .5 ulps like 0.9203125."""
    import math

    return math.floor(x * 1e6 + 0.5) / 1e6


def splitmix64(x: int) -> int:
    z = (x + _GOLDEN) & _M
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M
    return z ^ (z >> 31)


def shingle_hashes(text: str, k: int = K) -> frozenset[int]:
    """DISTINCT k-gram polynomial hashes of the xxhash64 token stream —
    direct per-window evaluation of g = splitmix64(sum_j h[s+j]*C^(k-1-j))
    (the engine computes the same value via an invertible-prefix numpy trick;
    rows with 0 < n < k get one whole-row gram)."""
    toks = normalize_text(text).split()
    n = len(toks)
    if n == 0:
        return frozenset()
    h = [xxh64_str(t) for t in toks]
    w = min(n, k)
    out = set()
    for s in range(max(n - k + 1, 1)):
        acc = 0
        for j in range(w):
            acc = (acc + h[s + j] * pow(_C, w - 1 - j, 1 << 64)) & _M
        out.add(splitmix64(acc))
    return frozenset(out)


def simhash(shingles: frozenset[int]) -> int:
    if not shingles:
        return 0
    n = len(shingles)
    bits = 0
    for b in range(64):
        ones = sum((g >> b) & 1 for g in shingles)
        if ones * 2 > n:
            bits |= 1 << b
    return bits


def jaccard(a: frozenset, b: frozenset) -> float:
    if not a and not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


class UF:
    def __init__(self):
        self.p: dict[str, str] = {}

    def find(self, x: str) -> str:
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            if ra < rb:
                self.p[rb] = ra
            else:
                self.p[ra] = rb


def main() -> None:
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    ids = [str(d) for d in docs["doc_id"]]
    texts = {str(d): (t if isinstance(t, str) else "") for d, t in zip(docs["doc_id"], docs["text"])}
    os.makedirs(OUT_DIR, exist_ok=True)

    # --- shared precompute -------------------------------------------------
    norm = {i: normalize_text(texts[i]) for i in ids}
    sh = {i: shingle_hashes(texts[i]) for i in ids}
    simh = {i: simhash(sh[i]) for i in ids}

    # --- minhash_lsh_dedup golden ------------------------------------------
    # exact groups: identical normalized text (includes the empty-text group)
    by_text: dict[str, list[str]] = {}
    for i in ids:
        by_text.setdefault(norm[i], []).append(i)
    uf = UF()
    edge_conf: dict[str, float] = {}
    for grp in by_text.values():
        grp.sort()
        rep = grp[0]
        uf.find(rep)
        for m in grp[1:]:
            uf.union(rep, m)
            edge_conf[m] = max(edge_conf.get(m, 0.0), 1.0)
            edge_conf[rep] = max(edge_conf.get(rep, 0.0), 1.0)
    # near edges among exact-representatives: exact Jaccard >= theta
    reps = sorted(min(g) for g in by_text.values())
    for a, b in combinations(reps, 2):
        j = jaccard(sh[a], sh[b])
        if j >= THETA:
            uf.union(a, b)
            ham = bin(simh[a] ^ simh[b]).count("1")
            sim = 1.0 - ham / 64.0
            conf = min(CAP, (j + sim) / 2) if sim >= SIM_T else j
            edge_conf[a] = max(edge_conf.get(a, 0.0), conf)
            edge_conf[b] = max(edge_conf.get(b, 0.0), conf)

    cluster = {i: uf.find(i) for i in ids}
    sizes: dict[str, int] = {}
    for i in ids:
        sizes[cluster[i]] = sizes.get(cluster[i], 0) + 1
    # representative: longest raw text, id asc tiebreak, within cluster
    best: dict[str, tuple[int, str]] = {}
    for i in ids:
        key = (-len(texts[i]), i)
        c = cluster[i]
        if c not in best or key < best[c]:
            best[c] = key
    rows = [
        {
            "doc_id": i,
            "cluster_id": cluster[i],
            "confidence_score": round6(edge_conf.get(i, 1.0)),
            "duplicate_count": sizes[cluster[i]],
            "is_representative": best[cluster[i]][1] == i,
        }
        for i in ids
    ]
    df = pd.DataFrame(rows)
    df["duplicate_count"] = df["duplicate_count"].astype("int32")
    df.to_parquet(f"{OUT_DIR}/minhash_clusters_sf001.parquet", index=False)
    print(
        f"minhash golden: {len(df)} rows, "
        f"{df['cluster_id'].nunique()} clusters -> {OUT_DIR}"
    )

    # --- simhash_near_dup golden --------------------------------------------
    nonempty = [i for i in ids if sh[i]]
    prows = []
    for a, b in combinations(sorted(nonempty), 2):
        ham = bin(simh[a] ^ simh[b]).count("1")
        if ham <= MAX_HAMMING:
            prows.append(
                {
                    "id1": a,
                    "id2": b,
                    "hamming": ham,
                    "simhash_sim": round6(1.0 - ham / 64.0),
                }
            )
    pdf = pd.DataFrame(prows, columns=["id1", "id2", "hamming", "simhash_sim"])
    pdf["hamming"] = pdf["hamming"].astype("int32")
    pdf.to_parquet(f"{OUT_DIR}/simhash_pairs_sf001.parquet", index=False)
    print(f"simhash golden: {len(pdf)} pairs")


if __name__ == "__main__":
    main()
