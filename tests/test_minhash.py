"""Signature-stage tests: determinism, MinHash accuracy, SimHash locality."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fuzzy_dedupe_pipeline_spark import oracle
from fuzzy_dedupe_pipeline_spark.config import DedupeConfig
from fuzzy_dedupe_pipeline_spark.minhash import with_signatures

CFG = DedupeConfig()


def _sigs(spark, texts):
    df = spark.createDataFrame(
        [(f"{i:06d}", oracle.normalize_text(t)) for i, t in enumerate(texts)],
        "url string, text_norm string",
    )
    return with_signatures(df, CFG).orderBy("id").collect()


def test_signature_determinism(spark):
    texts = ["the quick brown fox jumps over the lazy dog " * 10]
    a = _sigs(spark, texts)
    b = _sigs(spark, texts)
    assert a[0].minhash == b[0].minhash
    assert a[0].simhash == b[0].simhash
    assert sorted(a[0].shingles) == sorted(b[0].shingles)


def test_empty_and_short_docs(spark):
    rows = _sigs(spark, ["", "one two", "a b c d e f"])
    assert rows[0].shingles == [] and rows[0].simhash == 0
    assert len(rows[1].shingles) == 1  # n<k -> single whole-row shingle
    assert len(rows[2].shingles) == 2  # 6 tokens, k=5 -> 2 shingles


def test_minhash_estimates_jaccard(spark, corpus):
    """signature agreement fraction ~ true Jaccard (128 lanes -> se ~0.044)."""
    fam = corpus.truth[corpus.truth.kind == "near"].head(10)
    pages = corpus.pages.set_index("url")
    texts, pairs = [], []
    df = corpus.pages.merge(corpus.truth, on="url")
    for _, row in fam.iterrows():
        grp = df[df.family_id == row.family_id]
        if len(grp) >= 2:
            u = grp.url.tolist()[:2]
            pairs.append((pages.loc[u[0]].text, pages.loc[u[1]].text))
    assert pairs
    flat = [t for p in pairs for t in p]
    rows = _sigs(spark, flat)
    for i, (t1, t2) in enumerate(pairs):
        s1, s2 = np.array(rows[2 * i].minhash), np.array(rows[2 * i + 1].minhash)
        est = (s1 == s2).mean()
        true = oracle.jaccard(
            oracle.shingle_set(t1, CFG.shingle_k), oracle.shingle_set(t2, CFG.shingle_k)
        )
        assert abs(est - true) < 0.2, (est, true)


def test_engine_jaccard_matches_oracle(spark, corpus):
    """Jaccard over rolled-hash shingle sets == Jaccard over string shingles
    (hash collisions are ~2^-64)."""
    df = corpus.pages.merge(corpus.truth, on="url")
    grp = df[df.kind.isin(["near", "exact"])].head(6)
    texts = grp.text.tolist()
    rows = _sigs(spark, texts)
    for i in range(len(texts) - 1):
        a = set(rows[i].shingles)
        b = set(rows[i + 1].shingles)
        got = len(a & b) / len(a | b) if a | b else 0.0
        want = oracle.jaccard(
            oracle.shingle_set(texts[i], CFG.shingle_k),
            oracle.shingle_set(texts[i + 1], CFG.shingle_k),
        )
        assert abs(got - want) < 1e-9


def test_simhash_locality(spark, corpus):
    """near-dup pairs have much smaller Hamming distance than random pairs."""
    df = corpus.pages.merge(corpus.truth, on="url")
    near = df[df.kind == "near"].head(5)
    pages = corpus.pages.set_index("url")
    sims, rands = [], []
    fam_docs = df[df.family_id.isin(near.family_id)]
    uniq = df[df.kind == "unique"].head(6).text.tolist()
    for fid in near.family_id.unique():
        grp = fam_docs[fam_docs.family_id == fid].text.tolist()[:2]
        if len(grp) == 2:
            rows = _sigs(spark, grp)
            sims.append(bin(rows[0].simhash ^ rows[1].simhash).count("1"))
    rows = _sigs(spark, uniq)
    for i in range(0, len(uniq) - 1, 2):
        rands.append(bin(rows[i].simhash ^ rows[i + 1].simhash).count("1"))
    assert np.mean(sims) < np.mean(rands) - 5, (sims, rands)


def test_pyxxh_matches_spark(spark):
    """pyxxh.xxh64 must be bit-identical to Spark's xxhash64 expression
    (seed 42) — the golden-oracle generator relies on it. Covers every
    length regime of the algorithm: empty, <4B, 4-7B, 8-31B, >=32B, plus
    multi-byte UTF-8, an embedded NUL, and little-endian longs."""
    import struct

    from fuzzy_dedupe_pipeline_spark.pyxxh import to_i64, xxh64, xxh64_str

    strings = [
        "",
        "a",
        "abc",
        "abcd",
        "abcdefg",
        "abcdefgh",
        "0123456789abcdef0123456789abcde",   # 31B
        "0123456789abcdef0123456789abcdef",  # 32B
        "the quick brown fox jumps over the lazy dog " * 7,
        "naïve café—ünïcödé 文字列 \U0001f986",
        "nul\x00embedded",
    ] + [f"fuzz-{i}-" + "x" * i for i in range(0, 70, 3)]
    sdf = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {
        r["s"]: r["h"]
        for r in sdf.select("s", F.xxhash64("s").alias("h")).collect()
    }
    for s in strings:
        assert got[s] == to_i64(xxh64_str(s)), repr(s)

    longs = [0, 1, -1, 42, 2**31, -(2**31) - 7, 2**63 - 1, -(2**63)]
    ldf = spark.createDataFrame([(v,) for v in longs], "v long")
    got_l = {
        r["v"]: r["h"]
        for r in ldf.select("v", F.xxhash64("v").alias("h")).collect()
    }
    for v in longs:
        assert got_l[v] == to_i64(xxh64(struct.pack("<q", v))), v


def test_simhash_only_udf_matches_full(spark, corpus):
    """with_simhash is a pure projection of with_signatures: identical
    (n_shingles, simhash) on every doc, including empty/short ones."""
    from fuzzy_dedupe_pipeline_spark.minhash import with_simhash

    df = spark.createDataFrame(
        [(r.url, oracle.normalize_text(r.text)) for r in corpus.pages.itertuples()]
        + [("zz_empty", ""), ("zz_short", "one two")],
        "url string, text_norm string",
    )
    full = {
        r.id: (len(r.shingles), r.simhash)
        for r in with_signatures(df, CFG).collect()
    }
    narrow = {
        r.id: (r.n_shingles, r.simhash)
        for r in with_simhash(df, CFG).collect()
    }
    assert narrow == full
