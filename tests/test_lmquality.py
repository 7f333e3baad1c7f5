"""Unigram cross-entropy scoring (lmquality.py): scalar-reference agreement,
monotonicity (common-token prose scores lower than rare-token soup), edge
cases (empty / single-token docs), and determinism under repartition."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fuzzy_dedupe_pipeline_spark.lmquality import (
    cross_entropy_scores,
    unigram_logprobs,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the the the the"),
    (2, "zq xv qq jj zx"),
    (3, "the cat"),
    (4, ""),           # zero tokens -> absent from output
    (5, "   "),        # whitespace only -> absent from output
    (6, "mat"),
]


def _scalar_scores():
    """Pure-Python re-derivation of the module contract (fit + score)."""
    toks = {i: t.split() for i, t in DOCS}
    counts: dict[str, int] = {}
    for ts in toks.values():
        for t in ts:
            counts[t] = counts.get(t, 0) + 1
    n_total = sum(counts.values())
    v = len(counts)
    logp = {t: round(math.log((n + 1) / (n_total + v)), 6) for t, n in counts.items()}
    out = {}
    for i, ts in toks.items():
        if not ts:
            continue
        per_term: dict[str, int] = {}
        for t in ts:
            per_term[t] = per_term.get(t, 0) + 1
        s = sum(round(c * logp[t], 6) for t, c in per_term.items())
        out[i] = (len(ts), -s / len(ts))
    return out


def _df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_matches_scalar_reference(spark):
    got = {
        r.doc_id: (r.n_tokens, r.cross_entropy)
        for r in cross_entropy_scores(_df(spark)).collect()
    }
    want = _scalar_scores()
    assert set(got) == set(want)  # docs 4 and 5 absent from both
    for i, (n, ce) in want.items():
        assert got[i][0] == n
        assert abs(got[i][1] - ce) < 1e-5, (i, got[i], ce)


def test_common_tokens_score_lower_than_rare(spark):
    got = {r.doc_id: r.cross_entropy for r in cross_entropy_scores(_df(spark)).collect()}
    # doc 1 is pure 'the' (the most frequent token): lowest cross-entropy;
    # doc 2 is five hapaxes: the highest.
    assert got[1] == min(got.values())
    assert got[2] == max(got.values())
    assert got[1] < got[0] < got[2]


def test_logprobs_are_a_proper_model(spark):
    rows = unigram_logprobs(_df(spark)).collect()
    # every logp strictly negative; more frequent token => higher logp
    by_tok = {r.tok: r.logp for r in rows}
    assert all(lp < 0 for lp in by_tok.values())
    assert by_tok["the"] > by_tok["cat"] > by_tok["zq"] - 1e-12
    # add-one smoothing over the seen vocab is a PROPER distribution:
    # sum (n_t + 1) / (N + V) = 1 exactly (up to the 6dp logp rounding)
    assert abs(sum(math.exp(lp) for lp in by_tok.values()) - 1.0) < 1e-3


def test_deterministic_under_repartition(spark):
    df = _df(spark)
    a = sorted(map(tuple, cross_entropy_scores(df).collect()))
    b = sorted(map(tuple, cross_entropy_scores(df.repartition(7, "doc_id")).collect()))
    assert a == b
