"""Property-based tests (SURVEY §5.5): invariants that hold for ALL inputs.

Spark-session-per-example is too slow for hypothesis, so each property runs
the ENGINE expression once over a DataFrame built from the whole example
batch — same engine code path, hypothesis-grade input coverage.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fuzzy_dedupe_pipeline_spark.normalize import normalize_text_col

# the reference's normalize (processor.py:53-60), reimplemented as the oracle
_WS = re.compile(r"\s+", re.UNICODE)
_NW = re.compile(r"[^\w\s]", re.UNICODE)


def _ref_normalize(s: str | None) -> str:
    if s is None:
        return ""
    out = s.lower().strip()
    out = _WS.sub(" ", out)
    out = _NW.sub("", out)
    return out


# combining marks / format chars / non-decimal numbers excluded: Java's
# (?U)\w and Python's re \w genuinely classify Mn/Mc/Me/Cf and No/Nl (e.g.
# '¼', 'Ⅷ') differently — known JVM-vs-CPython regex divergences outside the
# reference's input domain (Latin business records). The filter checks the
# post-lower() form too: case-mapping can INTRODUCE excluded chars (e.g.
# 'İ'.lower() == 'i' + combining dot U+0307).
import unicodedata as _ud

_EXCL_CATS = {"Mn", "Mc", "Me", "Cf", "Co", "Cn", "No", "Nl"}


def _stable_char(ch: str) -> bool:
    """Code point classified identically by both runtimes' Unicode tables.

    CPython 3.11 ships Unicode 14, JVM 17 ships Unicode 13 — a letter added
    in 14 (hypothesis found U+1DF00) is \\w to Python re but unassigned (not
    \\w) to Java (?U). There is no per-version table in the stdlib, but
    `unicodedata.ucd_3_2_0` IS shipped (for IDNA): requiring assignment in
    Unicode 3.2 guarantees both runtimes know the char, and category
    stability policy keeps its \\w/\\s class from migrating between the
    excluded and included sets afterwards (we check BOTH databases against
    the exclusion list to be safe, e.g. U+180E Zs->Cf in 6.3)."""
    return (
        _ud.category(ch) not in _EXCL_CATS
        and _ud.ucd_3_2_0.category(ch) not in _EXCL_CATS
    )


def _parity_domain(s: str) -> bool:
    # \x1c-\x1f: CPython str/re treat them as whitespace, the Unicode
    # White_Space property (Java (?U)\s) does not — another cross-runtime
    # divergence excluded from the parity domain
    if any("\x1c" <= ch <= "\x1f" for ch in s):
        return False
    return all(_stable_char(ch) for ch in s + s.lower())


TEXTS = st.lists(
    st.one_of(
        st.none(),
        st.text(
            alphabet=st.characters(
                blacklist_categories=(
                    "Mn", "Mc", "Me", "Cf", "Co", "Cn", "No", "Nl"
                )
            ),
            max_size=60,
        ).filter(_parity_domain),
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Lu", "Ll", "Nd", "Zs", "Po", "Sm")
            ),
            max_size=120,
        ).filter(_parity_domain),
        st.text(alphabet=" \t\n\r\x0b\x0c abc_!.", max_size=30),
    ),
    min_size=1,
    max_size=60,
)


def _normalize_batch(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    rows = (
        df.select("i", normalize_text_col(F.col("t")).alias("n"))
        .orderBy("i")
        .collect()
    )
    return [r["n"] for r in rows]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=TEXTS)
def test_normalize_matches_reference_regexes(spark, texts):
    got = _normalize_batch(spark, texts)
    want = [_ref_normalize(t) for t in texts]
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=TEXTS)
def test_normalize_token_idempotent(spark, texts):
    """normalize is idempotent at TOKEN level (what shingling consumes).
    Plain string idempotence does NOT hold — for the reference either:
    punct removal can leave edge whitespace ('0 :' -> '0 ') that a second
    pass would trim. The engine's tokens_raw_col's empty-string filter
    absorbs exactly that, so token streams are stable under re-normalization
    (hypothesis found the counterexample; the reference behaves identically)."""
    once = _normalize_batch(spark, texts)
    twice = _normalize_batch(spark, once)
    assert [o.split() for o in once] == [t.split() for t in twice]


def test_cc_label_is_component_min(spark):
    """CC invariant on a random graph: every node's label == min id reachable
    from it (checked against a driver-side union-find)."""
    import random

    from fuzzy_dedupe_pipeline_spark.cc import connected_components

    rng = random.Random(7)
    nodes = [f"n{i:03d}" for i in range(120)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]

    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in nodes if find(n) != n or any(n in e for e in edges)}

    df = spark.createDataFrame(edges, "id1 string, id2 string")
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components(df).collect()
    }
    for node, label in got.items():
        assert label == find(node), (node, label, find(node))


def test_jaccard_symmetric_and_bounded(spark):
    """verify_pairs' Jaccard: symmetric under pair orientation, in [0,1],
    1.0 iff identical shingle sets."""
    from fuzzy_dedupe_pipeline_spark.config import DedupeConfig
    from fuzzy_dedupe_pipeline_spark.minhash import with_signatures
    from fuzzy_dedupe_pipeline_spark.verify import verify_pairs

    cfg = DedupeConfig()
    texts = {
        "a": "one two three four five six seven eight nine ten",
        "b": "one two three four five six seven eight nine ten",
        "c": "one two three four five six SEVEN eight nine ten",
        "d": "totally different words in this document here now",
    }
    sigs = with_signatures(
        spark.createDataFrame(list(texts.items()), "url string, text_norm string"),
        cfg,
        id_col="url",
        text_col="text_norm",
    )
    cand = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d"), ("c", "d")],
        "id1 string, id2 string",
    )
    flipped = cand.select(
        F.col("id2").alias("id1"), F.col("id1").alias("id2")
    )
    j1 = {
        frozenset((r["id1"], r["id2"])): r["jaccard"]
        for r in verify_pairs(cand, cand.limit(0), sigs, cfg)
        .select("id1", "id2", "jaccard")
        .collect()
    }
    j2 = {
        frozenset((r["id1"], r["id2"])): r["jaccard"]
        for r in verify_pairs(flipped, flipped.limit(0), sigs, cfg)
        .select("id1", "id2", "jaccard")
        .collect()
    }
    assert j1 == j2
    assert j1[frozenset(("a", "b"))] == 1.0
    for v in j1.values():
        assert 0.0 <= v <= 1.0


# --------------------------------------------------------------------------
# decontamination: flag iff n-gram set intersection is nonempty (scalar ref)
# --------------------------------------------------------------------------

_WORDS = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
    min_size=0,
    max_size=12,
)
_DOC_SETS = st.tuples(
    st.lists(_WORDS, min_size=1, max_size=6),  # training docs (token lists)
    st.lists(_WORDS, min_size=1, max_size=3),  # eval docs
    st.integers(min_value=1, max_value=4),     # n
)


def _scalar_grams(toks: list[str], n: int) -> set[str]:
    return {
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=_DOC_SETS)
def test_decontaminate_matches_set_intersection(spark, case):
    from fuzzy_dedupe_pipeline_spark.decontam import decontaminate

    train_toks, eval_toks, n = case
    tr = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(train_toks)],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(eval_toks)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.contaminated, r.n_hits)
        for r in decontaminate(tr, ev, n=n).collect()
    }
    eval_grams = set().union(*(_scalar_grams(t, n) for t in eval_toks))
    for i, toks in enumerate(train_toks):
        hits = _scalar_grams(toks, n) & eval_grams
        assert got[i] == (bool(hits), len(hits)), (i, toks, n)


# --------------------------------------------------------------------------
# quota sampling: engine selection == scalar sort by (mix, key) per stratum
# --------------------------------------------------------------------------

@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    k=st.integers(min_value=1, max_value=5),
    salt=st.integers(min_value=0, max_value=100),
)
def test_quota_sample_matches_scalar_ranking(spark, ids, k, salt):
    from fuzzy_dedupe_pipeline_spark.sampling import (
        KNUTH_A,
        MIX_MOD,
        quota_sample,
    )

    d = spark.createDataFrame(
        [(i, "s" + str(i % 3)) for i in ids], "doc_id long, source string"
    )
    got = sorted(
        (r.source, r.sample_rank, r.doc_id)
        for r in quota_sample(d, ["source"], k=k, salt=salt).collect()
    )
    want = []
    for s in {"s" + str(i % 3) for i in ids}:
        members = sorted(
            (i for i in ids if "s" + str(i % 3) == s),
            key=lambda i: (((i + salt) * KNUTH_A) % MIX_MOD, i),
        )
        want.extend((s, rank + 1, i) for rank, i in enumerate(members[:k]))
    assert got == sorted(want)
