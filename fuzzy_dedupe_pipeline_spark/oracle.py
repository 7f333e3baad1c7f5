"""In-memory reference-semantics oracle (ground truth for recall tests).

Re-executes the *reference's* normalization byte-for-byte
(dedupe_logic/processor.py:53-60) and defines the true duplicate-pair set as
all pairs with exact shingle-set Jaccard >= theta (the analog of the
reference's cosine >= semantic_threshold gate, processor.py:29,149).

The BASELINE.json metric — dup-pair recall >= 0.99 — is measured against this
set. To stay O(families) instead of O(n^2), true Jaccard is only computed
within planted families (cross-family docs are independent random draws; their
Jaccard is ~0 by construction, asserted by a sampled cross-check in tests).
"""

from __future__ import annotations

import re
from itertools import combinations

import pandas as pd

_WS = re.compile(r"\s+")
_NONWORD = re.compile(r"[^\w\s]")


def normalize_text(text: str | None) -> str:
    """Byte-for-byte re-execution of the reference normalize_text
    (dedupe_logic/processor.py:53-60)."""
    if not text:
        return ""
    text = str(text).lower().strip()
    text = _WS.sub(" ", text)
    text = _NONWORD.sub("", text)
    return text


def normalize_phone(phone: str | None) -> str:
    """Reference normalize_phone (dedupe_logic/processor.py:47-51)."""
    if not phone or phone == "#ERROR!":
        return ""
    return re.sub(r"\D", "", str(phone))


def shingle_set(text: str, k: int = 5) -> set[str]:
    toks = normalize_text(text).split()
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def true_pairs(
    pages: pd.DataFrame,
    truth: pd.DataFrame,
    k: int = 5,
    theta: float = 0.8,
) -> pd.DataFrame:
    """All within-family pairs with exact Jaccard >= theta.

    Returns DataFrame(url1, url2, true_jaccard) with url1 < url2.
    """
    df = pages.merge(truth, on="url")
    rows = []
    for fam, grp in df[df.family_id >= 0].groupby("family_id"):
        urls = grp.url.tolist()
        sets = {u: shingle_set(t, k) for u, t in zip(grp.url, grp.text)}
        for u1, u2 in combinations(urls, 2):
            j = jaccard(sets[u1], sets[u2])
            if j >= theta:
                a, b = (u1, u2) if u1 < u2 else (u2, u1)
                rows.append((a, b, j))
    return pd.DataFrame(rows, columns=["url1", "url2", "true_jaccard"])


def true_clusters(pages: pd.DataFrame, pairs: pd.DataFrame) -> pd.DataFrame:
    """Connected components over the true-pair edge set (union-find);
    mirrors the reference BFS clustering (dedupe_logic/processor.py:206-228).
    Returns DataFrame(url, cluster_id) where cluster_id = min url in component.
    """
    parent: dict[str, str] = {u: u for u in pages.url}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            # deterministic: smaller url wins
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb

    for u1, u2 in zip(pairs.url1, pairs.url2):
        union(u1, u2)
    return pd.DataFrame(
        {"url": list(parent), "cluster_id": [find(u) for u in parent]}
    )


def pair_recall(found: pd.DataFrame, expected: pd.DataFrame) -> float:
    """Fraction of expected (url1,url2) pairs present in found (url-sorted)."""
    if len(expected) == 0:
        return 1.0
    exp = set(zip(expected.url1, expected.url2))
    got = set(zip(found.url1, found.url2))
    return len(exp & got) / len(exp)
