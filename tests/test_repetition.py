"""Gopher repetition-signal tests: value parity vs an independent
collections.Counter reference (including whitespace-adjacent newlines, which
pin the space-trim semantics), edge cases, and the map-only plan guarantee."""

from __future__ import annotations

import random
import re
from collections import Counter

import pytest


def _ref_signals(text: str) -> dict[str, float]:
    """Independent per-doc reference: Counter over units, Gopher char
    conventions as documented in repetition.py (space-trim like the engine)."""

    def units(sep: str) -> list[str]:
        return [u.strip(" ") for u in text.split(sep) if u.strip(" ") != ""]

    def stats(us: list[str]):
        c = Counter(us)
        n, u = len(us), len(c)
        tot = sum(len(x) for x in us)
        dupb = sum((k - 1) * len(v) for v, k in c.items() if k > 1)
        dupa = sum(k * len(v) for v, k in c.items() if k > 1)
        top = max(
            ((k, k * len(v)) for v, k in c.items()),
            key=lambda t: (t[0], t[1]),
            default=(0, 0),
        )
        return n, u, tot, dupb, dupa, top

    toks = [t for t in re.split(r"\s+", text) if t]

    def grams(n: int) -> list[str]:
        if len(toks) < n:
            return []
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    out: dict[str, float] = {}
    for nm, us in (("line", units("\n")), ("para", units("\n\n"))):
        n, u, tot, dupb, _, _ = stats(us)
        out[f"n_{nm}s"] = n
        out[f"dup_{nm}_frac"] = round((n - u) / n, 6) if n else 0.0
        out[f"dup_{nm}_char_frac"] = round(dupb / tot, 6) if tot else 0.0
    L = len(text)
    for n in (2, 3, 4):
        _, _, _, _, _, top = stats(grams(n))
        out[f"top_{n}gram_char_frac"] = round(top[1] / L, 6) if L else 0.0
    for n in (5, 6, 7, 8, 9, 10):
        _, _, _, _, dupa, _ = stats(grams(n))
        out[f"dup_{n}gram_char_frac"] = round(dupa / L, 6) if L else 0.0
    # reference renames: n_lines/n_paras already match engine columns
    out["n_lines"] = out.pop("n_lines")
    out["n_paras"] = out.pop("n_paras")
    return out


def _handcrafted() -> list[tuple[int, str]]:
    return [
        (0, "nav bar\nalpha beta gamma\n\nnav bar\ndelta"),
        (1, "p one\n\np one\n\np two"),
        (2, "a b a b a b c d e f g h i j"),
        (3, ""),
        (4, "single"),
        (5, "x y z w v u x y z w v u t s r"),  # heavy 5/6-gram repetition
        (6, "  spaced \n line \n\n  spaced \n other  "),  # trim semantics
        (7, "tok " * 9),  # 9 identical tokens: every gram family duplicated
    ]


def _random_docs(n: int, seed: int) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    words = ["aa", "bb", "cc", "dd", "ee"]
    docs = []
    for i in range(n):
        lines = []
        for _ in range(rng.randint(1, 6)):
            lines.append(
                " ".join(rng.choice(words) for _ in range(rng.randint(0, 8)))
            )
        sep_choices = ["\n", "\n\n"]
        text = ""
        for j, ln in enumerate(lines):
            if j:
                text += rng.choice(sep_choices)
            text += ln
        docs.append((100 + i, text))
    return docs


@pytest.fixture(scope="module")
def signal_rows(spark):
    from fuzzy_dedupe_pipeline_spark.repetition import gopher_repetition

    docs = _handcrafted() + _random_docs(40, seed=7)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["doc_id"]: r.asDict() for r in gopher_repetition(df).collect()}
    return docs, rows


def test_parity_vs_counter_reference(signal_rows):
    docs, rows = signal_rows
    assert len(rows) == len(docs)
    for doc_id, text in docs:
        want = _ref_signals(text)
        got = rows[doc_id]
        for k, v in want.items():
            assert got[k] == pytest.approx(v, abs=1e-9), (doc_id, k, text)


def test_empty_doc_all_zero(signal_rows):
    _, rows = signal_rows
    r = rows[3]
    assert r["n_lines"] == 0 and r["n_paras"] == 0
    assert all(
        v == 0.0 for k, v in r.items() if k.endswith("_frac")
    ), r


def test_gram_overlap_convention(signal_rows):
    # 'tok' x 9: every 5-gram is the same gram repeated 5 times; with the
    # documented count x len convention the char fraction exceeds 1 — the
    # signal is monotone in repetition, not a probability.
    _, rows = signal_rows
    assert rows[7]["dup_5gram_char_frac"] > 1.0
    assert rows[7]["dup_line_frac"] == 0.0  # one line only


def test_map_only_plan(spark):
    from fuzzy_dedupe_pipeline_spark.repetition import gopher_repetition

    df = spark.createDataFrame(
        [(1, "a b\nc d")], "doc_id long, text string"
    )
    plan = (
        gopher_repetition(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan  # zero-shuffle: per-row fold only


def test_arrow_matches_sql_hof(spark):
    """r6 focused test: the Arrow fast path (default) and the pure-JVM
    SQL-HOF path must produce identical rows — including NULL text (NULL
    struct semantics), exotic whitespace (Java \\s class vs str.strip), and
    tie-broken top grams."""
    from fuzzy_dedupe_pipeline_spark.repetition import gopher_repetition

    docs = (
        _handcrafted()
        + _random_docs(30, seed=13)
        + [
            (900, None),
            (901, "\ta b\tc\n \x0b x \r\f y"),  # Java \s chars + trim edges
            (902, " lead \n\n\n trail \n"),     # \n\n\n -> ragged para split
            (903, "aa bb aa bb cc " * 3),
        ]
    )
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = {r["doc_id"]: r.asDict() for r in gopher_repetition(df, impl="arrow").collect()}
    s = {r["doc_id"]: r.asDict() for r in gopher_repetition(df, impl="sql").collect()}
    assert a.keys() == s.keys()
    for k in a:
        assert a[k] == s[k], (k, a[k], s[k])
