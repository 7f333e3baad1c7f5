"""Deterministic synthetic `pages` corpus with planted duplicate families.

Shape is the north-rule input hint: pages(url, warc_ts, html, text, lang).
Families (FIXTURES.md F1):
  ~20% exact copies        (identical text, different url)
  ~20% near-dups           (token edits at rates straddling the Jaccard 0.8 line)
  ~10% substring dups      (>=60-token run of one doc embedded verbatim in another)
  ~5%  boilerplate overlap (shared nav/footer tokens, distinct bodies — must NOT merge)
  rest unique

All randomness flows from one numpy Generator seeded by `seed` — same seed,
same corpus, byte for byte. Ground truth is returned alongside the corpus so
tests can compute dup-pair recall without re-deriving family membership.
"""

from __future__ import annotations

import html as _html
from dataclasses import dataclass

import numpy as np
import pandas as pd

_LANGS = np.array(["en", "es", "de", "fr", "zh"])
_PUNCT = np.array(["", "", "", "", ",", ".", "!", ";", ":", "?"])

HTML_PREFIX = (
    "<html><head><title>synthetic page</title></head><body>"
    "<header><nav>Home Products About Contact Careers Blog</nav></header><main>"
)
HTML_SUFFIX = (
    "</main><footer>Copyright 2026 Example Corp - Privacy - Terms - Sitemap"
    "</footer></body></html>"
)

# tokens that appear inside `text` for the boilerplate-overlap family only
_BOILER_TOKENS = (
    "home products about contact careers blog subscribe newsletter "
    "privacy terms sitemap copyright example corp all rights reserved"
).split()


@dataclass
class SynthCorpus:
    pages: pd.DataFrame      # url, warc_ts, html(bytes), text, lang
    truth: pd.DataFrame      # url, family_id (int, -1 = unique), kind


def _zipf_vocab_draw(rng: np.random.Generator, n: int, vocab: int = 30000) -> np.ndarray:
    """Zipf-ish token index draw (heavy head like real web text)."""
    # inverse-CDF of a power law, clipped to vocab
    u = rng.random(n)
    idx = np.floor((vocab**0.7 * u + 1) ** (1 / 0.7)).astype(np.int64)
    return np.clip(idx, 0, vocab - 1)


def _make_text(rng: np.random.Generator, n_tokens: int) -> list[str]:
    idx = _zipf_vocab_draw(rng, n_tokens)
    words = [f"w{i}" for i in idx]
    # sprinkle punctuation + casing noise so normalize_text has work to do
    punct = rng.choice(_PUNCT, size=n_tokens)
    caps = rng.random(n_tokens) < 0.08
    return [
        (w.capitalize() if c else w) + p
        for w, p, c in zip(words, punct, caps)
    ]


def _edit_tokens(rng: np.random.Generator, tokens: list[str], rate: float) -> list[str]:
    """Token-level replace/insert/delete at roughly `rate`."""
    out: list[str] = []
    for t in tokens:
        r = rng.random()
        if r < rate / 3:
            continue  # delete
        if r < 2 * rate / 3:
            out.append(f"w{rng.integers(0, 30000)}")  # replace
            continue
        out.append(t)
        if r < rate:
            out.append(f"w{rng.integers(0, 30000)}")  # insert
    return out


def generate_pages(n_docs: int = 500, seed: int = 42) -> SynthCorpus:
    rng = np.random.default_rng(seed)

    n_exact = int(n_docs * 0.20)
    n_near = int(n_docs * 0.20)
    n_sub = int(n_docs * 0.10)
    n_boiler = int(n_docs * 0.05)
    n_unique = n_docs - n_exact - n_near - n_sub - n_boiler

    texts: list[str] = []
    kinds: list[str] = []
    families: list[int] = []
    fam = 0

    # unique base docs (also serve as sources for dup families)
    base_texts: list[list[str]] = []
    for _ in range(n_unique):
        toks = _make_text(rng, int(rng.integers(120, 600)))
        base_texts.append(toks)
        texts.append(" ".join(toks))
        kinds.append("unique")
        families.append(-1)

    def _base(min_len: int = 0) -> tuple[int, list[str]]:
        while True:
            i = int(rng.integers(0, len(base_texts)))
            if len(base_texts[i]) >= min_len:
                return i, base_texts[i]

    # exact copies: pick a base doc, reuse its text verbatim
    i = 0
    while i < n_exact:
        src_i, src = _base()
        members = min(int(rng.integers(1, 4)), n_exact - i)
        if families[src_i] == -1:
            families[src_i] = fam
            kinds[src_i] = "exact_src"
        for _ in range(members):
            texts.append(" ".join(src))
            kinds.append("exact")
            families.append(families[src_i])
        i += members
        fam += 1

    # near dups: edit rates log-uniform 0.1%..8% -> true Jaccard straddles 0.8
    for _ in range(n_near):
        src_i, src = _base(min_len=150)
        rate = float(10 ** rng.uniform(-3, np.log10(0.08)))
        toks = _edit_tokens(rng, src, rate)
        if families[src_i] == -1:
            families[src_i] = fam
            fam += 1
        texts.append(" ".join(toks))
        kinds.append("near")
        families.append(families[src_i])

    # substring dups: embed a >=60-token verbatim run of a base doc in new noise
    for _ in range(n_sub):
        src_i, src = _base(min_len=200)
        run_len = int(rng.integers(60, min(160, len(src))))
        start = int(rng.integers(0, len(src) - run_len + 1))
        run = src[start : start + run_len]
        pre = _make_text(rng, int(rng.integers(20, 80)))
        post = _make_text(rng, int(rng.integers(20, 80)))
        if families[src_i] == -1:
            families[src_i] = fam
            fam += 1
        texts.append(" ".join(pre + run + post))
        kinds.append("substring")
        families.append(families[src_i])

    # boilerplate-only overlap: shared nav tokens + distinct bodies (no family)
    for _ in range(n_boiler):
        body = _make_text(rng, int(rng.integers(100, 300)))
        texts.append(" ".join(_BOILER_TOKENS + body + _BOILER_TOKENS))
        kinds.append("boiler")
        families.append(-1)

    n = len(texts)
    order = rng.permutation(n)
    texts = [texts[i] for i in order]
    kinds = [kinds[i] for i in order]
    families = [families[i] for i in order]

    hosts = rng.integers(0, max(4, n // 50), size=n)
    urls = [f"https://site{h}.example/p/{i}" for i, h in enumerate(hosts)]
    # microsecond unit: Spark's parquet reader rejects TIMESTAMP(NANOS)
    warc_ts = pd.to_datetime(1_700_000_000 + np.arange(n) * 37, unit="s").astype(
        "datetime64[us]"
    )
    langs = _LANGS[rng.integers(0, len(_LANGS), size=n)]
    htmls = [
        (HTML_PREFIX + _html.escape(t) + HTML_SUFFIX).encode("utf-8") for t in texts
    ]

    pages = pd.DataFrame(
        {
            "url": urls,
            "warc_ts": warc_ts,
            "html": htmls,
            "text": texts,
            "lang": langs,
        }
    )
    truth = pd.DataFrame({"url": urls, "family_id": families, "kind": kinds})
    return SynthCorpus(pages=pages, truth=truth)


def pages_spark_df(spark, n_docs: int = 500, seed: int = 42):
    """Synthesize and hand to Spark with the input-hint schema."""
    from pyspark.sql import types as T

    corpus = generate_pages(n_docs=n_docs, seed=seed)
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("html", T.BinaryType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )
    return spark.createDataFrame(corpus.pages, schema=schema), corpus.truth
