"""Unigram cross-entropy quality scoring — the CCNet-style perplexity proxy.

Web pipelines (CCNet, RefinedWeb, Gopher/MassiveText) rank pages by language-
model perplexity and keep the low-perplexity head; the model they use is
small precisely because the score must run over the whole corpus. This module
implements the corpus-self-fit unigram variant: fit a add-one-smoothed
unigram model on the corpus token stream, then score every document by its
per-token cross-entropy under that model,

    H(d) = -(1/|d|) * sum_{t in d} ln p(t),   p(t) = (n_t + 1) / (N + V)

Low H = the page is made of corpus-typical tokens (prose); high H = rare-token
soup (gibberish, base64 blobs, navigation fragments) — the score web curation
thresholds on. The reference is a single-process contact-dedupe script with no
quality model (reference/main.py); this operator exists for the north-rule
webtext payload.

Dataflow (designed for 10^12 docs):
  1. fit: explode tokens -> groupBy(tok).count — ONE shuffle whose map-side
     partial aggregation collapses the Zipf head before the exchange; the
     reduced side is the vocabulary, which grows ~sqrt(corpus) (Heaps' law),
     not linearly.
  2. totals (N token instances, V vocab size): one 1-row aggregate,
     broadcast-crossJoined back onto the vocab — never a driver collect.
  3. score: per-doc term counts (explode -> groupBy(doc, tok)) equi-joined to
     the vocab logp table on tok, then groupBy(doc). The vocab is the small
     side; AQE converts the join to broadcast when it fits (it does at any
     sandbox SF) and falls back to a hash join keyed on tok — never a
     cartesian — when a web-scale vocabulary outgrows the broadcast limit.
     Fit + score are two corpus scans by necessity (the model must see every
     token before the first document can be scored).

Float discipline (drives the DuckDB oracle row `lm_cross_entropy`):
  * logp is rounded to 6dp at the vocab level,
  * each doc x term contribution c*logp is rounded to 6dp and summed as
    DECIMAL(38,6) so the unordered shuffle-sum cannot reassociate bits,
  * the final score divides as double and rounds to 6dp.
Zero-token documents carry no tokens into the model and are absent from the
output (the oracle's unnest drops them identically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_simple


def unigram_logprobs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Add-one-smoothed unigram log-probabilities fitted on the corpus.

    Returns (tok, logp) with logp = round(ln((n_t + 1) / (N + V)), 6).
    """
    # explode_outer + null filter: avoids the inferred size(tokens)>0
    # pushdown that re-runs the tokenize below the spread exchange on the
    # single-partition scan (see textstats.ngram_jaccard_pairs, r6)
    toks = docs.select(
        F.explode_outer(tokens_simple(F.col(text_col))).alias("tok")
    ).filter(F.col("tok").isNotNull())
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    tot = cnt.agg(
        F.sum("n_tok").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("n_vocab"),
    )
    return cnt.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.round(
            F.log(
                (F.col("n_tok") + 1).cast("double")
                / (F.col("n_total") + F.col("n_vocab")).cast("double")
            ),
            6,
        ).alias("logp"),
    )


def cross_entropy_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document unigram cross-entropy under the corpus-fitted model.

    Returns (id_col, n_tokens, cross_entropy) for every document with at
    least one token; lower = more corpus-typical. The filtering decision a
    pipeline makes on this column (keep the head, drop the tail) is a plain
    range predicate downstream.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode_outer(tokens_simple(F.col(text_col))).alias("tok"),
    ).filter(F.col("tok").isNotNull())
    doc_tok = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("c"))
    logp = unigram_logprobs(docs, text_col)
    per_doc = (
        doc_tok.join(logp, "tok")
        .groupBy(id_col)
        .agg(
            F.sum(
                F.round(F.col("c") * F.col("logp"), 6).cast("decimal(38,6)")
            ).alias("s"),
            F.sum("c").cast("long").alias("n_tokens"),
        )
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        F.round(
            (-F.col("s").cast("double")) / F.col("n_tokens"), 6
        ).alias("cross_entropy"),
    )
