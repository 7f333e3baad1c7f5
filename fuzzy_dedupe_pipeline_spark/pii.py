"""PII redaction for webtext training data: emails, phone numbers, IPv4.

A crawl-to-training-set pipeline scrubs contact-like strings before anything
else sees the text. This is a map-only JVM pass (regexp_count +
regexp_replace inside whole-stage codegen — no shuffle, no Python): at
100 TB it costs one scan, and Catalyst fuses it into whatever projection
follows.

Pattern rules are deliberately RE2-compatible (no backreferences, no
lookarounds) so the DuckDB oracle in __spark_entry__ runs the *same* pattern
text — the parity check is then about engine replace/count semantics, not
about two hand-translated regex dialects. Counts are taken on the ORIGINAL
text per pattern independently; replacement is sequential (email -> ip ->
phone), so an email is never re-matched as a phone fragment.

The reference normalizes phone/email fields it already has as columns
(dedupe_logic/normalizer.py); here the PII is embedded in free text, which
is the crawl-side version of the same problem.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IP_TOKEN = "<IP>"


def redacted_text_col(c: Column) -> Column:
    """Sequential replace: email first (so its digits can't half-match the
    phone pattern), then IPv4 (before phone: dotted quads contain 3-digit
    runs), then phone."""
    out = F.regexp_replace(c, EMAIL_RE, EMAIL_TOKEN)
    out = F.regexp_replace(out, IPV4_RE, IP_TOKEN)
    return F.regexp_replace(out, PHONE_RE, PHONE_TOKEN)


def redact_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (id_col, text_redacted, n_emails, n_phones, n_ips)."""
    c = F.col(text_col)
    return docs.select(
        id_col,
        redacted_text_col(c).alias("text_redacted"),
        F.regexp_count(c, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(c, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_count(c, F.lit(IPV4_RE)).cast("long").alias("n_ips"),
    )
