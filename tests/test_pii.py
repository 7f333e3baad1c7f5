"""PII redaction (emails / phones / IPv4)."""

from __future__ import annotations

from fuzzy_dedupe_pipeline_spark.pii import redact_pii


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r.doc_id: r for r in redact_pii(df).collect()}


def test_redacts_all_three_kinds(spark):
    out = _run(
        spark,
        [
            "mail a.b-c+d@sub.example.co.uk or x@y.io today",
            "call (555) 123-4567 or 555.123.4567",
            "host 10.0.0.1 and 192.168.255.254 up",
            "clean text with no pii at all",
        ],
    )
    assert out[0].text_redacted == "mail <EMAIL> or <EMAIL> today"
    assert (out[0].n_emails, out[0].n_phones, out[0].n_ips) == (2, 0, 0)
    assert out[1].text_redacted == "call <PHONE> or <PHONE>"
    assert out[1].n_phones == 2
    assert out[2].text_redacted == "host <IP> and <IP> up"
    assert out[2].n_ips == 2
    assert out[3].text_redacted == "clean text with no pii at all"
    assert (out[3].n_emails, out[3].n_phones, out[3].n_ips) == (0, 0, 0)


def test_email_digits_not_rematched_as_phone(spark):
    # replace order (email first) must keep a digit-heavy address from
    # leaving a phone-shaped remnant
    out = _run(spark, ["reach 5551234567@mail.example.com ok"])
    assert out[0].text_redacted == "reach <EMAIL> ok"
    assert out[0].n_phones == 0


def test_ipv4_not_eaten_by_phone(spark):
    # dotted quad replaced before the phone pass; phone pattern alone must
    # not match inside it
    out = _run(spark, ["ip 255.255.255.255 end"])
    assert out[0].text_redacted == "ip <IP> end"
    assert (out[0].n_ips, out[0].n_phones) == (1, 0)


def test_map_only_plan(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Exchange" not in plan
