"""PII redaction operator: detection counts, masking, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_tlc_analytics_pipeline_spark.operators import redact


def _scrub_one(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return redact.scrub_documents(df, "text", keep_original=True).head().asDict()


def test_email_redacted(spark):
    r = _scrub_one(spark, "mail me at a.user+tag@corp.example.org today")
    assert r["n_email"] == 1 and r["has_pii"] is True
    assert "@" not in r["text"] and "[PII:email]" in r["text"]
    assert "@" in r["text_raw"]  # original preserved on request


def test_phone_and_card_and_ip(spark):
    r = _scrub_one(spark, "call (212) 555-0123, card 4111-1111-1111-4321, ip 10.0.0.1")
    assert r["n_phone"] >= 1 and r["n_card"] == 1 and r["n_ipv4"] == 1
    for k in ("email", "card", "phone", "ipv4"):
        assert f"4111" not in r["text"]
    assert "[PII:card]" in r["text"] and "[PII:ipv4]" in r["text"]


def test_clean_text_untouched(spark):
    txt = "perfectly ordinary sentence with numbers 12 34 and words"
    r = _scrub_one(spark, txt)
    assert r["has_pii"] is False and r["text"] == txt
    assert r["n_email"] == r["n_card"] == r["n_phone"] == r["n_ipv4"] == 0


def test_scrub_is_map_only(spark):
    """The scrub must fuse into the scan: no shuffle exchanges at all."""
    df = spark.createDataFrame(
        [(i, f"doc {i} text") for i in range(100)], "doc_id long, text string"
    )
    plan = (
        redact.scrub_documents(df, "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_counts_independent_of_redaction_order(spark):
    # counts are computed on the ORIGINAL text: a card run that the phone
    # pattern might also nibble still counts once as a card
    r = _scrub_one(spark, "4111 1111 1111 0042")
    assert r["n_card"] == 1
