"""PII redaction and benchmark-decontamination semantics (the oracle
rows pin cross-engine parity; these pin the intended behavior)."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_producers_spark.functions.dedup import contamination_scores
from parquet_producers_spark.functions.text import pii_counts, redact_pii


def test_redact_pii_scrubs_emails_then_ips(spark):
    df = spark.createDataFrame(
        [(1, "write to a.user+x@sub.example.org or ping 192.168.0.254 now"),
         (2, "no pii here, just 12345 and dots... end"),
         (3, "two mails a@b.co c@d.io and ip 10.0.0.1")],
        "id int, t string")
    n_emails, n_ips = pii_counts(F.col("t"))
    rows = {r["id"]: r for r in df.select(
        "id", redact_pii(F.col("t")).alias("red"),
        n_emails.alias("ne"), n_ips.alias("ni")).collect()}
    assert rows[1]["red"] == "write to <EMAIL> or ping <IP> now"
    assert (rows[1]["ne"], rows[1]["ni"]) == (1, 1)
    assert rows[2]["red"] == "no pii here, just 12345 and dots... end"
    assert (rows[2]["ne"], rows[2]["ni"]) == (0, 0)
    assert rows[3]["red"] == "two mails <EMAIL> <EMAIL> and ip <IP>"
    assert (rows[3]["ne"], rows[3]["ni"]) == (2, 1)


def test_contamination_scores_fraction_of_bench_shingles(spark):
    # bench doc = "a b c d"; candidate 10 shares shingle "a b c";
    # candidate 11 shares nothing
    bench = spark.createDataFrame([(1, "a b c d")], "doc_id int, text string")
    cand = spark.createDataFrame(
        [(10, "a b c x y"), (11, "p q r s t")], "doc_id int, text string")
    rows = {r["doc_id"]: r
            for r in contamination_scores(cand, bench).collect()}
    # cand 10 shingles: "a b c","b c x","c x y" → 1 of 3 in bench
    assert rows[10]["n_shingles"] == 3 and rows[10]["n_hit"] == 1
    assert abs(rows[10]["contamination"] - round(1 / 3, 4)) < 1e-9
    assert rows[11]["n_hit"] == 0 and rows[11]["contamination"] == 0.0
