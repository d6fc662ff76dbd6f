"""E2E port of the reference's TestCommand finance pipeline
(Parquet.Producers.TestCommand/Program.cs:27-67): stage 1 re-keys a
transactions file by unique_id; stage 2 projects to a composite
credit-matching key (supplier_ref, abs_amount, is_credit) — exercising
multi-column target keys, the Math.Abs projection idiom, and versioned
DAG state on disk."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from parquet_producers_spark.operators.produce import Stage
from parquet_producers_spark.plans.dag import Pipeline


def _by_unique_id(key, pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    out["txn_id"] = out["unique_id"]
    return out[["txn_id", "unique_id", "invoice_number", "supplier_ref",
                "invoice_amount", "entered_date"]]


def _credit_matching(key, pdf: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame({
        "supplier_ref_k": pdf["supplier_ref"],
        "abs_amount": pdf["invoice_amount"].abs(),
        "is_credit": pdf["invoice_amount"] < 0,
        "invoice_number_v": pdf["invoice_number"],
        "entered_date_v": pdf["entered_date"],
    })


TXN_DDL = ("type string, file string, unique_id string,"
           " invoice_number string, supplier_ref string,"
           " invoice_amount double, entered_date timestamp")


def _rows(batch, typ="Add"):
    d = dt.datetime(2026, 1, 1)
    return [
        (typ, "f1", uid, inv, sup, amt, d)
        for uid, inv, sup, amt in batch
    ]


def test_transactions_two_stage(spark, tmp_path):
    p = Pipeline(spark, str(tmp_path))
    p.add(Stage(
        "transactions", sk_cols=["file"], tk_cols=["txn_id"],
        value_cols=["unique_id", "invoice_number", "supplier_ref",
                    "invoice_amount", "entered_date"],
        produce=_by_unique_id,
        out_ddl=("txn_id string, unique_id string, invoice_number string,"
                 " supplier_ref string, invoice_amount double,"
                 " entered_date timestamp"),
    ))
    p.add(Stage(
        "credits_and_invoices", sk_cols=["txn_id"],
        tk_cols=["supplier_ref_k", "abs_amount", "is_credit"],
        value_cols=["invoice_number_v", "entered_date_v"],
        produce=_credit_matching,
        out_ddl=("supplier_ref_k string, abs_amount double,"
                 " is_credit boolean, invoice_number_v string,"
                 " entered_date_v timestamp"),
    ), sources=["transactions"])

    wave1 = spark.createDataFrame(_rows([
        ("t1", "INV-1", "ACME", 100.0),
        ("t2", "INV-2", "ACME", -100.0),   # credit matching INV-1
        ("t3", "INV-3", "GLOBEX", 250.0),
    ]), TXN_DDL)
    v1 = p.update({"transactions": wave1})
    cm = p.content("credits_and_invoices", v1)
    got = sorted(
        (r.supplier_ref_k, r.abs_amount, r.is_credit, r.invoice_number_v)
        for r in cm.collect()
    )
    assert got == [
        ("ACME", 100.0, False, "INV-1"),
        ("ACME", 100.0, True, "INV-2"),   # same composite key, credit leg
        ("GLOBEX", 250.0, False, "INV-3"),
    ]

    # incremental: the whole file is re-keyed (file is the root SK), so a
    # second wave for the same file replaces it — INV-3 voided, new INV-4
    wave2 = spark.createDataFrame(_rows([
        ("t1", "INV-1", "ACME", 100.0),
        ("t2", "INV-2", "ACME", -100.0),
        ("t4", "INV-4", "INITECH", 75.5),
    ], typ="Update"), TXN_DDL)
    v2 = p.update({"transactions": wave2})
    cm2 = sorted(
        (r.supplier_ref_k, r.abs_amount, r.is_credit, r.invoice_number_v)
        for r in p.content("credits_and_invoices", v2).collect()
    )
    assert cm2 == [
        ("ACME", 100.0, False, "INV-1"),
        ("ACME", 100.0, True, "INV-2"),
        ("INITECH", 75.5, False, "INV-4"),
    ]
    # GLOBEX target disappeared → one Delete in the CDC stream
    deletes = [
        (r.supplier_ref_k, r.abs_amount)
        for r in p.updates_out("credits_and_invoices", v2)
        .filter("type = 'Delete'").collect()
    ]
    assert deletes == [("GLOBEX", 250.0)]
    # credit-match query on the final content: credits paired to invoices
    pairs = (
        p.content("credits_and_invoices", v2)
        .groupBy("supplier_ref_k", "abs_amount")
        .count().filter("count >= 2")
        .collect()
    )
    assert [(r.supplier_ref_k, r.abs_amount) for r in pairs] == [("ACME", 100.0)]
