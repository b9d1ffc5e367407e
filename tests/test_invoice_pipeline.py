"""End-to-end unpaid-invoice slice (SURVEY §7 step 2) — the most novel
operator chain in the reference:

binaryFile scan (S4) -> Arrow-batched PDF->text UDF (U1/R13) ->
SPLIT_PART parse cascade (F1-F5) -> standardized customer join (J3) ->
Overdue filter + sort (P5/O1) == ``2_unpaid_invoice_analysis.py:11-15``.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from summit_23_snowpark_data_lake_workloads_spark.operators.unstructured import (
    extract_pdf_text,
)
from summit_23_snowpark_data_lake_workloads_spark.plans.curate import (
    parse_invoice_text,
    standardize_customer,
)
from summit_23_snowpark_data_lake_workloads_spark.sources.batch import read_binary_dir

from . import fixtures as FX


@pytest.fixture(scope="module")
def pdf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("invoices")
    customers = FX.gen_customers(50)
    texts = FX.gen_invoice_texts(customers, n=40)
    for i, t in enumerate(texts):
        # mix compressed and uncompressed content streams
        (d / t["RELATIVE_PATH"]).write_bytes(
            FX.make_pdf(t["PDF_TEXT"], compress=i % 2 == 0)
        )
    return d, customers, texts


def test_pdf_binary_scan_and_extract(spark, pdf_dir):
    d, _, texts = pdf_dir
    binary = read_binary_dir(spark, str(d), glob="*.pdf")
    assert set(binary.columns) >= {"path", "content", "length"}
    out = {r.RELATIVE_PATH: r.PDF_TEXT for r in extract_pdf_text(binary).collect()}
    want = {t["RELATIVE_PATH"]: t["PDF_TEXT"] for t in texts}
    assert out == want, "extracted text must round-trip exactly"


def test_extract_flags_unsupported_encoding(spark, tmp_path):
    """A PDF whose content stream uses a filter the extractor doesn't
    speak (here: LZWDecode, random bytes) must come back with
    EXTRACT_OK=false — countable, never a silent empty string."""
    good = FX.make_pdf("INVOICE NO 1 OK", compress=True)
    bad = (
        b"%PDF-1.4\n1 0 obj\n<< /Filter /LZWDecode /Length 16 >>\n"
        b"stream\n\x80\x0b\x60\x50\x22\x0c\x0c\x85\x01\xff\xee\x12\x34\x56\x78\x9a\nendstream\n"
        b"endobj\ntrailer\n%%EOF\n"
    )
    (tmp_path / "good.pdf").write_bytes(good)
    (tmp_path / "bad.pdf").write_bytes(bad)
    out = {
        r.RELATIVE_PATH: r
        for r in extract_pdf_text(
            read_binary_dir(spark, str(tmp_path), glob="*.pdf")
        ).collect()
    }
    assert out["good.pdf"].EXTRACT_OK
    assert out["good.pdf"].PDF_TEXT == "INVOICE NO 1 OK"
    assert not out["bad.pdf"].EXTRACT_OK
    assert out["bad.pdf"].PDF_TEXT == ""


def test_unpaid_invoice_report_end_to_end(spark, pdf_dir):
    d, customers, texts = pdf_dir
    pdf_text = extract_pdf_text(read_binary_dir(spark, str(d), glob="*.pdf"))
    details = parse_invoice_text(pdf_text)
    cust = standardize_customer(spark.createDataFrame(customers))
    # pad customer ids the way the invoice parser does (LPAD 10 '0')
    cust = cust.withColumn("CUSTOMER_ID", F.lpad("CUSTOMER_ID", 10, "0"))
    report = (
        details.join(cust, "CUSTOMER_ID")
        .filter(F.col("INV_STATUS") == "Overdue")
        .orderBy(F.desc("TOTAL"))
        .select("CUSTOMER_ID", "FIRST_NAME", "LAST_NAME", "STATE", "TOTAL", "INVOICE_NUM")
    )
    rows = report.collect()
    # oracle: compute the same from the fixture dicts
    want_overdue = {
        FX.oracle_parse_invoice(t)["INVOICE_NUM"]
        for t in texts
        if FX.oracle_parse_invoice(t)["INV_STATUS"] == "Overdue"
    }
    assert {r.INVOICE_NUM for r in rows} == want_overdue
    totals = [float(r.TOTAL) for r in rows]
    assert totals == sorted(totals, reverse=True), "ORDER BY TOTAL DESC"


# ---------------------------------------------------------------------------
# Real-corpus fidelity (VERDICT r2 "What's missing #2"): run the actual
# reference invoice PDFs (``data/invoice/*.pdf``, the corpus the reference's
# ``3B1_pdf_to_text_udf.sql:14`` UDF parses) through the same chain. These
# PDFs use subset TrueType fonts with non-identity encodings, so they
# exercise the CMap tier of the stdlib extractor — not the raw tier the
# synthetic fixtures hit. Skips when the reference checkout is absent.
# ---------------------------------------------------------------------------

_REF_INVOICES = "/root/reference/data/invoice"


@pytest.mark.skipif(
    not __import__("os").path.isdir(_REF_INVOICES),
    reason="reference invoice corpus not present",
)
def test_real_reference_pdfs_extract_and_parse(spark, tmp_path):
    import os
    import random
    import re

    files = sorted(os.listdir(_REF_INVOICES))
    rng = random.Random(2023)
    sample = rng.sample(files, 120)
    d = tmp_path / "real_invoices"
    d.mkdir()
    for name in sample:
        os.symlink(os.path.join(_REF_INVOICES, name), d / name)

    txt = extract_pdf_text(read_binary_dir(spark, str(d), glob="*.pdf")).cache()
    n = txt.count()
    assert n == len(sample)
    assert txt.filter("EXTRACT_OK").count() == n, "every real PDF must extract"

    parsed = parse_invoice_text(
        txt.selectExpr("RELATIVE_PATH", "PDF_TEXT"), strict=True
    ).toPandas()
    # field shapes per the 3BC_create_raw_pdf_text_view.sql:3-11 layout
    assert parsed["INVOICE_NUM"].str.match(r"INV-[A-Z0-9]{5}-\d+$").all()
    assert parsed["CUSTOMER_ID"].str.match(r"\d{10}$").all()
    assert parsed["INV_GEN_DT"].str.match(r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z$").all()
    assert parsed["TOTAL"].notna().all(), "strict TOTAL cast must succeed on every doc"
    # the corpus encodes the invoice number in the filename — cross-check
    fname_inv = parsed["RELATIVE_PATH"].str.extract(r"INVOICE_NO_(INV-[A-Z0-9]+-\d+)_")[0]
    assert (fname_inv == parsed["INVOICE_NUM"]).all()
    # status is either a known value or genuinely blank in the source PDF
    assert parsed["INV_STATUS"].isin(["Paid", "Unpaid", "Pending", "Overdue", ""]).all()
    txt.unpersist()


@pytest.mark.skipif(
    not __import__("os").environ.get("SPARK_GRAFT_FULL_CORPUS"),
    reason="full 24,999-PDF corpus run: set SPARK_GRAFT_FULL_CORPUS=1 "
    "(~minutes; the reference's actual 1 GB workload)",
)
@pytest.mark.skipif(
    not __import__("os").path.isdir(_REF_INVOICES),
    reason="reference invoice corpus not present",
)
def test_full_reference_corpus_to_invoice_details(spark):
    """VERDICT r12 #4: the ENTIRE reference corpus (24,999 real PDFs —
    the workload ``3B1_pdf_to_text_udf.sql:14`` + ``3BC`` actually
    runs) through binaryFile scan -> Arrow PDF->text UDF -> the
    INVOICE_DETAILS parse cascade, asserting extraction fidelity and
    per-field null/blank rates instead of sampling 120. Prints one
    RATES line for the round record."""
    import os

    from summit_23_snowpark_data_lake_workloads_spark.plans.curate import (
        parse_invoice_text as _parse,
    )

    n_files = len(
        [f for f in os.listdir(_REF_INVOICES) if f.endswith(".pdf")]
    )
    txt = extract_pdf_text(
        read_binary_dir(spark, _REF_INVOICES, glob="*.pdf")
    ).cache()
    n = txt.count()
    assert n == n_files
    n_ok = txt.filter("EXTRACT_OK").count()

    parsed = _parse(
        txt.selectExpr("RELATIVE_PATH", "PDF_TEXT"), strict=False
    ).cache()
    agg = parsed.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((~F.col("CUSTOMER_ID").rlike(r"^\d{10}$")).cast("long")).alias(
            "bad_cust"
        ),
        F.sum(
            (~F.col("INVOICE_NUM").rlike(r"^INV-[A-Z0-9]{5}-\d+$")).cast(
                "long"
            )
        ).alias("bad_inv"),
        F.sum(
            (
                ~F.col("INV_GEN_DT").rlike(
                    r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z$"
                )
            ).cast("long")
        ).alias("bad_gen_dt"),
        F.sum(
            (~F.col("INV_STATUS").isin("Paid", "Unpaid", "Pending",
                                       "Overdue", "")).cast("long")
        ).alias("bad_status"),
        F.sum(F.col("ITEM_1").isNull().cast("long")).alias("null_item1"),
        F.sum(F.col("ITEM_2").isNull().cast("long")).alias("null_item2"),
        F.sum(F.col("ITEM_3").isNull().cast("long")).alias("null_item3"),
        F.sum(F.col("TOTAL").isNull().cast("long")).alias("null_total"),
        F.sum((F.col("INV_STATUS") == "").cast("long")).alias(
            "blank_status"
        ),
        # filename carries the invoice number: the end-to-end
        # extraction+parse cross-check, corpus-wide
        F.sum(
            (
                F.regexp_extract(
                    "RELATIVE_PATH", r"INVOICE_NO_(INV-[A-Z0-9]+-\d+)_", 1
                )
                != F.col("INVOICE_NUM")
            ).cast("long")
        ).alias("fname_mismatch"),
    ).collect()[0]
    txt.unpersist()
    parsed.unpersist()

    print(
        "FULL_CORPUS_RATES "
        f"n={n} extract_ok={n_ok} "
        f"bad_cust={agg.bad_cust} bad_inv={agg.bad_inv} "
        f"bad_gen_dt={agg.bad_gen_dt} bad_status={agg.bad_status} "
        f"null_items={agg.null_item1}/{agg.null_item2}/{agg.null_item3} "
        f"null_total={agg.null_total} blank_status={agg.blank_status} "
        f"fname_mismatch={agg.fname_mismatch}"
    )
    assert n_ok == n, "every real PDF must extract"
    assert agg.n == n
    assert agg.fname_mismatch == 0
    assert agg.bad_cust == 0 and agg.bad_inv == 0 and agg.bad_gen_dt == 0
    # exactly 2 source PDFs carry a truncated status IN THEIR BYTES
    # ("Invoice Status: e" in INVOICE_NO_INV-8K6OQ-15_4731.pdf,
    # "Invoice Status: ue" in INVOICE_NO_INV-9B4SA-40_12869.pdf) — the
    # reference's 3BC split_part view yields the same strings, so the
    # faithful number here is 2, not 0
    assert agg.bad_status == 2
    assert (
        agg.null_item1 == 0
        and agg.null_item2 == 0
        and agg.null_item3 == 0
        and agg.null_total == 0
    )


def test_stream_pdf_ingest_availablenow(spark, tmp_path):
    """Streaming twin of the directory-stage auto-refresh (reference
    ``1_env_setup.sql:25-27``): PDFs land in a directory, each
    availableNow drain ingests exactly the new files through the
    extract->parse chain into a lakehouse table with exactly-once
    commits (file-source checkpoint = the refresh ledger; txn stamps
    = replay armor)."""
    from summit_23_snowpark_data_lake_workloads_spark.sources.lakehouse import (
        SnapshotTable,
    )
    from summit_23_snowpark_data_lake_workloads_spark.streaming.ingest import (
        stream_pdf_ingest,
    )

    land = tmp_path / "landing"
    land.mkdir()
    customers = FX.gen_customers(20)
    texts = FX.gen_invoice_texts(customers, n=6)
    for i, t in enumerate(texts[:4]):
        (land / t["RELATIVE_PATH"]).write_bytes(
            FX.make_pdf(t["PDF_TEXT"], compress=i % 2 == 0)
        )
    table = SnapshotTable(spark, str(tmp_path / "invoice_details"))
    ckpt = str(tmp_path / "ckpt")

    stream_pdf_ingest(
        spark, str(land), table, ckpt, max_files_per_trigger=2
    ).awaitTermination(180)
    assert {r.RELATIVE_PATH for r in table.read().collect()} == {
        t["RELATIVE_PATH"] for t in texts[:4]
    }
    v1 = table.snapshot().version
    # maxFilesPerTrigger=2 over 4 files: >1 micro-batch, one commit each
    assert v1 >= 2

    # parsed fields match the pure-Python 3BC oracle; EXTRACT_OK rides
    want = FX.oracle_parse_invoice(texts[0])
    row = (
        table.read()
        .filter(F.col("RELATIVE_PATH") == texts[0]["RELATIVE_PATH"])
        .collect()[0]
    )
    assert row.INVOICE_NUM == want["INVOICE_NUM"]
    assert row.CUSTOMER_ID == want["CUSTOMER_ID"]
    assert float(row.TOTAL) == float(want["TOTAL"])
    assert row.EXTRACT_OK

    # drain with nothing pending: no table version spent
    stream_pdf_ingest(spark, str(land), table, ckpt).awaitTermination(180)
    assert table.snapshot().version == v1

    # late-arriving PDFs: only the delta ingests
    for t in texts[4:]:
        (land / t["RELATIVE_PATH"]).write_bytes(FX.make_pdf(t["PDF_TEXT"]))
    stream_pdf_ingest(spark, str(land), table, ckpt).awaitTermination(180)
    assert {r.RELATIVE_PATH for r in table.read().collect()} == {
        t["RELATIVE_PATH"] for t in texts
    }
    assert table.read().count() == 6


def test_stream_pdf_ingest_checkpoint_loss_contract(spark, tmp_path):
    """Checkpoint LOSS (not restart) under the SAME app_id silently
    drops re-delivered batches — ids restart at 0 and the txn stamp
    treats them all as replays, including batches carrying genuinely
    new files. Pinned here as the documented contract (Delta's
    txnAppId behaves identically), together with the remedy: a fresh
    app_id re-delivers everything and a path-keyed dedupe recovers
    the logical table."""
    from summit_23_snowpark_data_lake_workloads_spark.sources.lakehouse import (
        SnapshotTable,
    )
    from summit_23_snowpark_data_lake_workloads_spark.streaming.ingest import (
        stream_pdf_ingest,
    )

    land = tmp_path / "landing"
    land.mkdir()
    customers = FX.gen_customers(10)
    texts = FX.gen_invoice_texts(customers, n=5)
    for t in texts[:3]:
        (land / t["RELATIVE_PATH"]).write_bytes(FX.make_pdf(t["PDF_TEXT"]))
    table = SnapshotTable(spark, str(tmp_path / "details"))
    ckpt = str(tmp_path / "ckpt")
    stream_pdf_ingest(spark, str(land), table, ckpt).awaitTermination(180)
    assert table.read().count() == 3

    # new files arrive AND the checkpoint is lost
    for t in texts[3:]:
        (land / t["RELATIVE_PATH"]).write_bytes(FX.make_pdf(t["PDF_TEXT"]))
    import shutil as _sh

    _sh.rmtree(ckpt)
    stream_pdf_ingest(spark, str(land), table, ckpt).awaitTermination(180)
    # the hazard, pinned: same app_id -> batch ids restarted at 0,
    # every batch looked like a replay, the NEW files were dropped
    assert table.read().count() == 3

    # the remedy: fresh app_id re-delivers all 5; path-keyed dedupe
    # recovers the logical table
    stream_pdf_ingest(
        spark, str(land), table, str(tmp_path / "ckpt2"), app_id="pdf_v2"
    ).awaitTermination(180)
    assert table.read().count() == 8  # 3 + all 5 re-delivered
    logical = table.read().dropDuplicates(["RELATIVE_PATH"])
    assert logical.count() == 5
    assert {r.RELATIVE_PATH for r in logical.collect()} == {
        t["RELATIVE_PATH"] for t in texts
    }


@pytest.mark.skipif(
    not __import__("os").environ.get("SPARK_GRAFT_FULL_CORPUS"),
    reason="full-corpus streaming ingest: set SPARK_GRAFT_FULL_CORPUS=1",
)
@pytest.mark.skipif(
    not __import__("os").path.isdir(_REF_INVOICES),
    reason="reference invoice corpus not present",
)
def test_full_corpus_stream_ingest(spark, tmp_path):
    """The landing-directory streaming path at REAL corpus scale: all
    24,999 reference PDFs drain through bounded availableNow
    micro-batches (maxFilesPerTrigger caps per-batch memory for the
    extract UDF) into a lakehouse table — one txn-stamped commit per
    micro-batch, rows identical to the batch pipeline's."""
    import os

    from summit_23_snowpark_data_lake_workloads_spark.sources.lakehouse import (
        SnapshotTable,
    )
    from summit_23_snowpark_data_lake_workloads_spark.streaming.ingest import (
        stream_pdf_ingest,
    )

    n_files = len(
        [f for f in os.listdir(_REF_INVOICES) if f.endswith(".pdf")]
    )
    table = SnapshotTable(spark, str(tmp_path / "details"))
    stream_pdf_ingest(
        spark,
        _REF_INVOICES,
        table,
        str(tmp_path / "ckpt"),
        app_id="full_corpus",
        max_files_per_trigger=2048,
    ).awaitTermination(1200)
    got = table.read()
    assert got.count() == n_files
    assert got.filter("EXTRACT_OK").count() == n_files
    assert got.filter(F.col("TOTAL").isNull()).count() == 0
    # bounded batches -> multiple commits, each txn-stamped
    n_versions = len(table._versions())
    assert n_versions >= n_files // 2048
    assert table.last_committed_batch("full_corpus") == n_versions - 1
    # a re-drain with the intact checkpoint spends nothing
    stream_pdf_ingest(
        spark,
        _REF_INVOICES,
        table,
        str(tmp_path / "ckpt"),
        app_id="full_corpus",
    ).awaitTermination(300)
    assert len(table._versions()) == n_versions
