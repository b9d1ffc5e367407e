"""Source-loader tests: JSON sampled inference (S3), by-name parquet
projection (S2), call_function/call_udf parity (F14/F15)."""

from __future__ import annotations

import gzip
import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from summit_23_snowpark_data_lake_workloads_spark.sources.batch import (
    read_json_sampled,
    read_parquet_by_name,
)

from . import fixtures as FX


def test_read_json_gz_with_sampled_inference(spark, tmp_path):
    """Gzipped JSON-lines with schema inferred from a sample — the
    ``3C_load_txn_history.sql`` path, including scientific-notation
    doubles (``9.2841e+04``)."""
    customers = FX.gen_customers(20)
    txns = FX.gen_txn_history(customers, ["R1-6725013G"], n=200)
    # encode prices in scientific notation like the reference feed
    lines = []
    for t in txns:
        t = dict(t)
        t["PRODUCT_UNIT_PRICE"] = float(f"{t['PRODUCT_UNIT_PRICE']:.4e}")
        lines.append(json.dumps(t))
    for i in range(4):
        with gzip.open(tmp_path / f"txn__{i}.json.gz", "wt") as f:
            f.write("\n".join(lines[i::4]))

    df = read_json_sampled(spark, str(tmp_path / "*.json.gz"), sampling_ratio=0.5)
    assert df.count() == 200
    dtypes = dict(df.dtypes)
    assert dtypes["PRODUCT_UNIT_PRICE"] == "double"
    assert dtypes["TXN_QUANTITY"] == "bigint"
    assert df.filter(F.col("PRODUCT_UNIT_PRICE") <= 0).count() == 0


def test_read_parquet_by_name_case_insensitive(spark, tmp_path):
    """MATCH_BY_COLUMN_NAME = CASE_INSENSITIVE (S2): reorder + case-fold +
    drop extras; missing columns error."""
    src = tmp_path / "t.parquet"
    spark.createDataFrame(
        [(1, "a", 2.0)], ["Alpha", "beta", "GAMMA"]
    ).write.parquet(str(src))
    df = read_parquet_by_name(spark, str(src), ["GAMMA", "ALPHA"])
    assert df.columns == ["GAMMA", "ALPHA"]
    assert df.first().asDict() == {"GAMMA": 2.0, "ALPHA": 1}
    with pytest.raises(ValueError, match="lacks columns"):
        read_parquet_by_name(spark, str(src), ["missing_col"])


def test_call_function_and_call_udf(spark):
    """F14/F15: dynamic invocation by name — ``call_function('position')``
    (``02:27``) and ``call_udf`` for registered UDFs (``03:23``)."""
    df = spark.createDataFrame([("Ann Smith",)], ["name"])
    pos = df.select(
        F.call_function("instr", F.col("name"), F.lit(" ")).alias("p")
    ).first().p
    assert pos == 4

    spark.udf.register("shout", lambda s: s.upper(), T.StringType())
    out = df.select(F.call_udf("shout", F.col("name")).alias("s")).first().s
    assert out == "ANN SMITH"


def test_collect_list_struct_idiom(spark, sf_dir):
    """A5: ``array_agg(object_construct(*))`` equivalent —
    ``collect_list(struct(*))`` (the reference's schema-inference idiom)."""
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    row = region.agg(
        F.collect_list(F.struct("r_regionkey", "r_name")).alias("rows")
    ).first()
    assert len(row.rows) == 5
    assert {r.r_regionkey for r in row.rows} == {0, 1, 2, 3, 4}


def test_gate_order_stalest_green_first(tmp_path):
    """The correctness-gate rotation contract: never-gated and
    last-row-red queries lead; green queries follow oldest-green-first;
    registration order breaks ties."""
    import json
    import pathlib

    from __spark_entry__ import _gate_order_from

    names = ["a", "b", "c", "d", "e", "f"]
    g = {"rows_match": True, "schema_match": True, "hash_match": True}
    red = {"rows_match": True, "schema_match": True, "hash_match": False}
    rows_only = {"rows_match": True, "schema_match": None, "hash_match": None}
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"a": g, "b": g, "c": g})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"b": g, "d": red, "e": rows_only})
    )
    # f never gated; d last-red -> tier 0 in registration order: d, f
    # greens oldest-round-first: a, c (r1) then b, e (r2), registration
    # order breaking ties inside each round
    order = _gate_order_from(pathlib.Path(tmp_path), names)
    assert order == ["d", "f", "a", "c", "b", "e"]

    # force-regate promotes a green-history query whose plan changed
    # in round N into tier 0 — until a green row from round >= N lands,
    # at which point the force expires automatically
    import __spark_entry__ as entry

    try:
        entry.FORCE_REGATE["c"] = 2  # plan changed in r2; green only in r1
        order = _gate_order_from(pathlib.Path(tmp_path), names)
        assert order == ["c", "d", "f", "a", "b", "e"]
        entry.FORCE_REGATE["b"] = 2  # b IS green in r2 -> force expired
        order = _gate_order_from(pathlib.Path(tmp_path), names)
        assert order == ["c", "d", "f", "a", "b", "e"]
    finally:
        entry.FORCE_REGATE.pop("c", None)
        entry.FORCE_REGATE.pop("b", None)


def test_gate_order_defers_late_registrations(tmp_path):
    """DEFER_GATE holds a mid-round late registration BEHIND the
    stale-green rotation until the named round's CORRECTNESS file
    exists, then expires it into tier-0 (never-gated)."""
    import json
    import pathlib

    import __spark_entry__ as entry
    from __spark_entry__ import _gate_order_from

    names = ["a", "b", "late"]
    g = {"rows_match": True, "schema_match": True, "hash_match": True}
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"a": g, "b": g})
    )
    try:
        entry.DEFER_GATE["late"] = 2
        # history only has r1: deferral active -> late sorts LAST
        assert _gate_order_from(pathlib.Path(tmp_path), names) == [
            "a", "b", "late",
        ]
        # round 2's gate has run: deferral expires -> never-gated tier 0
        (tmp_path / "CORRECTNESS_r02.json").write_text(
            json.dumps({"a": g})
        )
        assert _gate_order_from(pathlib.Path(tmp_path), names) == [
            "late", "b", "a",
        ]
    finally:
        entry.DEFER_GATE.pop("late", None)
