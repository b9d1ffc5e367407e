"""Unit tests for the extended TO_NUMBER format grammar
(``functions.scalar.to_number_fmt``) — semantics pinned against the
documented Snowflake behavior for each format element.
"""

from __future__ import annotations

from decimal import Decimal

import pytest

from summit_23_snowpark_data_lake_workloads_spark.functions.scalar import to_number_fmt


def _one(spark, s: str, fmt: str):
    df = spark.createDataFrame([(s,)], "s string")
    return df.select(to_number_fmt("s", fmt).alias("v")).first().v


@pytest.mark.parametrize(
    "s,fmt,want",
    [
        ("$1,334.24", "$999,999.99", Decimal("1334.24")),
        ("$0.07", "$999,999.99", Decimal("0.07")),
        ("1448.80", "999999.99", Decimal("1448.80")),
        ("12345", "999999", Decimal("12345")),
        ("+12.50", "S999.99", Decimal("12.50")),
        ("-12.50", "S999.99", Decimal("-12.50")),
        ("123.45-", "999.99MI", Decimal("-123.45")),
        ("123.45", "999.99MI", Decimal("123.45")),
        ("$9,999.99-", "$9,999.99MI", Decimal("-9999.99")),
        ("ff", "XX", 255),
        ("DEAD", "XXXX", 57005),
        ("1.23E+04", "9.99EEEE", Decimal("12300")),
        ("4.5e-2", "9.99EEEE", Decimal("0.05")),  # 0.045 rounds at scale 2
    ],
)
def test_to_number_fmt(spark, s, fmt, want):
    got = _one(spark, s, fmt)
    if isinstance(want, Decimal):
        assert got == pytest.approx(Decimal(want), abs=Decimal("0.01"))
    else:
        assert got == want


def test_to_number_fmt_scale_fixed_by_format(spark):
    v = _one(spark, "1,234.567", "9,999.99")
    # scale 2 from the format: value rounds to 2 decimals like Snowflake
    assert v == Decimal("1234.57")
