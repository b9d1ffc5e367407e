"""Join strategy helpers for scale (SURVEY §4 R4/R15).

AQE's skew-join splitting handles most skew automatically; these helpers
cover the two cases the optimizer can't do for you:
- ``salted_join`` — pre-splitting a pathologically hot key across
  ``n_salts`` shuffle partitions (useful when one key holds >10% of the
  fact table and even AQE's split partitions overwhelm a single reducer
  chain);
- bucketed tables (see ``sources.catalog.save_table(bucket_by=...)``) —
  co-locating both sides of a recurring join so the shuffle happens once
  at write time instead of on every query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the large side's hot keys split across ``n_salts``
    sub-keys and the small side replicated to every salt.

    The salt must vary PER ROW of the large side (not per key — a
    key-derived salt would send every row of the hot key to the same
    reducer, making the operator a no-op). It derives deterministically
    from a hash over ALL large-side columns, so retries re-hash to the
    same salt and results are exactly those of
    ``large.join(small, on, how)`` — only the shuffle distribution
    changes. Cost: small side x n_salts.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(n_salts))
    large_s = large.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    out = large_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")
