"""Scalar-function kit (SURVEY §2.7 census).

Everything here is a composition of built-in ``pyspark.sql.functions``
— JVM-side, whole-stage-codegen'd, zero Python in the row path.

Reference parity:
- ``norm_sym`` / ``as_long_clean`` / ``as_double_clean`` re-express
  ``utils/init_spark.py:38-44`` (symbol normalization; stripping
  non-numeric chars from dirty numeric strings before cast).
- ``sk_crc32`` re-expresses the reference's surrogate-key generator
  (``curated/dim_company.py:98-99``, ``dim_exchange.py:64-65``,
  ``dim_currency.py:119``, ``dim_trading_status.py:65-67``): crc32
  over a ``concat_ws`` of the natural key, cast to bigint. Kept for
  parity; ``sk_sha256``/xxhash64 is the collision-safe 100 TB
  upgrade (crc32's 32-bit space collides at ~77k keys with 50%
  probability).
- ``date_sk`` re-expresses the smart date key
  (``curated/dim_date.py:65``, ``fact_stock_daily.py:77``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_NON_NUMERIC = r"[^0-9\.\-]"


def norm_sym(c: Column | str) -> Column:
    """Uppercase + trim symbol normalization (``init_spark.py:38``)."""
    return F.upper(F.trim(F.col(c) if isinstance(c, str) else c))


def as_long_clean(c: Column | str) -> Column:
    """Strip non-numeric chars, cast to long (``init_spark.py:41-42``).

    Handles thousands separators, currency suffixes, "Not found"
    placeholders (→ NULL via failed cast).
    """
    col = F.col(c) if isinstance(c, str) else c
    cleaned = F.regexp_replace(col.cast("string"), _NON_NUMERIC, "")
    # try_cast: "Not found" strips to "" → NULL (the reference ran
    # pre-ANSI Spark where plain cast returned NULL; ANSI throws).
    # Direct long cast first — exact for integral strings of any
    # magnitude; the double route only catches "123.0"-style decimals
    # (routing everything through double would corrupt ints > 2^53).
    return F.coalesce(
        cleaned.try_cast("long"), cleaned.try_cast("double").try_cast("long")
    )


def as_double_clean(c: Column | str) -> Column:
    """Strip non-numeric chars, cast to double (``init_spark.py:43-44``)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(col.cast("string"), _NON_NUMERIC, "").try_cast("double")


def sk_crc32(*cols: Column | str, sep: str = "||") -> Column:
    """Reference-parity surrogate key: crc32(concat_ws(sep, keys))::bigint."""
    parts = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.crc32(F.concat_ws(sep, *parts)).cast("bigint")


def sk_sha256(*cols: Column | str, sep: str = "||") -> Column:
    """Collision-safe surrogate key / fingerprint: sha2-256 hex string.

    Matches the reference's SCD2 attribute fingerprint idiom
    (``dim_company.py:63``: sha2(concat_ws("||", attrs), 256)) and is
    the scale-safe SK choice — also directly comparable with any ANSI
    engine's ``sha256`` for oracle checks.
    """
    parts = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.sha2(F.concat_ws(sep, *parts), 256)


def row_fp(*cols: Column | str) -> Column:
    """Collision-free row fingerprint: md5 per column (fixed 32-hex
    tokens, so no separator-injection collisions), NULL encoded as a
    non-hex sentinel, md5 over the concatenation. Used for CDC row
    comparison; distinct from ``sk_sha256`` which keeps the
    reference's separator-based SCD2 fingerprint semantics."""
    parts = [
        F.coalesce(
            F.md5((F.col(c) if isinstance(c, str) else c).cast("string")),
            F.lit("NULL"),
        )
        for c in cols
    ]
    return F.md5(F.concat(*parts))


def date_sk(c: Column | str) -> Column:
    """Smart yyyymmdd integer date key (``dim_date.py:65``)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.date_format(col, "yyyyMMdd").cast("int")


# --- numeric stability helpers for cross-engine-exact aggregation ---
#
# Summing doubles is order-dependent; Spark's partial aggregation order
# is nondeterministic across partitions, so sum(double) can differ in
# the last ulps between runs and engines. Casting to decimal first
# makes the sum exact and associative → bit-identical results on any
# engine and any partitioning. Used by every oracle-checked aggregate.

_DEC = "decimal(28,6)"


def dsum(c: Column | str) -> Column:
    """Order-independent exact sum: cast to decimal(28,6), sum, → double."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(col.cast(_DEC)).cast("double")


def davg(c: Column | str) -> Column:
    """Order-independent average: exact decimal sum → double, / count.

    The division happens in double (not decimal) because decimal
    division precision/scale rules are engine-specific; double ÷ int64
    is IEEE-identical everywhere.
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(col.cast(_DEC)).cast("double") / F.count(col)
