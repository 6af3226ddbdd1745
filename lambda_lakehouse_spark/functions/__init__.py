from lambda_lakehouse_spark.functions.scalar import (
    as_double_clean,
    as_long_clean,
    date_sk,
    davg,
    dsum,
    norm_sym,
    sk_crc32,
    sk_sha256,
)

__all__ = [
    "as_double_clean",
    "as_long_clean",
    "date_sk",
    "davg",
    "dsum",
    "norm_sym",
    "sk_crc32",
    "sk_sha256",
]
