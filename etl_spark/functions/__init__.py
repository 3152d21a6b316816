from etl_spark.functions.normalize import (  # noqa: F401
    normalize_content,
    normalize_series,
    normalize_udf,
    sha256_hex,
    with_content_sha256,
)
