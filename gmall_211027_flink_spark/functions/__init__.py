from gmall_211027_flink_spark.functions.scalar import (
    dec, dsum, dsum_expr, day_str, bucket_start_str, hex_to_long,
)

__all__ = ["dec", "dsum", "dsum_expr", "day_str", "bucket_start_str",
           "hex_to_long"]
