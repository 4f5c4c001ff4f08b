from etl_spark.cdc.dedup import lww_dedup, lww_dedup_salted, lww_dedup_window
from etl_spark.cdc.apply import apply_batch, batch_fingerprint, replay_feed
from etl_spark.cdc.gen import change_feed_df, write_feed

__all__ = [
    "lww_dedup",
    "lww_dedup_salted",
    "lww_dedup_window",
    "apply_batch",
    "batch_fingerprint",
    "replay_feed",
    "change_feed_df",
    "write_feed",
]
