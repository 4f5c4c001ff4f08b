from etl_spark.cdc.dedup import lww_dedup, lww_dedup_salted, lww_dedup_window
from etl_spark.cdc.apply import (
    AuditFailedError,
    apply_batch,
    batch_fingerprint,
    replay_feed,
    wap_replay,
)
from etl_spark.cdc.gen import change_feed_df, write_feed

__all__ = [
    "AuditFailedError",
    "wap_replay",
    "lww_dedup",
    "lww_dedup_salted",
    "lww_dedup_window",
    "apply_batch",
    "batch_fingerprint",
    "replay_feed",
    "change_feed_df",
    "write_feed",
]
