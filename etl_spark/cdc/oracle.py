"""Independent oracle: reduce a CDC feed to the expected final table state
with DuckDB (no Spark involvement) — FIXTURES.md F3.

Mirrors the reference's whole-dataset count-reconciliation validation
(/root/reference/legacy/README.md:67-96) but strengthened to full-state
equality: group by (conv_id, turn_idx), keep the max-(ts, op_seq) event,
drop keys whose winning event is a delete; compare per-turn text under
stable (conv_id, turn_idx) ordering (BASELINE.json input_hint invariant).
"""

from __future__ import annotations

import duckdb
import pandas as pd


def expected_final_state(feed_dir: str, extra_cols: list[str] | None = None) -> pd.DataFrame:
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"] + (extra_cols or [])
    col_list = ", ".join(cols)
    q = f"""
        WITH ev AS (
            SELECT * FROM read_parquet('{feed_dir}/*/*.parquet', union_by_name=true)
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, op_seq DESC
            ) AS rn
            FROM ev
        )
        SELECT {col_list}
        FROM ranked
        WHERE rn = 1 AND op <> 'D'
        ORDER BY conv_id, turn_idx
    """
    return duckdb.sql(q).df()


def table_as_pandas(spark_df, order_cols=("conv_id", "turn_idx")) -> pd.DataFrame:
    pdf = spark_df.toPandas()
    return pdf.sort_values(list(order_cols)).reset_index(drop=True)
