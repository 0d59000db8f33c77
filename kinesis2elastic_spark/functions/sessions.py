"""THE batch sessionization rule — one definition of the 30-minute-gap
session identity shared by every operator that talks about "a session"
(B25 q_sessionize, B55 q_session_overlap, B124 q_session_paths).

Before r8 this block was copy-pasted at three Spark sites and three SQL
oracle sites; agreement on session identity was enforced only by the
copies staying in sync (r8 review finding).  A change to the gap rule now
lands everywhere at once.  (The STREAMING session constant lives in
``streaming/windows.py`` with its own gap, serving a different contract —
the stream/batch equivalence queries pin that pairing.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30


def with_session_ids(df: DataFrame) -> DataFrame:
    """Append ``session_id`` (BIGINT, per-user running index) via the
    lag + cumulative-sum gap rule over (ts, event_id) order.  Two window
    functions over the same ordering: Catalyst plans ONE shuffle+sort."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(
        gap_us.isNull() | (gap_us > SESSION_GAP_MIN * 60 * 1_000_000), 1
    ).otherwise(0)
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return df.withColumn("session_id", F.sum(new_session).over(wrun).cast("long"))


def session_cte_sql(select_cols: str) -> str:
    """DuckDB twin: ``flagged``/``sessioned`` CTE bodies (use as
    ``WITH {session_cte_sql(cols)} SELECT ... FROM sessioned``)."""
    return f"""flagged AS (
      SELECT {select_cols},
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                       > {SESSION_GAP_MIN} * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessioned AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )"""
