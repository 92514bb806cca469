"""Episode-merge repair (SURVEY §2.7 Q3).

Reference parity: ``obanalytics.merge_episodes(p_start, p_end, ...)`` — move
every event in [start, end) to a single microtimestamp, respecting per-order
death/resurrection: an order that dies inside the window and is later seen
again keeps its death instant as the merge target; everything else moves to
``end``; forward pointers inside the window move with them (reference
db/obanalytics_schema.sql:1959-2029; used by merge_crossed_books :1921-1943
and fix_crossed_books :1276-1420).

The reference is an in-place UPDATE; here it is a pure transform returning
the rewritten window rows (recompute-and-overwrite of the silver table at
scale — one window over (pair, order) inside the affected slice only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def merge_episodes(l3: DataFrame, start: str, end: str) -> DataFrame:
    """Q3: window rows with microtimestamp / next_* rewritten to the merge
    target; columns unchanged otherwise."""
    start_c = F.lit(start).cast("timestamp")
    end_c = F.lit(end).cast("timestamp")
    win = l3.filter((F.col("microtimestamp") >= start_c) & (F.col("microtimestamp") < end_c))
    w_fwd = (
        W.partitionBy("pair_id", "exchange_id", "era", "order_id")
        .orderBy("microtimestamp")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    w_all = W.partitionBy("pair_id", "exchange_id", "era", "order_id")
    next_death = F.min(
        F.when(F.col("chain_state") == "deleted", F.col("microtimestamp"))
    ).over(w_fwd)
    last_seen = F.max("microtimestamp").over(w_all)
    resurrected = (next_death < end_c) & (next_death < last_seen)
    new_ts = F.when(resurrected, next_death).otherwise(end_c)
    new_next = (
        F.when(
            F.col("next_microtimestamp").isNotNull()
            & (F.col("next_microtimestamp") <= next_death) & resurrected,
            next_death,
        )
        .when(
            F.col("next_microtimestamp").isNotNull()
            & (F.col("next_microtimestamp") < end_c),
            end_c,
        )
        .otherwise(F.col("next_microtimestamp"))
    )
    return win.select(
        new_ts.alias("microtimestamp"),
        "order_id", "event_no", "side", "price", "amount", "fill",
        new_next.alias("next_microtimestamp"),
        "next_event_no", "pair_id", "exchange_id", "local_timestamp",
        "price_microtimestamp", "price_event_no", "chain_state", "era",
    )


def merge_episodes_oracle_sql(start: str, end: str) -> str:
    return f"""
WITH win AS (
    SELECT * FROM level3
    WHERE microtimestamp >= TIMESTAMP '{start}'
      AND microtimestamp < TIMESTAMP '{end}'
), annotated AS (
    SELECT *,
           min(CASE WHEN chain_state = 'deleted' THEN microtimestamp END) OVER (
               PARTITION BY pair_id, exchange_id, era, order_id
               ORDER BY microtimestamp
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_death,
           max(microtimestamp) OVER (
               PARTITION BY pair_id, exchange_id, era, order_id) AS last_seen
    FROM win
)
SELECT
    CASE WHEN next_death < TIMESTAMP '{end}' AND next_death < last_seen
         THEN next_death ELSE TIMESTAMP '{end}' END AS microtimestamp,
    order_id, event_no, side, price, amount, fill,
    CASE WHEN next_microtimestamp IS NOT NULL
              AND next_microtimestamp <= next_death
              AND next_death < TIMESTAMP '{end}' AND next_death < last_seen
         THEN next_death
         WHEN next_microtimestamp IS NOT NULL
              AND next_microtimestamp < TIMESTAMP '{end}'
         THEN TIMESTAMP '{end}'
         ELSE next_microtimestamp END AS next_microtimestamp,
    next_event_no, pair_id, exchange_id, local_timestamp,
    price_microtimestamp, price_event_no, chain_state, era
FROM annotated
"""
