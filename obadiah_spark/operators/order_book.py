"""Point-in-time order-book snapshot + user-facing book analytics.

Reference parity:
- B1 ``obanalytics.order_book(p_ts, ...)`` — as-of snapshot of live level3
  events (reference db/obanalytics_schema.sql:2035-2075): rows of the current
  era with ``microtimestamp <= ts < next_microtimestamp``.
- B6 ``get.order_book`` — snapshot + analytics: best prices, cumulative
  liquidity from the best price outward, bps distance from best, dense-rank
  price level (reference db/get_schema.sql:561-603).

Spark-first design: the snapshot is a pure filter (predicate pushdown prunes
partitions on era/pair at scale); the analytics are window functions over the
small live set — no custom operator needed. At 100 TB the live set per
(pair, era) is O(open orders) ≈ 10⁴-10⁵ rows, so the windows are cheap; the
scan cost is bounded by partition pruning on (exchange, pair, era).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def live_at(l3: DataFrame, at_ts, before: bool = False) -> DataFrame:
    """Events alive at instant ``at_ts`` within its era.

    ±infinity convention (see synth.py): chain_state 'alive' = next is
    +infinity (always live once created), 'deleted' = order removed at this
    event (never live), 'chained' = live in [microtimestamp, next).
    ``before=True`` uses the book the instant *before* at_ts (strict <), as
    the reference's ``p_before`` flag does.
    """
    at: Column = F.lit(at_ts).cast("timestamp")
    started = F.col("microtimestamp") < at if before else F.col("microtimestamp") <= at
    not_ended = (F.col("chain_state") == "alive") | (
        (F.col("chain_state") == "chained")
        & (F.col("next_microtimestamp") >= at if before else F.col("next_microtimestamp") > at)
    )
    # era is DATA-DRIVEN: the current era is the max era that started at or
    # before at_ts, per (pair, exchange) — reference selects max(era) <= p_ts
    # (db/obanalytics_schema.sql:2061-2065). With before=True an era starting
    # exactly at at_ts is not yet current (strict <).
    era_started = F.col("era") < at if before else F.col("era") <= at
    w_pair = W.partitionBy("pair_id", "exchange_id")
    cur = (
        l3.filter(era_started)
        .withColumn("_cur_era", F.max("era").over(w_pair))
        .filter(F.col("era") == F.col("_cur_era"))
        .drop("_cur_era")
    )
    return cur.filter(started & not_ended)


def order_book(l3: DataFrame, at_ts, max_levels: int | None = None) -> DataFrame:
    """B6: snapshot with liquidity / bps / price level analytics."""
    live = live_at(l3, at_ts)
    # distance from the top of the book: bids descend, asks ascend
    dist = F.when(F.col("side") == "b", -F.col("price")).otherwise(F.col("price"))
    w_pair = W.partitionBy("pair_id", "exchange_id", "side")
    w_walk = w_pair.orderBy(dist, "microtimestamp", "order_id", "event_no")
    w_rank = w_pair.orderBy(dist)

    best = F.when(
        F.col("side") == "b", F.max("price").over(w_pair)
    ).otherwise(F.min("price").over(w_pair))

    out = (
        live.withColumn(
            "liquidity",
            F.sum("amount").over(w_walk.rowsBetween(W.unboundedPreceding, W.currentRow)),
        )
        .withColumn("bps", F.abs(F.col("price") - best) / best * F.lit(10000).cast("double"))
        .withColumn("lvl", F.dense_rank().over(w_rank).cast("bigint"))
        .select(
            "pair_id", "exchange_id", "side", "price", "amount",
            "order_id", "event_no", "microtimestamp", "liquidity", "bps", "lvl",
        )
    )
    if max_levels is not None:
        out = out.filter(F.col("lvl") <= max_levels)
    return out


def order_book_oracle_sql(at_ts: str, max_levels: int | None = None) -> str:
    """DuckDB oracle for order_book (independent formulation, same semantics)."""
    lvl_filter = f"WHERE lvl <= {max_levels}" if max_levels is not None else ""
    return f"""
SELECT * FROM (
    SELECT
        pair_id, exchange_id, side, price, amount,
        order_id, event_no, microtimestamp,
        sum(amount) OVER (
            PARTITION BY pair_id, exchange_id, side
            ORDER BY CASE WHEN side = 'b' THEN -price ELSE price END,
                     microtimestamp, order_id, event_no
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS liquidity,
        abs(price - CASE WHEN side = 'b'
                         THEN max(price) OVER (PARTITION BY pair_id, exchange_id, side)
                         ELSE min(price) OVER (PARTITION BY pair_id, exchange_id, side)
                    END)
            / CASE WHEN side = 'b'
                   THEN max(price) OVER (PARTITION BY pair_id, exchange_id, side)
                   ELSE min(price) OVER (PARTITION BY pair_id, exchange_id, side)
              END * CAST(10000 AS DOUBLE) AS bps,
        dense_rank() OVER (
            PARTITION BY pair_id, exchange_id, side
            ORDER BY CASE WHEN side = 'b' THEN -price ELSE price END) AS lvl
    FROM level3 l
    WHERE microtimestamp <= TIMESTAMP '{at_ts}'
      AND era = (SELECT max(era) FROM level3 l2
                 WHERE l2.pair_id = l.pair_id AND l2.exchange_id = l.exchange_id
                   AND l2.era <= TIMESTAMP '{at_ts}')
      AND (chain_state = 'alive'
           OR (chain_state = 'chained' AND next_microtimestamp > TIMESTAMP '{at_ts}'))
) t {lvl_filter}
"""
