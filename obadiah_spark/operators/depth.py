"""Depth (level2) derivation — declarative forms.

Reference parity:
- D2 ``depth_change_by_episode_slow`` + ``_depth_change(ob,ob)`` — declarative
  per-episode (price, side) volume changes (reference
  db/obanalytics_schema.sql:1236-1267,625-639). The reference computes it as
  book-vs-book full-outer joins; we use the equivalent *event-delta* form:
  every level3 event contributes +amount at its (side, price) and −prev_amount
  at the previous (side, price) of the same chain — linear, one shuffle, no
  quadratic snapshot join.
- D1 ``depth_change_by_episode_fast`` is the fold in ``obadiah_spark.fold``
  (``depth_change_fold``); this module is its differential-testing oracle
  shape (the reference's own fast-vs-slow strategy).

Scale: the delta form is a window over (order_id, era) + one grouped
aggregation — both shuffle on bounded keys, no joins against snapshots, and
survive 100× data without plan change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

DEPTH_COLS = ["pair_id", "microtimestamp", "side", "price", "volume", "volume_change"]


def depth_change(l3: DataFrame) -> DataFrame:
    """D2: per-episode changed (side, price) levels with running volume."""
    w_chain = W.partitionBy("order_id", "era").orderBy("event_no")
    ev = l3.select(
        "pair_id", "era", "microtimestamp", "side", "price", "amount", "chain_state",
        F.lag("amount").over(w_chain).alias("prev_amount"),
        F.lag("price").over(w_chain).alias("prev_price"),
    )
    arrivals = ev.filter(F.col("chain_state") != "deleted").select(
        "pair_id", "era", "microtimestamp", "side",
        F.col("price").alias("p"), F.col("amount").alias("delta"),
    )
    removals = ev.filter(F.col("prev_amount").isNotNull()).select(
        "pair_id", "era", "microtimestamp", "side",
        F.col("prev_price").alias("p"), (-F.col("prev_amount")).alias("delta"),
    )
    changes = (
        arrivals.unionByName(removals)
        .groupBy("pair_id", "era", "microtimestamp", "side", F.col("p").alias("price"))
        .agg(F.sum("delta").alias("volume_change"))
        .filter(F.col("volume_change") != 0)
    )
    w_level = W.partitionBy("pair_id", "era", "side", "price").orderBy("microtimestamp")
    return changes.select(
        "pair_id", "microtimestamp", "side", "price",
        F.sum("volume_change").over(
            w_level.rowsBetween(W.unboundedPreceding, W.currentRow)
        ).alias("volume"),
        "volume_change",
    )


# Shared CTE list: event deltas → per-episode changed levels. Used by both the
# depth oracle and the linear spread oracle (wrap with synth.level3_cte).
DEPTH_CHANGES_CTES = """ev AS (
    SELECT pair_id, era, microtimestamp, side, price, amount, chain_state,
           lag(amount) OVER w AS prev_amount,
           lag(price)  OVER w AS prev_price
    FROM level3
    WINDOW w AS (PARTITION BY order_id, era ORDER BY event_no)
), deltas AS (
    SELECT pair_id, era, microtimestamp, side, price AS p, amount AS delta
    FROM ev WHERE chain_state <> 'deleted'
    UNION ALL
    SELECT pair_id, era, microtimestamp, side, prev_price AS p, -prev_amount AS delta
    FROM ev WHERE prev_amount IS NOT NULL
), changes AS (
    SELECT pair_id, era, microtimestamp, side, p AS price, sum(delta) AS volume_change
    FROM deltas
    GROUP BY pair_id, era, microtimestamp, side, p
    HAVING sum(delta) <> 0
)"""

DEPTH_CHANGE_ORACLE_BODY = f"""
WITH {DEPTH_CHANGES_CTES}
SELECT pair_id, microtimestamp, side, price,
       sum(volume_change) OVER (
           PARTITION BY pair_id, era, side, price ORDER BY microtimestamp
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS volume,
       volume_change
FROM changes
"""

# Linear level1 derivation ending in CTE l1_dedup(pair_id, era, ts, best_*)
# so other oracles (get.events' as-of spread join) can build on it.
# Shape: change timeline × per-era price grid (bounded: only
# prices that ever change), running volume per level, best = extremal live
# price per episode, dedup-on-change. Replaces the quadratic
# episode×live-set join as the spread oracle at sf>=0.01 scale.
SPREAD_L1_CTES = f"""{DEPTH_CHANGES_CTES}, grid AS (
    SELECT e.pair_id, e.era, e.ts, p.side, p.price
    FROM (SELECT DISTINCT pair_id, era, microtimestamp AS ts FROM changes) e
    JOIN (SELECT DISTINCT pair_id, era, side, price FROM changes) p
      ON p.pair_id = e.pair_id AND p.era = e.era
), vol AS (
    SELECT g.pair_id, g.era, g.ts, g.side, g.price,
           sum(coalesce(c.volume_change, 0)) OVER (
               PARTITION BY g.pair_id, g.era, g.side, g.price ORDER BY g.ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS volume
    FROM grid g LEFT JOIN changes c
      ON c.pair_id = g.pair_id AND c.era = g.era AND c.side = g.side
     AND c.price = g.price AND c.microtimestamp = g.ts
), best AS (
    SELECT pair_id, era, ts,
           max(CASE WHEN side = 'b' AND volume > 0 THEN price END) AS best_bid_price,
           min(CASE WHEN side = 's' AND volume > 0 THEN price END) AS best_ask_price
    FROM vol GROUP BY pair_id, era, ts
), l1 AS (
    SELECT b.pair_id, b.era, b.ts, b.best_bid_price, b.best_ask_price,
           max(CASE WHEN v.side = 'b' AND v.price = b.best_bid_price THEN v.volume END) AS best_bid_qty,
           max(CASE WHEN v.side = 's' AND v.price = b.best_ask_price THEN v.volume END) AS best_ask_qty
    FROM best b JOIN vol v
      ON v.pair_id = b.pair_id AND v.era = b.era AND v.ts = b.ts
    GROUP BY b.pair_id, b.era, b.ts, b.best_bid_price, b.best_ask_price
), l1_lag AS (
    SELECT *,
           lag(best_bid_price) OVER w AS p_bb,
           lag(best_bid_qty)  OVER w AS p_bq,
           lag(best_ask_price) OVER w AS p_ba,
           lag(best_ask_qty)  OVER w AS p_aq
    FROM l1
    WINDOW w AS (PARTITION BY pair_id, era ORDER BY ts)
), l1_dedup AS (
    SELECT pair_id, era, ts, best_bid_price, best_bid_qty, best_ask_price, best_ask_qty
    FROM l1_lag
    WHERE p_bb IS DISTINCT FROM best_bid_price
       OR p_bq IS DISTINCT FROM best_bid_qty
       OR p_ba IS DISTINCT FROM best_ask_price
       OR p_aq IS DISTINCT FROM best_ask_qty
)"""

SPREAD_LINEAR_ORACLE_BODY = f"""
WITH {SPREAD_L1_CTES}
SELECT pair_id, ts AS microtimestamp,
       best_bid_price, best_bid_qty, best_ask_price, best_ask_qty
FROM l1_dedup
"""
