"""Completeness-gated promotion from staging to canonical (SURVEY §2.2 I11).

Reference parity: ``bitstamp.move_events`` / ``bitstamp.move_trades``
(db/bitstamp_schema.sql:1381-1448, 1450-1478) promote a [start, end] window of
staged order events / trades into the canonical ``obanalytics`` tables. A
chain is COMPLETED — eligible to leave staging — iff

- its last in-window event's ``next_microtimestamp`` is before the window end
  (``first_value(next_microtimestamp) OVER (... ORDER BY microtimestamp DESC,
  event_no DESC) < p_end_time`` — two events may share a microtimestamp, so
  the event_no tiebreak is essential, per the reference's own comment), and
- no trade linked to the chain is half-matched
  (``NOT bool_or(buy_microtimestamp IS DISTINCT FROM sell_microtimestamp)``).

Incomplete chains are *copied* (they stay in staging for a later, wider
window); every promoted row has its forward pointer clipped at the window end
(``next_microtimestamp <= end`` kept, else 'infinity').

Encoding note: this engine stores ±infinity as ``next_microtimestamp IS
NULL`` + ``chain_state`` ∈ {'alive' (+inf), 'deleted' (-inf), 'chained'}
(obadiah_spark.synth), so "last next < end" becomes "last event is deleted,
or chained with next < end", and clipping rewrites 'chained'-beyond-end to
'alive'. The half-matched trade test takes a ``fully_matched`` boolean on the
trades frame (a real two-sided feed computes it as buy_ts == sell_ts; the
gate query derives a deterministic mix so the branch is non-vacuous).

Spark-first: one broadcast-free shuffle on the window slice — the chain flag
is two window functions over (pair, exchange, order); the trade link is an
equi-join on the same keys. No driver loops, no UDFs; at 100 TB the window
[start, end] bounds the working set (promotion batches are hours, not eras).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

MOVE_COLS = [
    "microtimestamp", "order_id", "event_no", "side", "price", "amount",
    "fill", "next_microtimestamp", "next_event_no", "pair_id", "exchange_id",
    "local_timestamp", "price_microtimestamp", "price_event_no",
    "chain_state", "era", "life_no",
]


def move_events(l3: DataFrame, trades: DataFrame, start: str, end: str) -> DataFrame:
    """I11: promote the [start, end] window; returns canonical-shape rows
    (pointers clipped at ``end``) plus ``is_completed`` (true = the chain may
    be deleted from staging).

    ``trades`` needs (pair_id, microtimestamp, order_id, event_no,
    fully_matched) — the maker-side link of each staged trade.
    """
    start_c = F.lit(start).cast("timestamp")
    end_c = F.lit(end).cast("timestamp")
    win = l3.filter(
        (F.col("microtimestamp") >= start_c) & (F.col("microtimestamp") <= end_c)
    )
    # dedup the link projection: if two staged trades link the same maker
    # event, a bare join would duplicate promoted level3 rows; a chain is
    # half-matched if ANY of its linked trades is (bool_and mirrors
    # staging_summary's distinct-link guard)
    t = trades.groupBy(
        F.col("pair_id").alias("t_pair"), F.col("microtimestamp").alias("t_ts"),
        F.col("order_id").alias("t_oid"), F.col("event_no").alias("t_eno"),
    ).agg(F.bool_and("fully_matched").alias("fully_matched"))
    j = win.join(
        t,
        (F.col("pair_id") == F.col("t_pair")) & (F.col("microtimestamp") == F.col("t_ts"))
        & (F.col("order_id") == F.col("t_oid")) & (F.col("event_no") == F.col("t_eno")),
        "left",
    )
    # chain identity includes era + life_no (consistent with
    # insert_level3_era's chain windows): a reused order_id across eras, or a
    # reincarnated life within one, must not let a later closed chain mark an
    # earlier still-open one completed
    w_chain = W.partitionBy("pair_id", "exchange_id", "order_id", "era", "life_no")
    w_last = w_chain.orderBy(F.desc("microtimestamp"), F.desc("event_no"))
    last_closed = F.first(
        (F.col("chain_state") == "deleted")
        | ((F.col("chain_state") == "chained") & (F.col("next_microtimestamp") < end_c))
    ).over(w_last)
    half_matched = F.max(
        F.coalesce(~F.col("fully_matched"), F.lit(False)).cast("int")
    ).over(w_chain) == 1
    clip = F.col("chain_state") == "chained"  # only finite pointers can clip
    beyond = clip & (F.col("next_microtimestamp") > end_c)
    return j.select(
        *MOVE_COLS[:7],
        F.when(beyond, F.lit(None).cast("timestamp"))
        .otherwise(F.col("next_microtimestamp")).alias("next_microtimestamp"),
        F.when(beyond, F.lit(None).cast("int"))
        .otherwise(F.col("next_event_no")).alias("next_event_no"),
        *MOVE_COLS[9:14],
        F.when(beyond, F.lit("alive")).otherwise(F.col("chain_state")).alias("chain_state"),
        "era", "life_no",
        (last_closed & ~half_matched).alias("is_completed"),
    )


def move_trades(trades: DataFrame, start: str, end: str) -> DataFrame:
    """I11: promote fully-matched staged trades in [start, end] to the
    canonical matches shape (half-matched ones stay in staging — the
    reference's DELETE touches only ``buy_microtimestamp =
    sell_microtimestamp`` rows)."""
    start_c = F.lit(start).cast("timestamp")
    end_c = F.lit(end).cast("timestamp")
    return trades.filter(
        F.col("fully_matched")
        & (F.col("microtimestamp") >= start_c) & (F.col("microtimestamp") <= end_c)
    ).select(
        "amount", "price", "side", "microtimestamp",
        "buy_order_id", "buy_event_no", "sell_order_id", "sell_event_no",
        "buy_match_rule", "sell_match_rule", "local_timestamp", "pair_id",
        "exchange_id",
        F.col("side").alias("exchange_side"),
        "exchange_trade_id", "era",
    )


# gate fabric: a deterministic fully_matched mix over the synthetic matches
# (two of three trades fully matched; real feeds compute buy_ts == sell_ts)
STAGED_TRADES_SQL = """
SELECT pair_id, microtimestamp,
       coalesce(buy_order_id, sell_order_id) AS order_id,
       coalesce(buy_event_no, sell_event_no) AS event_no,
       exchange_trade_id % 3 <> 0 AS fully_matched,
       amount, price, side, buy_order_id, buy_event_no, sell_order_id,
       sell_event_no, buy_match_rule, sell_match_rule, local_timestamp,
       exchange_id, exchange_trade_id, era
FROM matches
"""


def move_events_oracle_sql(start: str, end: str) -> str:
    return f"""
WITH staged AS ({STAGED_TRADES_SQL}),
links AS (
    SELECT pair_id, microtimestamp, order_id, event_no,
           bool_and(fully_matched) AS fully_matched
    FROM staged GROUP BY 1, 2, 3, 4
),
win AS (
    SELECT l.*, s.fully_matched
    FROM level3 l LEFT JOIN links s
      ON l.pair_id = s.pair_id AND l.microtimestamp = s.microtimestamp
     AND l.order_id = s.order_id AND l.event_no = s.event_no
    WHERE l.microtimestamp >= TIMESTAMP '{start}'
      AND l.microtimestamp <= TIMESTAMP '{end}'
), flagged AS (
    SELECT *,
        first_value(chain_state = 'deleted' OR
                    (chain_state = 'chained' AND next_microtimestamp < TIMESTAMP '{end}'))
            OVER (PARTITION BY pair_id, exchange_id, order_id, era, life_no
                  ORDER BY microtimestamp DESC, event_no DESC) AS last_closed,
        max(CASE WHEN NOT coalesce(fully_matched, true) THEN 1 ELSE 0 END)
            OVER (PARTITION BY pair_id, exchange_id, order_id, era, life_no)
            = 1 AS half_matched
    FROM win
)
SELECT microtimestamp, order_id, event_no, side, price, amount, fill,
       CASE WHEN chain_state = 'chained' AND next_microtimestamp > TIMESTAMP '{end}'
            THEN NULL ELSE next_microtimestamp END AS next_microtimestamp,
       CASE WHEN chain_state = 'chained' AND next_microtimestamp > TIMESTAMP '{end}'
            THEN NULL ELSE next_event_no END AS next_event_no,
       pair_id, exchange_id, local_timestamp, price_microtimestamp,
       price_event_no,
       CASE WHEN chain_state = 'chained' AND next_microtimestamp > TIMESTAMP '{end}'
            THEN 'alive' ELSE chain_state END AS chain_state,
       era, life_no,
       last_closed AND NOT half_matched AS is_completed
FROM flagged
"""


def staging_summary(l3: DataFrame, staged_trades: DataFrame,
                    l1: DataFrame, d2: DataFrame) -> DataFrame:
    """E5 ``bitstamp.summary`` (db/bitstamp_schema.sql:2163-2255): staging-ops
    stats per (pair, era) — event counts with matched/unmatched splits (an
    event is *unmatched* when it reports a positive fill but no staged trade
    links to it: ``trade_id IS NULL AND fill > 0`` in the reference), trade
    counts split fully/half-matched, and last-seen/cardinality of the derived
    spread (``l1``) and depth (``d2``, with an ``era`` column) streams.

    Scale: four independent map-side-combinable groupBys on (pair, era) —
    no windows, no per-row state; each input stream is aggregated once.
    """
    ev_links = staged_trades.select(
        F.col("pair_id").alias("t_pair"), F.col("microtimestamp").alias("t_ts"),
        F.col("order_id").alias("t_oid"), F.col("event_no").alias("t_eno"),
    ).distinct()
    ev = l3.join(
        ev_links,
        (F.col("pair_id") == F.col("t_pair")) & (F.col("microtimestamp") == F.col("t_ts"))
        & (F.col("order_id") == F.col("t_oid")) & (F.col("event_no") == F.col("t_eno")),
        "left",
    ).groupBy("pair_id", "era").agg(
        F.count(F.lit(1)).alias("events"),
        F.min("microtimestamp").alias("e_first_ts"),
        F.max("microtimestamp").alias("e_last_ts"),
        F.count(F.when(F.col("t_oid").isNotNull(), 1)).alias("e_matched"),
        F.count(F.when(F.col("t_oid").isNull() & (F.col("fill") > 0)
                       & (F.col("chain_state") != "deleted"), 1)).alias("e_not_m"),
    )
    tr = staged_trades.groupBy("pair_id", "era").agg(
        F.count(F.lit(1)).alias("trades"),
        F.count(F.when(F.col("fully_matched"), 1)).alias("t_matched"),
        F.count(F.when(~F.col("fully_matched"), 1)).alias("t_not_m"),
    )
    sp = l1.groupBy("pair_id", "era").agg(
        F.count(F.lit(1)).alias("spreads"),
        F.max("microtimestamp").alias("s_last_ts"),
    )
    dp = d2.groupBy("pair_id", "era").agg(
        F.count(F.lit(1)).alias("depth"),
        F.max("microtimestamp").alias("d_last_ts"),
    )
    secs = (F.unix_micros("e_last_ts") - F.unix_micros("e_first_ts")) / 1e6
    return (
        ev.join(tr, ["pair_id", "era"], "left")
        .join(sp, ["pair_id", "era"], "left")
        .join(dp, ["pair_id", "era"], "left")
        .select(
            "era", "pair_id", "events",
            F.unix_micros("e_last_ts").alias("e_last_us"),
            F.when(secs > 0, F.round(F.col("events") / secs, 2))
            .otherwise(F.lit(0.0)).alias("e_per_sec"),
            "e_matched", "e_not_m",
            F.coalesce("trades", F.lit(0)).alias("trades"),
            F.coalesce("t_matched", F.lit(0)).alias("t_matched"),
            F.coalesce("t_not_m", F.lit(0)).alias("t_not_m"),
            F.coalesce("spreads", F.lit(0)).alias("spreads"),
            F.unix_micros("s_last_ts").alias("s_last_us"),
            F.coalesce("depth", F.lit(0)).alias("depth"),
            F.unix_micros("d_last_ts").alias("d_last_us"),
        )
    )


def staging_summary_oracle_sql() -> str:
    """Mirror over the level3/matches CTEs + the linear spread/depth CTEs
    (l1_dedup / changes from obadiah_spark.operators.depth)."""
    from obadiah_spark.operators.depth import SPREAD_L1_CTES

    return f"""
WITH {SPREAD_L1_CTES}, staged AS ({STAGED_TRADES_SQL}),
sev AS (
    SELECT l.pair_id, l.era, count(*) AS events,
           min(l.microtimestamp) AS e_first_ts,
           max(l.microtimestamp) AS e_last_ts,
           count(*) FILTER (WHERE s.order_id IS NOT NULL) AS e_matched,
           count(*) FILTER (WHERE s.order_id IS NULL AND l.fill > 0
                            AND l.chain_state <> 'deleted') AS e_not_m
    FROM level3 l LEFT JOIN (SELECT DISTINCT pair_id, microtimestamp, order_id, event_no
                             FROM staged) s
      ON l.pair_id = s.pair_id AND l.microtimestamp = s.microtimestamp
     AND l.order_id = s.order_id AND l.event_no = s.event_no
    GROUP BY l.pair_id, l.era
), str_ AS (
    SELECT pair_id, era, count(*) AS trades,
           count(*) FILTER (WHERE fully_matched) AS t_matched,
           count(*) FILTER (WHERE NOT fully_matched) AS t_not_m
    FROM staged GROUP BY pair_id, era
), ssp AS (
    SELECT pair_id, era, count(*) AS spreads, max(ts) AS s_last_ts
    FROM l1_dedup GROUP BY pair_id, era
), sdp AS (
    SELECT pair_id, era, count(*) AS depth, max(microtimestamp) AS d_last_ts
    FROM changes GROUP BY pair_id, era
)
SELECT sev.era, sev.pair_id, events,
       epoch_us(e_last_ts) AS e_last_us,
       CASE WHEN epoch_us(e_last_ts) - epoch_us(e_first_ts) > 0
            THEN round(events / ((epoch_us(e_last_ts) - epoch_us(e_first_ts)) / 1e6), 2)
            ELSE 0.0 END AS e_per_sec,
       e_matched, e_not_m,
       CAST(coalesce(trades, 0) AS BIGINT) AS trades,
       CAST(coalesce(t_matched, 0) AS BIGINT) AS t_matched,
       CAST(coalesce(t_not_m, 0) AS BIGINT) AS t_not_m,
       CAST(coalesce(spreads, 0) AS BIGINT) AS spreads,
       epoch_us(s_last_ts) AS s_last_us,
       CAST(coalesce(depth, 0) AS BIGINT) AS depth,
       epoch_us(d_last_ts) AS d_last_us
FROM sev LEFT JOIN str_ ON sev.pair_id = str_.pair_id AND sev.era = str_.era
        LEFT JOIN ssp ON sev.pair_id = ssp.pair_id AND sev.era = ssp.era
        LEFT JOIN sdp ON sev.pair_id = sdp.pair_id AND sev.era = sdp.era
"""


def move_trades_oracle_sql(start: str, end: str) -> str:
    return f"""
WITH staged AS ({STAGED_TRADES_SQL})
SELECT amount, price, side, microtimestamp,
       buy_order_id, buy_event_no, sell_order_id, sell_event_no,
       buy_match_rule, sell_match_rule, local_timestamp, pair_id,
       exchange_id, side AS exchange_side, exchange_trade_id, era
FROM staged
WHERE fully_matched
  AND microtimestamp >= TIMESTAMP '{start}'
  AND microtimestamp <= TIMESTAMP '{end}'
"""
