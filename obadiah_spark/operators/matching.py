"""Trade matching (SURVEY §2.2 I5/I6/I9/I10, F7).

Reference parity:
- I5 ``bitfinex.match_price_and_fill_exact`` — join unmatched trades to
  "matchable" level3 events on exact (price, fill), opposite side, event
  within [trade_ts, trade_ts + max_delay]; double row_number dedup picks one
  event per trade and one trade per event (reference
  db/bitfinex_schema.sql:501-568; matchable events :127-168).
- I9 ``bitstamp.inferred_trades`` — infer trades by pairing opposite-side
  fill events within a small window with fills equal within tolerance; the
  maker is the event with the OLDER price_microtimestamp; trade price/ts come
  from the maker (reference db/bitstamp_schema.sql:834-984, aggressor rule
  :937, projection :939-958).
- F7 ``bitstamp._get_match_rule`` — confidence code 0-3 (reference
  db/bitstamp_schema.sql:208-227).

Deviation, documented: the reference breaks row_number ties arbitrarily
(plain ``order by microtimestamp``); we add (order_id, event_no) /
(exchange_trade_id) tie-breaks so Spark and DuckDB pick the same winner.
The reference's in-place UPDATEs become recompute-and-return DataFrames
(silver-table overwrite at scale).

Scale: both matchers are equi-joins on (pair, era, price/fill) plus a time
window — shuffle on bounded keys; the dedup windows partition on trade/event
ids. No quadratic stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def match_rule(trade_amount: Column, trade_price: Column, event_amount: Column,
               event_fill: Column, is_deleted_event: Column, tolerance: Column) -> Column:
    """F7: 0 exact fill; 1 within tolerance; 2 fill unknown; 3 deleted event
    with zero fill but matching amount (exchange bug); NULL otherwise."""
    return (
        F.when(trade_amount == event_fill, 0)
        .when(F.abs(trade_amount * trade_price - event_fill * trade_price) < tolerance, 1)
        .when(event_fill.isNull(), 2)
        .when(
            is_deleted_event & (event_fill == 0)
            & (F.abs(trade_amount * trade_price - event_amount * trade_price) < tolerance),
            3,
        )
    ).cast("int")


MATCH_RULE_SQL = """CASE
    WHEN {ta} = {ef} THEN 0
    WHEN abs({ta} * {tp} - {ef} * {tp}) < {tol} THEN 1
    WHEN {ef} IS NULL THEN 2
    WHEN {deleted} AND {ef} = 0 AND abs({ta} * {tp} - {ea} * {tp}) < {tol} THEN 3
END"""


def match_price_and_fill_exact(l3: DataFrame, trades: DataFrame,
                               max_delay_s: int = 1) -> DataFrame:
    """I5: link unlinked trades to the level3 event that produced them.

    ``trades`` columns: (pair_id, era, trade_microtimestamp, price, fill,
    origination, exchange_trade_id) — i.e. matches with event links stripped.
    Returns one row per recovered link."""
    ev = l3.filter(F.col("fill") > 0).select(
        "pair_id", "era", "microtimestamp", "order_id", "event_no",
        "side", "price", "fill",
    )
    j = ev.join(
        trades,
        ["pair_id", "era", "price", "fill"],
    ).filter(
        (F.col("side") != F.col("origination"))
        & (F.col("microtimestamp") >= F.col("trade_microtimestamp"))
        & (F.col("microtimestamp")
           <= F.col("trade_microtimestamp") + F.expr(f"INTERVAL {max_delay_s} SECOND"))
    )
    w_trade = W.partitionBy("pair_id", "exchange_trade_id").orderBy(
        "microtimestamp", "order_id", "event_no")
    w_event = W.partitionBy("pair_id", "order_id", "event_no").orderBy(
        "trade_microtimestamp", "exchange_trade_id")
    return (
        j.withColumn("r", F.row_number().over(w_trade))
        .withColumn("r_l3", F.row_number().over(w_event))
        .filter((F.col("r") == 1) & (F.col("r_l3") == 1))
        .select(
            "pair_id", "exchange_trade_id",
            F.col("trade_microtimestamp"),
            F.col("microtimestamp").alias("event_microtimestamp"),
            "order_id", "event_no", "side", "price", "fill",
        )
    )


def match_fill_exact_oracle_sql(max_delay_s: int = 1) -> str:
    return f"""
WITH ev AS (
    SELECT pair_id, era, microtimestamp, order_id, event_no, side, price, fill
    FROM level3 WHERE fill > 0
), trades AS (
    SELECT pair_id, era, microtimestamp AS trade_microtimestamp, price,
           amount AS fill, side AS origination, exchange_trade_id
    FROM matches
), j AS (
    SELECT ev.*, trades.trade_microtimestamp, trades.exchange_trade_id,
           row_number() OVER (PARTITION BY ev.pair_id, trades.exchange_trade_id
                              ORDER BY ev.microtimestamp, ev.order_id, ev.event_no) AS r,
           row_number() OVER (PARTITION BY ev.pair_id, ev.order_id, ev.event_no
                              ORDER BY trades.trade_microtimestamp, trades.exchange_trade_id) AS r_l3
    FROM ev JOIN trades
      ON ev.pair_id = trades.pair_id AND ev.era = trades.era
     AND ev.price = trades.price AND ev.fill = trades.fill
     AND ev.side <> trades.origination
     AND ev.microtimestamp >= trades.trade_microtimestamp
     AND ev.microtimestamp <= trades.trade_microtimestamp + INTERVAL {max_delay_s} SECOND
)
SELECT pair_id, exchange_trade_id, trade_microtimestamp,
       microtimestamp AS event_microtimestamp,
       order_id, event_no, side, price, fill
FROM j WHERE r = 1 AND r_l3 = 1
"""


def match_sum_of_fills(l3: DataFrame, trades: DataFrame,
                       max_delay_s: int = 1, max_group_size: int = 3) -> DataFrame:
    """I6 ``_matches_matchable_sets`` + ``match_price_and_sum_of_fill_exact``:
    match a single book event to the SUM of fills of several adjacent
    unmatched trades (reference db/bitfinex_schema.sql:177-234,577-646).

    Sets = maximal runs of adjacent unmatched trades sharing (price, side)
    (gaps-and-islands); candidate groups = 2..max_group_size consecutive
    trades of a set (the reference enumerates arbitrary subsets via a
    recursive CTE; consecutive runs are the deterministic, shuffle-friendly
    subset — a documented simplification); a group matches an event with
    fill == group sum, same price, opposite side, within
    [first_trade_ts, first_trade_ts + max_delay]; one group per event and no
    trade reuse via greedy row_number + anti-join.
    """
    w_seq = W.partitionBy("pair_id", "era").orderBy("trade_microtimestamp",
                                                    "exchange_trade_id")
    t = trades.withColumn(
        "_new_set",
        F.when(
            (F.lag("price").over(w_seq) != F.col("price"))
            | (F.lag("origination").over(w_seq) != F.col("origination"))
            | F.lag("price").over(w_seq).isNull(),
            1,
        ).otherwise(0),
    ).withColumn(
        "set_id",
        F.sum("_new_set").over(w_seq.rowsBetween(W.unboundedPreceding, W.currentRow)),
    ).withColumn(
        "pos", F.row_number().over(W.partitionBy("pair_id", "era", "set_id")
                                   .orderBy("trade_microtimestamp", "exchange_trade_id")),
    )
    # consecutive runs of length 2..max_group_size via cumulative sums
    w_set = W.partitionBy("pair_id", "era", "set_id").orderBy("pos")
    t = t.withColumn(
        "cum_fill",
        F.sum("fill").over(w_set.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    a = t.select("pair_id", "era", "set_id", "price", "origination",
                 F.col("pos").alias("pos_a"), F.col("cum_fill").alias("cum_a"),
                 F.col("trade_microtimestamp").alias("ts_a"),
                 F.col("exchange_trade_id").alias("trade_a"))
    b = t.select("pair_id", "era", "set_id",
                 F.col("pos").alias("pos_b"), F.col("cum_fill").alias("cum_b"),
                 F.col("exchange_trade_id").alias("trade_b"))
    groups = (
        a.join(b, ["pair_id", "era", "set_id"])
        .filter((F.col("pos_b") > F.col("pos_a"))
                & (F.col("pos_b") - F.col("pos_a") < max_group_size))
        .select(
            "pair_id", "era", "price", "origination",
            (F.col("cum_b") - F.col("cum_a") + F.lit(0.0)).alias("_pad"),
            (F.col("cum_b") - F.col("cum_a")).alias("group_fill_wo_first"),
            "set_id", "pos_a", "pos_b", "ts_a", "trade_a", "trade_b",
        )
        .drop("_pad")
    )
    # group = trades at positions pos_a..pos_b inclusive → sum = cum_b −
    # cum_(a−1) = (cum_b − cum_a) + fill_a; re-join fill_a
    fa = t.select("pair_id", "era", "set_id", F.col("pos").alias("pos_a"),
                  F.col("fill").alias("fill_a"))
    groups = groups.join(fa, ["pair_id", "era", "set_id", "pos_a"]).withColumn(
        "group_fill", F.col("group_fill_wo_first") + F.col("fill_a"))

    ev = l3.filter(F.col("fill") > 0).select(
        "pair_id", "era", "microtimestamp", "order_id", "event_no",
        "side", F.col("price").alias("ev_price"), F.col("fill").alias("ev_fill"),
    )
    j = groups.join(ev, ["pair_id", "era"]).filter(
        (F.col("ev_price") == F.col("price"))
        & (F.col("ev_fill") == F.col("group_fill"))
        & (F.col("side") != F.col("origination"))
        & (F.col("microtimestamp") >= F.col("ts_a"))
        & (F.col("microtimestamp")
           <= F.col("ts_a") + F.expr(f"INTERVAL {max_delay_s} SECOND"))
    )
    w_ev = W.partitionBy("pair_id", "order_id", "event_no").orderBy(
        "ts_a", "pos_a", "pos_b")
    picked = j.withColumn("r", F.row_number().over(w_ev)).filter("r = 1")
    # no trade reuse: keep the earliest-selected group touching each trade
    w_tr = W.partitionBy("pair_id", "era", "set_id").orderBy("ts_a", "pos_a", "pos_b")
    picked = picked.withColumn("rg", F.row_number().over(w_tr)).filter("rg = 1")
    return picked.select(
        "pair_id", "microtimestamp", "order_id", "event_no", "side",
        "price", F.col("group_fill").alias("fill"),
        (F.col("pos_b") - F.col("pos_a") + 1).alias("group_size"),
        "trade_a", "trade_b",
    )


def inferred_trades(l3: DataFrame, max_delay_us: int = 500_000,
                    tolerance: float = 1e-9) -> DataFrame:
    """I9: pair opposite-side fill events into inferred trades. The maker is
    the side with the older price_microtimestamp (tie → the bid, a
    deterministic refinement); trade price/microtimestamp come from the
    maker; the trade direction is the taker's side."""
    f = l3.filter(F.col("fill") > 0)
    b = f.filter(F.col("side") == "b").select(
        "pair_id", "era",
        F.col("microtimestamp").alias("b_ts"), F.col("order_id").alias("b_oid"),
        F.col("event_no").alias("b_eno"), F.col("price").alias("b_price"),
        F.col("fill").alias("b_fill"),
        F.col("price_microtimestamp").alias("b_pts"),
    )
    s = f.filter(F.col("side") == "s").select(
        "pair_id", "era",
        F.col("microtimestamp").alias("s_ts"), F.col("order_id").alias("s_oid"),
        F.col("event_no").alias("s_eno"), F.col("price").alias("s_price"),
        F.col("fill").alias("s_fill"),
        F.col("price_microtimestamp").alias("s_pts"),
    )
    # time-bucketed equi-join: |b_ts − s_ts| <= delay implies the two events'
    # delay-sized buckets are equal or adjacent, so exploding the buy side
    # into (k−1, k, k+1) turns the interval predicate into an equi-join —
    # without this, joining on (pair, era) alone is a per-group cross product
    # (the 100 TB killer; observed 20x slowdown already at sf0.1)
    bk_b = F.expr(f"unix_micros(b_ts) div {max_delay_us}")
    bk_s = F.expr(f"unix_micros(s_ts) div {max_delay_us}")
    b_bucketed = b.withColumn("_bk", F.explode(F.array(bk_b - 1, bk_b, bk_b + 1)))
    s_bucketed = s.withColumn("_bk", bk_s)
    cand = b_bucketed.join(s_bucketed, ["pair_id", "era", "_bk"]).drop("_bk").filter(
        (F.abs(F.unix_micros("b_ts") - F.unix_micros("s_ts")) <= max_delay_us)
        & (F.abs(F.col("b_fill") - F.col("s_fill")) <= tolerance)
    )
    w_b = W.partitionBy("pair_id", "b_oid", "b_eno", "b_ts").orderBy(
        F.abs(F.unix_micros("b_ts") - F.unix_micros("s_ts")), "s_oid", "s_eno", "s_ts")
    w_s = W.partitionBy("pair_id", "s_oid", "s_eno", "s_ts").orderBy(
        F.abs(F.unix_micros("b_ts") - F.unix_micros("s_ts")), "b_oid", "b_eno", "b_ts")
    picked = (
        cand.withColumn("rb", F.row_number().over(w_b))
        .withColumn("rs", F.row_number().over(w_s))
        .filter((F.col("rb") == 1) & (F.col("rs") == 1))
    )
    maker_is_bid = F.col("b_pts") <= F.col("s_pts")
    return picked.select(
        "pair_id",
        F.when(maker_is_bid, F.col("b_ts")).otherwise(F.col("s_ts")).alias("microtimestamp"),
        F.when(maker_is_bid, F.col("b_price")).otherwise(F.col("s_price")).alias("price"),
        F.col("b_fill").alias("amount"),
        # direction = the taker's side
        F.when(maker_is_bid, "s").otherwise("b").alias("side"),
        F.col("b_oid").alias("buy_order_id"), F.col("b_eno").alias("buy_event_no"),
        F.col("s_oid").alias("sell_order_id"), F.col("s_eno").alias("sell_event_no"),
    )


def inferred_trades_oracle_sql(max_delay_us: int = 500_000,
                               tolerance: float = 1e-9) -> str:
    return f"""
WITH f AS (
    SELECT * FROM level3 WHERE fill > 0
), b AS (
    SELECT pair_id, era, microtimestamp AS b_ts, order_id AS b_oid,
           event_no AS b_eno, price AS b_price, fill AS b_fill,
           price_microtimestamp AS b_pts
    FROM f WHERE side = 'b'
), s AS (
    SELECT pair_id, era, microtimestamp AS s_ts, order_id AS s_oid,
           event_no AS s_eno, price AS s_price, fill AS s_fill,
           price_microtimestamp AS s_pts
    FROM f WHERE side = 's'
), cand AS (
    SELECT b.*, s.s_ts, s.s_oid, s.s_eno, s.s_price, s.s_fill, s.s_pts
    FROM b JOIN s ON b.pair_id = s.pair_id AND b.era = s.era
    WHERE abs(epoch_us(b_ts) - epoch_us(s_ts)) <= {max_delay_us}
      AND abs(b_fill - s_fill) <= {tolerance}
), picked AS (
    SELECT *,
           row_number() OVER (PARTITION BY pair_id, b_oid, b_eno, b_ts
                              ORDER BY abs(epoch_us(b_ts) - epoch_us(s_ts)), s_oid, s_eno, s_ts) AS rb,
           row_number() OVER (PARTITION BY pair_id, s_oid, s_eno, s_ts
                              ORDER BY abs(epoch_us(b_ts) - epoch_us(s_ts)), b_oid, b_eno, b_ts) AS rs
    FROM cand
)
SELECT pair_id,
       CASE WHEN b_pts <= s_pts THEN b_ts ELSE s_ts END AS microtimestamp,
       CASE WHEN b_pts <= s_pts THEN b_price ELSE s_price END AS price,
       b_fill AS amount,
       CASE WHEN b_pts <= s_pts THEN 's' ELSE 'b' END AS side,
       b_oid AS buy_order_id, b_eno AS buy_event_no,
       s_oid AS sell_order_id, s_eno AS sell_event_no
FROM picked WHERE rb = 1 AND rs = 1
"""
