"""Closed-loop matcher test: strip the event links from matches, re-match
against level3, and verify the recovered links equal the originals wherever
the trade's (price, fill, side, episode) signature is unambiguous."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from obadiah_spark.operators.matching import (  # noqa: E402
    match_price_and_fill_exact,
    match_sum_of_fills,
)


def test_match_fill_exact_recovers_links(spark, level3):
    matches = spark.table("matches")
    trades = matches.select(
        "pair_id", "era",
        F.col("microtimestamp").alias("trade_microtimestamp"),
        "price", F.col("amount").alias("fill"),
        F.col("side").alias("origination"), "exchange_trade_id",
    )
    rec = match_price_and_fill_exact(level3, trades)

    # original maker link per trade (matches carry exactly one linked side)
    orig = matches.select(
        "exchange_trade_id", "pair_id",
        F.coalesce("buy_order_id", "sell_order_id").alias("orig_order_id"),
        F.coalesce("buy_event_no", "sell_event_no").alias("orig_event_no"),
        "microtimestamp", "price", F.col("amount").alias("fill"), "side",
    )
    # trades whose signature is unique within their episode cannot be confused
    w = F.count(F.lit(1)).over(
        __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
            "pair_id", "microtimestamp", "price", "fill", "side"))
    unambiguous = orig.withColumn("_n", w).filter("_n = 1").drop("_n")

    j = unambiguous.join(rec, ["pair_id", "exchange_trade_id"], "inner")
    n_unamb = unambiguous.count()
    n_joined = j.count()
    assert n_joined == n_unamb, f"unambiguous trades not all matched: {n_joined}/{n_unamb}"
    wrong = j.filter(
        (F.col("orig_order_id") != F.col("order_id"))
        | (F.col("orig_event_no") != F.col("event_no"))
    )
    assert wrong.count() == 0

    # global sanity: every trade matched at most once, decent coverage
    total = matches.count()
    recovered = rec.count()
    assert rec.groupBy("pair_id", "exchange_trade_id").count().filter("count > 1").count() == 0
    assert recovered >= 0.7 * total, f"low recovery: {recovered}/{total}"


def test_match_sum_of_fills_recovers_non_consecutive_subset(spark):
    """An event whose fill equals the sum of a NON-consecutive subset of a
    set ({1st, 3rd} of three adjacent same-price trades) must be matched —
    the reference's recursive CTE enumerates arbitrary increasing subsets
    (db/bitfinex_schema.sql:202-214), not just consecutive runs."""
    import datetime as dt

    base = dt.datetime(2024, 1, 10, 12, 0, 0)
    era = dt.datetime(2024, 1, 8)
    us = dt.timedelta(microseconds=1)
    trades = spark.createDataFrame(
        [
            # set of three adjacent sells at 100.0: fills 1.0, 9.0, 2.0
            (1, era, base + 0 * us, 100.0, 1.0, "s", 101),
            (1, era, base + 1 * us, 100.0, 9.0, "s", 102),
            (1, era, base + 2 * us, 100.0, 2.0, "s", 103),
        ],
        "pair_id int, era timestamp, trade_microtimestamp timestamp, "
        "price double, fill double, origination string, exchange_trade_id bigint",
    )
    # one buy event with fill 3.0 = 1.0 + 2.0 (trades 101 + 103, skipping 102)
    l3 = spark.createDataFrame(
        [(1, era, base + 10 * us, 7, 1, "b", 100.0, 5.0, 3.0)],
        "pair_id int, era timestamp, microtimestamp timestamp, order_id bigint, "
        "event_no int, side string, price double, amount double, fill double",
    )
    out = match_sum_of_fills(l3, trades).orderBy("exchange_trade_id").collect()
    assert [r.exchange_trade_id for r in out] == [101, 103]
    assert all(r.order_id == 7 and r.group_size == 2 for r in out)


def test_match_sequential_period_split_equals_unsplit(spark, level3):
    """The period-parallel neighbor lookup (gpos equi-join) must reproduce
    the per-era lead window exactly — including with a period length short
    enough that many period boundaries fall inside each era."""
    from obadiah_spark.operators.matching import inferred_trades, match_sequential

    t = inferred_trades(level3).select(
        "pair_id",
        F.date_trunc("week", "microtimestamp").alias("era"),
        (F.col("buy_order_id").cast("bigint") * 1000000000000
         + F.col("buy_event_no").cast("bigint") * 100000000
         + F.col("sell_order_id").cast("bigint") * 10000
         + F.col("sell_event_no").cast("bigint")).alias("exchange_trade_id"),
        F.col("microtimestamp").alias("trade_microtimestamp"),
        "amount", "price",
        F.col("side").alias("trade_type"),
        "buy_order_id", "sell_order_id",
    )
    cols = ["pair_id", "exchange_trade_id", "buy_microtimestamp",
            "buy_event_no", "sell_microtimestamp", "sell_event_no"]
    for offset in (1, 2):
        unsplit = match_sequential(level3, t, offset=offset, period_s=None)
        split = match_sequential(level3, t, offset=offset, period_s=3600)
        a = sorted(map(tuple, unsplit.select(*cols).collect()))
        b = sorted(map(tuple, split.select(*cols).collect()))
        assert a == b, f"period split diverges at offset={offset}"
