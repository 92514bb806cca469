"""Closed-loop matcher test: strip the event links from matches, re-match
against level3, and verify the recovered links equal the originals wherever
the trade's (price, fill, side, episode) signature is unambiguous."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from obadiah_spark.operators.matching import match_price_and_fill_exact  # noqa: E402


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
