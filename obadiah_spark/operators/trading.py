"""Trading analytics (SURVEY §2.6) — sequential algorithms per (pair, era).

Reference parity:
- T1 ``trading_period`` — effective bid/ask for executing volume v: walk book
  levels accumulating until v is filled, volume-weighted price; v=0 → best
  prices; v=∞ → whole-book VWAP; NaN when depth is insufficient; emit only on
  change (reference src/base.h:288-349 ``GetBidAskSpread``, episode loop
  :351-407; C SRF db/c/obadiah_db/obadiah_db.cpp:495-594).
- T2 ``trading_strategy`` — greedy discovery of alternating long/short
  positions maximizing profit net of commission 2φ and per-second interest ρ
  (reference src/position_discovery.cpp:28-241; returns/rate computed as in
  db/c/obadiah_db/obadiah_db.cpp:818-832).
- T3 ``epsilon_drawupdowns`` — ε-draw decomposition: extend a draw while
  monotone, close when the reversal from the turning point exceeds ε
  (reference src/epsilon_drawupdowns.cpp:32-89).

Spark-first: each is O(n) per (pair, exchange, era) — the reference's own
parallelization axis — run as one ``applyInPandas`` fold (same shuffle as the
book fold; chains of these operators stay within one shuffle). The state
machines are faithful ports of the C++ (cited above), operating on int64-µs
timestamps (exact) with seconds only inside interest terms.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from obadiah_spark.fold import EpisodeFolder, ordered_fold, stream_fold

_NAN = float("nan")

TRADING_PERIOD_SCHEMA = (
    "pair_id int, era timestamp, microtimestamp timestamp, "
    "bid_price double, ask_price double"
)

POSITIONS_SCHEMA = (
    "pair_id int, era timestamp, opened_at timestamp, open_price double, "
    "closed_at timestamp, close_price double, bps_return double, "
    "rate double, log_return double"
)

DRAWS_SCHEMA = (
    "pair_id int, era timestamp, draw_start timestamp, start_price double, "
    "draw_end timestamp, end_price double, draw_type string, "
    "bps_return double, log_return double"
)


def _effective_price(levels: dict, side: str, volume: float) -> float:
    """GetBidAskSpread for one side (reference src/base.h:288-349): bids walk
    from the highest price down, asks from the lowest up."""
    items = sorted(
        ((p, q) for (s, p), q in levels.items() if s == side),
        reverse=(side == "b"),
    )
    if not items:
        return _NAN
    if volume == 0:
        return items[0][0]
    v = 0.0
    acc = 0.0
    for p, q in items:
        if v + q >= volume:
            acc += (volume - v) * p
            v = volume
            break
        acc += p * q
        v += q
    if v >= volume or math.isinf(volume):
        return acc / v
    return _NAN


def _pair_eq(a: float, b: float) -> bool:
    return (math.isnan(a) and math.isnan(b)) or a == b


def effective_spread_at(l3: DataFrame, at: str,
                        volume: float = 0.0) -> DataFrame:
    """Single-instant effective bid/ask for executing ``volume`` — the
    relational form of :func:`_effective_price` over the book state AT
    ``at`` (closed): bids walk from the highest price down, asks from the
    lowest up, VWAP over the first ``volume`` units (reference
    src/base.h:288-349). Supplies the starting row of the range overload.

    One row per (pair, era-containing-at) that has ANY event at or before
    ``at`` — a pair whose book is empty at the instant still has a
    prevailing (NULL, NULL) state, mirroring the fold's emit semantics
    after the book empties."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from obadiah_spark.operators.order_book import live_at

    at_c = F.lit(at).cast("timestamp")
    # pairs with a defined prevailing state: era containing `at` has events
    w_pair = W.partitionBy("pair_id", "exchange_id")
    base = (
        l3.filter(F.col("era") <= at_c)
        .withColumn("_cur", F.max("era").over(w_pair))
        .filter((F.col("era") == F.col("_cur"))
                & (F.col("microtimestamp") <= at_c))
        .select("pair_id", "era").distinct()
    )
    lvl = (
        live_at(l3, at, before=False)
        .groupBy("pair_id", "era", "side", "price")
        .agg(F.sum("amount").alias("qty"))
        .filter(F.col("qty") > 0)
    )
    if volume == 0:
        eff = lvl.groupBy("pair_id", "era").agg(
            F.max(F.when(F.col("side") == "b", F.col("price")))
            .alias("bid_price"),
            F.min(F.when(F.col("side") == "s", F.col("price")))
            .alias("ask_price"),
        )
    else:
        # price-ordered walk per side, FLOAT-FAITHFUL to the folder's
        # sequential loop: _prev is the exclusive running sum (the loop's
        # `v` before this level — NOT `_cum - qty`, whose float value can
        # differ and flip the fillability test at the boundary), `_take`
        # mirrors `min(q, volume - v)`, the accumulator is a sequential
        # running sum (post-fill takes are exact 0.0, so trailing rows
        # leave it unchanged), fillability is `v + q >= volume` on the
        # last contributing row, and the VWAP divides by exactly
        # ``volume`` (the loop pins v = volume on fill)
        order_expr = (F.when(F.col("side") == "b", -F.col("price"))
                      .otherwise(F.col("price")))
        w_run = (W.partitionBy("pair_id", "era", "side").orderBy(order_expr)
                 .rowsBetween(W.unboundedPreceding, W.currentRow))
        w_prev = (W.partitionBy("pair_id", "era", "side").orderBy(order_expr)
                  .rowsBetween(W.unboundedPreceding, -1))
        walked = (
            lvl.withColumn(
                "_prev", F.coalesce(F.sum("qty").over(w_prev), F.lit(0.0)))
            .withColumn(
                "_take",
                F.when(F.col("_prev") < volume,
                       F.least(F.col("qty"), F.lit(volume) - F.col("_prev")))
                .otherwise(F.lit(0.0)))
            .withColumn("_acc", F.sum(F.col("_take") * F.col("price"))
                        .over(w_run))
            .withColumn("_filled",
                        F.col("_prev") + F.col("qty") >= F.lit(volume))
        )
        per_side = (
            walked.groupBy("pair_id", "era", "side")
            .agg(F.max_by(F.col("_acc"), F.struct(
                F.col("_prev"), F.col("qty"))).alias("_acc_last"),
                 F.max("_filled").alias("_fillable"))
            .withColumn(
                "_eff",
                F.when(F.col("_fillable"),
                       F.col("_acc_last") / F.lit(volume)))
        )
        eff = per_side.groupBy("pair_id", "era").agg(
            F.max(F.when(F.col("side") == "b", F.col("_eff")))
            .alias("bid_price"),
            F.max(F.when(F.col("side") == "s", F.col("_eff")))
            .alias("ask_price"),
        )
    return (
        base.join(eff, ["pair_id", "era"], "left")
        .select("pair_id", "era", at_c.alias("microtimestamp"),
                "bid_price", "ask_price")
    )


def trading_period_fold(l3: DataFrame, volume: float = 0.0,
                        period_s: int | None = 86400,
                        frequency_s: int | None = None,
                        start: str | None = None,
                        end: str | None = None) -> DataFrame:
    """T1: effective bid/ask stream for executing ``volume``, emit-on-change.

    At volume=0 this equals the best-price projection of the spread fold —
    that identity is the operator's differential oracle.

    ``period_s`` splits each era into seeded periods (fold.period_fold):
    parallelism = #periods, not #eras. The emit-on-change state is restored
    from the seeded book (after any emission the prevailing pair always
    equals the book-derived effective prices, so recomputing them from the
    seed reproduces the unsplit dedup exactly).

    ``frequency_s`` is the reference's ``p_frequency`` grid
    (db/get_schema.sql:729 — the C CalculateTradingPeriod consumes the
    level1 stream sampled at that interval): the event log is resampled
    onto the closed-right ceiling grid (depth.grid_sample_l3), so the
    effective-price stream changes at most once per grid interval.

    ``start``/``end`` (both or neither) are p_start_time/p_end_time
    (get_schema.sql:729): the prevailing effective-price row AT ``start``
    (:func:`effective_spread_at`) plus emit-on-change rows in
    ``(start, end]`` from PRUNED period folding — O(range), not
    O(history); same convention as depth_summary_fold."""
    if (start is None) != (end is None):
        raise ValueError("start and end come together")
    if start is not None and period_s is None:
        raise ValueError("the range overload requires period_s")
    if frequency_s is not None:
        from obadiah_spark.operators.depth import grid_sample_l3

        l3 = grid_sample_l3(l3, frequency_s)

    class _TradingPeriodFolder(EpisodeFolder):
        OUT_COLS = ("pair_id", "era", "microtimestamp", "bid_price", "ask_price")

        def __init__(self, meta: pd.Series) -> None:
            super().__init__(meta)
            self._prev_b = self._prev_a = None

        def _price(self, side: str) -> float:
            if volume == 0:
                # incremental best lookup (O(log levels), no level scan)
                p = self.book.best(side)[0]
                return _NAN if p is None else p
            return _effective_price(self.book.levels, side, volume)

        def on_seed(self) -> None:
            self.changed_levels()
            self._prev_b = self._price("b")
            self._prev_a = self._price("s")

        def on_episode(self, ts) -> None:
            # drain the unread change-tracking set (memory bound — see
            # fold._SpreadFolder.on_episode)
            self.book.touched.clear()
            b = self._price("b")
            a = self._price("s")
            if self._prev_b is None and math.isnan(b) and math.isnan(a):
                return  # leading empty book emits nothing
            if self._prev_b is None or not (
                _pair_eq(b, self._prev_b) and _pair_eq(a, self._prev_a)
            ):
                out = self.out
                out["pair_id"].append(self.pair_id)
                out["era"].append(self.era)
                out["microtimestamp"].append(ts)
                out["bid_price"].append(None if math.isnan(b) else b)
                out["ask_price"].append(None if math.isnan(a) else a)
                self._prev_b, self._prev_a = b, a

    cols = ["pair_id", "exchange_id", "era", "microtimestamp", "order_id",
            "event_no", "side", "price", "amount", "chain_state"]
    if start is not None:
        from obadiah_spark.fold import period_fold

        folded = period_fold(l3, _TradingPeriodFolder, TRADING_PERIOD_SCHEMA,
                             frequency_s=period_s, start=start, end=end)
        return effective_spread_at(l3, start, volume).unionByName(folded)
    if period_s is not None:
        from obadiah_spark.fold import period_fold

        return period_fold(l3, _TradingPeriodFolder, TRADING_PERIOD_SCHEMA,
                           frequency_s=period_s)
    return stream_fold(l3.select(*cols), _TradingPeriodFolder, TRADING_PERIOD_SCHEMA)


# faithful port of src/position_discovery.cpp:28-241 (InstantPrice = (price,
# t_us); Interest = rho * |Δt| seconds; Commission = 2*phi). Price DELTAS are
# LOG-RETURNS: the reference's InstantPrice::operator- returns
# log(p) − log(e.p) (src/base.h:151), so phi/rho/epsilon are log-return
# units — phi=0.001 means 10 bps commission per leg, not $0.001.
def _ld(p1: float, p2: float) -> float:
    """InstantPrice difference: log(p1) − log(p2) (reference src/base.h:151)."""
    return math.log(p1) - math.log(p2)


def _discover_positions(ts_us: np.ndarray, bids: np.ndarray, asks: np.ndarray,
                        phi: float, rho: float) -> list[tuple]:
    rho = max(rho, 0.0)
    phi = max(phi, 0.0)
    comm = 2.0 * phi

    def interest(t1: int, t2: int) -> float:
        return rho * abs(t2 - t1) / 1e6

    n = len(ts_us)
    start = None
    for i in range(n):
        b, a = bids[i], asks[i]
        if not (math.isnan(a) or math.isnan(b)) and not (b > a):
            sl = (a, ts_us[i])  # start-long candidate opens at ask
            ss = (b, ts_us[i])  # start-short candidate opens at bid
            start = i
            break
    if start is None:
        return []
    el = es = None
    out: list[tuple] = []
    for i in range(start + 1, n):
        b, a = bids[i], asks[i]
        if math.isnan(a) or math.isnan(b) or b > a:
            continue
        t = ts_us[i]
        if el is None and es is None:  # no position discovered yet
            if _ld(b, sl[0]) > interest(sl[1], t) + comm:
                el = (b, t)
                ss = (b, t)
                continue
            if _ld(ss[0], a) > interest(ss[1], t) + comm:
                es = (a, t)
                sl = (a, t)
                continue
            if _ld(a, sl[0]) < interest(sl[1], t):
                sl = (a, t)
            if _ld(ss[0], b) < interest(ss[1], t):
                ss = (b, t)
        elif el is not None:  # long position open
            if _ld(ss[0], b) < interest(ss[1], t):
                ss = (b, t)
            if _ld(b, el[0]) > interest(el[1], t):
                el = (b, t)  # extend long; short can start only at long's end
                ss = (b, t)
            else:
                if _ld(ss[0], a) > interest(ss[1], t) + comm:
                    out.append((sl, el))
                    es = (a, t)
                    sl = (a, t)
                    el = None
                elif interest(el[1], t) > comm - _ld(el[0], a):
                    # close long; a new long may start profitably from here
                    out.append((sl, el))
                    sl = (a, t)
                    el = None
        else:  # short position open
            if _ld(a, sl[0]) < interest(sl[1], t):
                sl = (a, t)
            if _ld(es[0], a) > interest(es[1], t):
                es = (a, t)
                sl = (a, t)
            else:
                if _ld(b, sl[0]) > interest(sl[1], t) + comm:
                    out.append((ss, es))
                    el = (b, t)
                    ss = (b, t)
                    es = None
                elif interest(es[1], t) > comm - _ld(b, es[0]):
                    out.append((ss, es))
                    ss = (b, t)
                    es = None
    if el is not None:
        out.append((sl, el))
    elif es is not None:
        out.append((ss, es))
    return out


def _position_row(s: tuple, e: tuple) -> tuple:
    """Return columns as the reference C SRF computes them
    (db/c/obadiah_db/obadiah_db.cpp:818-832)."""
    sp, st = s
    ep, et = e
    bps = (sp - ep) / sp * 10000 if sp > ep else (ep - sp) / sp * 10000
    log_ret = abs(math.log(sp) - math.log(ep))
    dur_s = (et - st) / 1e6
    rate = math.exp(log_ret / dur_s) - 1 if dur_s > 0 else float("inf")
    return st, sp, et, ep, bps, rate, log_ret


def trading_strategy(tp: DataFrame, phi: float = 0.0, rho: float = 0.0) -> DataFrame:
    """T2: positions discovered from a trading-period stream
    (pair_id, era, microtimestamp, bid_price, ask_price)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("microtimestamp", kind="mergesort")
        pair_id = int(pdf["pair_id"].iloc[0]) if len(pdf) else None
        era = pdf["era"].iloc[0] if len(pdf) else None
        ts_us = pdf["microtimestamp"].astype("datetime64[us]").astype("int64").to_numpy()
        bids = pdf["bid_price"].astype("float64").to_numpy()
        asks = pdf["ask_price"].astype("float64").to_numpy()
        rows = []
        for s, e in _discover_positions(ts_us, bids, asks, phi, rho):
            st, sp, et, ep, bps, rate, log_ret = _position_row(s, e)
            rows.append((pair_id, era, pd.Timestamp(st, unit="us"), sp,
                         pd.Timestamp(et, unit="us"), ep, bps, rate, log_ret))
        return pd.DataFrame(rows, columns=[
            "pair_id", "era", "opened_at", "open_price", "closed_at",
            "close_price", "bps_return", "rate", "log_return"])

    return ordered_fold(tp, fn, POSITIONS_SCHEMA, keys=("pair_id", "era"),
                        order=["microtimestamp"])


# faithful port of src/epsilon_drawupdowns.cpp:32-89; epsilon is a
# LOG-RETURN (reference InstantPrice::operator-, src/base.h:151)
def _discover_draws(ts_us: np.ndarray, prices: np.ndarray, epsilon: float) -> list[tuple]:
    n = len(ts_us)
    if n == 0:
        return []
    st = tp = en = (prices[0], ts_us[0])
    out: list[tuple] = []
    for i in range(1, n):
        en = (prices[i], ts_us[i])
        if en[0] == tp[0]:
            continue
        if (tp[0] >= st[0] and en[0] > tp[0]) or (tp[0] <= st[0] and en[0] < tp[0]):
            tp = en  # extend the draw; new turning point
            continue
        if abs(_ld(en[0], tp[0])) > epsilon:
            out.append((st, tp))
            st = tp
    if en[1] > st[1]:
        out.append((st, en))
    return out


def epsilon_drawupdowns(prices: DataFrame, epsilon: float) -> DataFrame:
    """T3: ε-draw decomposition of a (pair_id, era, microtimestamp, price)
    stream (use mid-price from the spread fold)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("microtimestamp", kind="mergesort")
        pdf = pdf[pdf["price"].notna()]
        pair_id = int(pdf["pair_id"].iloc[0]) if len(pdf) else None
        era = pdf["era"].iloc[0] if len(pdf) else None
        ts_us = pdf["microtimestamp"].astype("datetime64[us]").astype("int64").to_numpy()
        ps = pdf["price"].astype("float64").to_numpy()
        rows = []
        for s, e in _discover_draws(ts_us, ps, epsilon):
            sp, st = s
            ep, et = e
            bps = (sp - ep) / sp * 10000 if sp > ep else (ep - sp) / sp * 10000
            log_ret = abs(math.log(sp) - math.log(ep))
            rows.append((pair_id, era, pd.Timestamp(st, unit="us"), sp,
                         pd.Timestamp(et, unit="us"), ep,
                         "up" if ep >= sp else "down", bps, log_ret))
        return pd.DataFrame(rows, columns=[
            "pair_id", "era", "draw_start", "start_price", "draw_end",
            "end_price", "draw_type", "bps_return", "log_return"])

    return ordered_fold(prices, fn, DRAWS_SCHEMA, keys=("pair_id", "era"),
                        order=["microtimestamp"])


# v=0 oracle: best prices, deduped on price change only (qty-only changes in
# the level1 stream do not re-emit a trading-period row)
TRADING_PERIOD_V0_ORACLE_BODY_SUFFIX = """, tp AS (
    SELECT pair_id, era, ts,
           best_bid_price AS bid_price, best_ask_price AS ask_price,
           lag(best_bid_price) OVER w AS pb,
           lag(best_ask_price) OVER w AS pa
    FROM l1_dedup
    WINDOW w AS (PARTITION BY pair_id, era ORDER BY ts)
)
SELECT pair_id, era, ts AS microtimestamp, bid_price, ask_price
FROM tp
WHERE pb IS DISTINCT FROM bid_price OR pa IS DISTINCT FROM ask_price
"""


def trading_period_v0_oracle() -> str:
    from obadiah_spark.operators.depth import SPREAD_L1_CTES

    return f"WITH {SPREAD_L1_CTES}{TRADING_PERIOD_V0_ORACLE_BODY_SUFFIX}"


def trading_period_v0_range_oracle(start: str, end: str) -> str:
    """Range form of the v0 oracle: emitted rows in (start, end] plus the
    last in-era emission at/before start re-stamped to it (independent of
    the engine's live-set starting derivation)."""
    from obadiah_spark.operators.depth import SPREAD_L1_CTES

    return f"""
WITH {SPREAD_L1_CTES}, tp AS (
    SELECT pair_id, era, ts,
           best_bid_price AS bid_price, best_ask_price AS ask_price,
           lag(best_bid_price) OVER w AS pb,
           lag(best_ask_price) OVER w AS pa
    FROM l1_dedup
    WINDOW w AS (PARTITION BY pair_id, era ORDER BY ts)
), fin AS (
    SELECT pair_id, era, ts, bid_price, ask_price
    FROM tp
    WHERE pb IS DISTINCT FROM bid_price OR pa IS DISTINCT FROM ask_price
)
SELECT pair_id, era, ts AS microtimestamp, bid_price, ask_price
FROM fin
WHERE ts > TIMESTAMP '{start}' AND ts <= TIMESTAMP '{end}'
UNION ALL
SELECT f.pair_id, f.era, TIMESTAMP '{start}' AS microtimestamp,
       f.bid_price, f.ask_price
FROM fin f
WHERE f.era = (SELECT max(era) FROM level3 x
               WHERE x.pair_id = f.pair_id AND x.era <= TIMESTAMP '{start}')
  AND f.ts = (SELECT max(g.ts) FROM fin g
              WHERE g.pair_id = f.pair_id AND g.era = f.era
                AND g.ts <= TIMESTAMP '{start}')
"""


# ---------------------------------------------------------- zigzag oracles --
# Closed-form gate oracles for the sequential T2/T3 state machines: on a
# piecewise-monotone price series with phi=rho=0 (T2) / epsilon below the
# smallest move (T3), both algorithms provably emit exactly the consecutive
# extrema pairs of the series (greedy position flips at every local extremum
# when costs are zero; a draw closes at every reversal exceeding epsilon).
# That IS window-expressible, so the full driver hash check applies to the
# ported state machines — on this fabric, any deviation from the C++
# semantics (reference src/position_discovery.cpp:73-241,
# src/epsilon_drawupdowns.cpp:32-89) breaks the hash.

def zigzag_level1(spark) -> DataFrame:
    """Deterministic triangle-wave level1 fabric: MULTI-PAIR (pair_id =
    1 + o_orderkey % 3, so the downstream state machines fold on a real
    per-pair partition axis, VERDICT r4 "what's wrong" #1), one point per
    `orders` row per pair (ordered by o_orderkey), 1 s apart, price =
    100 + triangle(rn % 12) — consecutive prices always differ by exactly
    1, so each pair's series is strictly piecewise-monotone with extrema
    at m=0 and m=6."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    pair = (F.lit(1) + F.col("o_orderkey") % 3).cast("int")
    rn = F.row_number().over(
        Window.partitionBy("pair_id").orderBy("o_orderkey"))
    base = (spark.table("orders").select(pair.alias("pair_id"), "o_orderkey")
            .select("pair_id", rn.alias("rn")))
    m = F.col("rn") % 12
    price = (F.lit(100.0) + F.when(m <= 6, m).otherwise(12 - m)).cast("double")
    t0 = F.unix_micros(F.lit("2024-01-01 00:00:00").cast("timestamp"))
    return base.select(
        "pair_id",
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("era"),
        F.timestamp_micros(t0 + F.col("rn").cast("bigint") * 1_000_000)
        .alias("microtimestamp"),
        price.alias("bid_price"), price.alias("ask_price"),
    )


ZIGZAG_PTS_CTES = """base AS (
    SELECT CAST(1 + o_orderkey % 3 AS INT) AS pair_id,
           row_number() OVER (PARTITION BY 1 + o_orderkey % 3
                              ORDER BY o_orderkey) AS rn
    FROM orders
), pts AS (
    SELECT pair_id, TIMESTAMP '2024-01-01 00:00:00' AS era,
           make_timestamp(epoch_us(TIMESTAMP '2024-01-01 00:00:00')
                          + rn * 1000000) AS ts,
           CAST(100 + CASE WHEN rn % 12 <= 6 THEN rn % 12
                           ELSE 12 - rn % 12 END AS DOUBLE) AS p
    FROM base
), ext AS (
    SELECT * FROM (
        SELECT pair_id, era, ts, p,
               lag(p)  OVER w AS pp,
               lead(p) OVER w AS np
        FROM pts WINDOW w AS (PARTITION BY pair_id ORDER BY ts)) d
    WHERE pp IS NULL OR np IS NULL OR sign(p - pp) <> sign(np - p)
), pairs AS (
    SELECT pair_id, era, ts AS t1, p AS p1,
           lead(ts) OVER w2 AS t2, lead(p) OVER w2 AS p2
    FROM ext WINDOW w2 AS (PARTITION BY pair_id ORDER BY ts)
)"""


def trading_strategy_zigzag_oracle_sql() -> str:
    return f"""
WITH {ZIGZAG_PTS_CTES}
SELECT pair_id, era, t1 AS opened_at, p1 AS open_price,
       t2 AS closed_at, p2 AS close_price,
       CASE WHEN p1 > p2 THEN (p1 - p2) / p1 * 10000
            ELSE (p2 - p1) / p1 * 10000 END AS bps_return,
       exp(abs(ln(p1) - ln(p2))
           / ((epoch_us(t2) - epoch_us(t1)) / 1e6)) - 1 AS rate,
       abs(ln(p1) - ln(p2)) AS log_return
FROM pairs WHERE t2 IS NOT NULL
"""


def epsilon_draws_zigzag_oracle_sql() -> str:
    return f"""
WITH {ZIGZAG_PTS_CTES}
SELECT pair_id, era, t1 AS draw_start, p1 AS start_price,
       t2 AS draw_end, p2 AS end_price,
       CASE WHEN p2 >= p1 THEN 'up' ELSE 'down' END AS draw_type,
       CASE WHEN p1 > p2 THEN (p1 - p2) / p1 * 10000
            ELSE (p2 - p1) / p1 * 10000 END AS bps_return,
       abs(ln(p1) - ln(p2)) AS log_return
FROM pairs WHERE t2 IS NOT NULL
"""


# ------------------------------------------------- real-book mid oracles --
# Full-strength DuckDB oracles for the REAL T2/T3 gate paths (mid-price mode,
# bid == ask == (best_bid+best_ask)/2): the sequential state machines are
# replayed exactly by a recursive CTE that carries one state row per
# (pair_id, era) and advances it one level1 row per iteration.  The state
# transition SQL is a literal transcription of _discover_positions /
# _discover_draws above (themselves ports of reference
# src/position_discovery.cpp:28-241 and src/epsilon_drawupdowns.cpp:32-89),
# specialized to b == a (the `b > a` skip can never fire and the NaN skip
# becomes an upfront filter, since skipped rows change no state).  Emissions
# ride on the state row (e_* columns, NULL when the step emitted nothing);
# trailing open positions/draws are joined on from the final state row.
# Iteration count = max rows per (pair, era) — fine at gate scale (sf0.01);
# this is oracle-side code only, never the Spark plan.

# MATERIALIZED: the recursive replays reference `mid` every iteration —
# without it DuckDB re-derives the whole level1 fabric per step (measured
# minutes → seconds at sf0.01)
_MID_CTE = """mid AS MATERIALIZED (
    SELECT pair_id, era, ts,
           (best_bid_price + best_ask_price) / 2 AS p,
           row_number() OVER (PARTITION BY pair_id, era ORDER BY ts) AS rn
    FROM l1_dedup
    WHERE best_bid_price IS NOT NULL AND best_ask_price IS NOT NULL
)"""


def _mid_range_cte(start: str, end: str) -> str:
    """Range variant of the mid CTE: level1 rows in (start, end] plus the
    last in-era row at/before start re-stamped to it (the prevailing
    spread), then the usual both-sides-set mid projection.

    MATERIALIZED: the recursive replay references ``mid`` on every
    iteration — without materialization DuckDB re-derives the whole
    level1 fabric (and the correlated restamp probe) per step."""
    return f"""mid AS MATERIALIZED (
    SELECT pair_id, era, ts,
           (best_bid_price + best_ask_price) / 2 AS p,
           row_number() OVER (PARTITION BY pair_id, era ORDER BY ts) AS rn
    FROM (
        SELECT pair_id, era, ts, best_bid_price, best_ask_price
        FROM l1_dedup
        WHERE ts > TIMESTAMP '{start}' AND ts <= TIMESTAMP '{end}'
        UNION ALL
        SELECT f.pair_id, f.era, TIMESTAMP '{start}' AS ts,
               f.best_bid_price, f.best_ask_price
        FROM l1_dedup f
        WHERE f.era = (SELECT max(era) FROM level3 x
                       WHERE x.pair_id = f.pair_id
                         AND x.era <= TIMESTAMP '{start}')
          AND f.ts = (SELECT max(g.ts) FROM l1_dedup g
                      WHERE g.pair_id = f.pair_id AND g.era = f.era
                        AND g.ts <= TIMESTAMP '{start}')
    ) u
    WHERE best_bid_price IS NOT NULL AND best_ask_price IS NOT NULL
)"""


def trading_strategy_mid_oracle_sql(phi: float, rho: float = 0.0,
                                    mid_cte: str | None = None) -> str:
    """Recursive-CTE replay of _discover_positions in mid mode.

    ``mid_cte`` substitutes the mid-price source (the range overload
    passes :func:`_mid_range_cte`).

    rho > 0 (VERDICT r8 task #4) adds the per-second interest term
    ``rho * |Δt|`` to every tracker comparison, mirroring the engine
    (reference src/position_discovery.h:36-40) operation-for-operation:
    interest is ``rho * (µs₂ − µs₁) / 1e6`` (multiply before divide, the
    engine's own order), and every price comparison becomes the ln-form
    the engine uses (``_ld``). The rho = 0 branch keeps the original
    direct-comparison text verbatim — ln-form and direct-form agree
    except at ln-rounding ties the gate fabric never produces, and the
    rho = 0 gates are hash-anchored to the original text."""
    from obadiah_spark.operators.depth import SPREAD_L1_CTES

    if rho != 0.0:
        return _trading_strategy_mid_rho_sql(phi, rho, mid_cte)
    comm = repr(2.0 * max(float(phi), 0.0))
    mid = mid_cte if mid_cte is not None else _MID_CTE
    return f"""
WITH RECURSIVE {SPREAD_L1_CTES}, {mid}, step AS (
    SELECT pair_id, era, rn, 0 AS mode,
           p AS sl_p, ts AS sl_t, p AS ss_p, ts AS ss_t,
           CAST(NULL AS DOUBLE) AS ex_p, CAST(NULL AS TIMESTAMP) AS ex_t,
           CAST(NULL AS DOUBLE) AS e_op, CAST(NULL AS TIMESTAMP) AS e_ot,
           CAST(NULL AS DOUBLE) AS e_cp, CAST(NULL AS TIMESTAMP) AS e_ct
    FROM mid WHERE rn = 1
    UNION ALL
    SELECT pair_id, era, mrn,
           CASE WHEN x_ol OR x_cl THEN 1 WHEN x_os OR x_cs THEN 2
                WHEN x_cnl OR x_cns THEN 0 ELSE mode END AS mode,
           -- sl: reset on open-short / close-from-long / es-extend; min-track
           -- in short mode (x_sl1); min-track pre-position; frozen in long
           CASE WHEN x_os OR x_cs OR x_cnl OR x_exts THEN mp
                WHEN mode = 2 THEN x_sl1p
                WHEN mode = 0 AND NOT x_ol AND mp < sl_p THEN mp
                ELSE sl_p END AS sl_p,
           CASE WHEN x_os OR x_cs OR x_cnl OR x_exts THEN mt
                WHEN mode = 2 THEN x_sl1t
                WHEN mode = 0 AND NOT x_ol AND mp < sl_p THEN mt
                ELSE sl_t END AS sl_t,
           -- ss: mirror image
           CASE WHEN x_ol OR x_cl OR x_cns OR x_extl THEN mp
                WHEN mode = 1 THEN x_ss1p
                WHEN mode = 0 AND NOT x_os AND mp > ss_p THEN mp
                ELSE ss_p END AS ss_p,
           CASE WHEN x_ol OR x_cl OR x_cns OR x_extl THEN mt
                WHEN mode = 1 THEN x_ss1t
                WHEN mode = 0 AND NOT x_os AND mp > ss_p THEN mt
                ELSE ss_t END AS ss_t,
           -- ex: the open position's running extreme (el in long, es in short)
           CASE WHEN x_ol OR x_cl OR x_os OR x_cs OR x_extl OR x_exts THEN mp
                WHEN x_cnl OR x_cns THEN CAST(NULL AS DOUBLE)
                ELSE ex_p END AS ex_p,
           CASE WHEN x_ol OR x_cl OR x_os OR x_cs OR x_extl OR x_exts THEN mt
                WHEN x_cnl OR x_cns THEN CAST(NULL AS TIMESTAMP)
                ELSE ex_t END AS ex_t,
           CASE WHEN x_cs OR x_cnl THEN sl_p WHEN x_cl OR x_cns THEN ss_p END AS e_op,
           CASE WHEN x_cs OR x_cnl THEN sl_t WHEN x_cl OR x_cns THEN ss_t END AS e_ot,
           CASE WHEN x_cs OR x_cnl OR x_cl OR x_cns THEN ex_p END AS e_cp,
           CASE WHEN x_cs OR x_cnl OR x_cl OR x_cns THEN ex_t END AS e_ct
    FROM (
        SELECT s.*, m.rn AS mrn, m.p AS mp, m.ts AS mt,
               -- in-step helper updates (short-mode sl min, long-mode ss max)
               CASE WHEN s.mode = 2 AND m.p < s.sl_p THEN m.p ELSE s.sl_p END AS x_sl1p,
               CASE WHEN s.mode = 2 AND m.p < s.sl_p THEN m.ts ELSE s.sl_t END AS x_sl1t,
               CASE WHEN s.mode = 1 AND m.p > s.ss_p THEN m.p ELSE s.ss_p END AS x_ss1p,
               CASE WHEN s.mode = 1 AND m.p > s.ss_p THEN m.ts ELSE s.ss_t END AS x_ss1t,
               -- transition flags (position_discovery.cpp branch conditions)
               (s.mode = 0 AND ln(m.p) - ln(s.sl_p) > {comm}) AS x_ol,
               (s.mode = 0 AND NOT x_ol AND ln(s.ss_p) - ln(m.p) > {comm}) AS x_os,
               (s.mode = 1 AND m.p > s.ex_p) AS x_extl,
               (s.mode = 1 AND NOT x_extl AND ln(x_ss1p) - ln(m.p) > {comm}) AS x_cs,
               (s.mode = 1 AND NOT x_extl AND NOT x_cs
                AND ln(s.ex_p) - ln(m.p) > {comm}) AS x_cnl,
               (s.mode = 2 AND m.p < s.ex_p) AS x_exts,
               (s.mode = 2 AND NOT x_exts AND ln(m.p) - ln(x_sl1p) > {comm}) AS x_cl,
               (s.mode = 2 AND NOT x_exts AND NOT x_cl
                AND ln(m.p) - ln(s.ex_p) > {comm}) AS x_cns
        FROM step s JOIN mid m
          ON m.pair_id = s.pair_id AND m.era = s.era AND m.rn = s.rn + 1
    )
), last_state AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY pair_id, era
                                     ORDER BY rn DESC) AS rr
        FROM step) WHERE rr = 1
), positions AS (
    SELECT pair_id, era, e_op AS op, e_ot AS ot, e_cp AS cp, e_ct AS ct
    FROM step WHERE e_op IS NOT NULL
    UNION ALL
    SELECT pair_id, era,
           CASE WHEN mode = 1 THEN sl_p ELSE ss_p END,
           CASE WHEN mode = 1 THEN sl_t ELSE ss_t END,
           ex_p, ex_t
    FROM last_state WHERE mode <> 0
)
SELECT pair_id, era, ot AS opened_at, op AS open_price,
       ct AS closed_at, cp AS close_price,
       CASE WHEN op > cp THEN (op - cp) / op * 10000
            ELSE (cp - op) / op * 10000 END AS bps_return,
       CASE WHEN epoch_us(ct) > epoch_us(ot)
            THEN exp(abs(ln(op) - ln(cp))
                     / ((epoch_us(ct) - epoch_us(ot)) / 1e6)) - 1
            ELSE CAST('infinity' AS DOUBLE) END AS rate,
       abs(ln(op) - ln(cp)) AS log_return
FROM positions
"""


def _trading_strategy_mid_rho_sql(phi: float, rho: float,
                                  mid_cte: str | None = None) -> str:
    """The interest-bearing replay (rho > 0): same state machine as the
    rho = 0 template, with ``i_sl`` / ``i_ss`` / ``i_ex`` interest columns
    (rho * elapsed seconds since each tracker's timestamp) entering every
    engine comparison exactly as src/position_discovery.cpp:28-241 does —
    tracked extremes now DECAY (a tracker re-anchors when the log-move
    since it fails to outrun interest), extensions and closes race the
    accrued interest, and the close-no-reopen branches fire when interest
    alone exceeds what commission leaves of the retracement."""
    from obadiah_spark.operators.depth import SPREAD_L1_CTES

    comm = repr(2.0 * max(float(phi), 0.0))
    r = repr(max(float(rho), 0.0))
    mid = mid_cte if mid_cte is not None else _MID_CTE
    return f"""
WITH RECURSIVE {SPREAD_L1_CTES}, {mid}, step AS (
    SELECT pair_id, era, rn, 0 AS mode,
           p AS sl_p, ts AS sl_t, p AS ss_p, ts AS ss_t,
           CAST(NULL AS DOUBLE) AS ex_p, CAST(NULL AS TIMESTAMP) AS ex_t,
           CAST(NULL AS DOUBLE) AS e_op, CAST(NULL AS TIMESTAMP) AS e_ot,
           CAST(NULL AS DOUBLE) AS e_cp, CAST(NULL AS TIMESTAMP) AS e_ct
    FROM mid WHERE rn = 1
    UNION ALL
    SELECT pair_id, era, mrn,
           CASE WHEN x_ol OR x_cl THEN 1 WHEN x_os OR x_cs THEN 2
                WHEN x_cnl OR x_cns THEN 0 ELSE mode END AS mode,
           -- sl: reset on open-short / close-from-long / es-extend;
           -- interest-decayed min-track in short mode (x_sl1) and
           -- pre-position; frozen in long
           CASE WHEN x_os OR x_cs OR x_cnl OR x_exts THEN mp
                WHEN mode = 2 THEN x_sl1p
                WHEN mode = 0 AND NOT x_ol AND ln(mp) - ln(sl_p) < i_sl THEN mp
                ELSE sl_p END AS sl_p,
           CASE WHEN x_os OR x_cs OR x_cnl OR x_exts THEN mt
                WHEN mode = 2 THEN x_sl1t
                WHEN mode = 0 AND NOT x_ol AND ln(mp) - ln(sl_p) < i_sl THEN mt
                ELSE sl_t END AS sl_t,
           -- ss: mirror image
           CASE WHEN x_ol OR x_cl OR x_cns OR x_extl THEN mp
                WHEN mode = 1 THEN x_ss1p
                WHEN mode = 0 AND NOT x_os AND ln(ss_p) - ln(mp) < i_ss THEN mp
                ELSE ss_p END AS ss_p,
           CASE WHEN x_ol OR x_cl OR x_cns OR x_extl THEN mt
                WHEN mode = 1 THEN x_ss1t
                WHEN mode = 0 AND NOT x_os AND ln(ss_p) - ln(mp) < i_ss THEN mt
                ELSE ss_t END AS ss_t,
           -- ex: the open position's running extreme (el in long, es in short)
           CASE WHEN x_ol OR x_cl OR x_os OR x_cs OR x_extl OR x_exts THEN mp
                WHEN x_cnl OR x_cns THEN CAST(NULL AS DOUBLE)
                ELSE ex_p END AS ex_p,
           CASE WHEN x_ol OR x_cl OR x_os OR x_cs OR x_extl OR x_exts THEN mt
                WHEN x_cnl OR x_cns THEN CAST(NULL AS TIMESTAMP)
                ELSE ex_t END AS ex_t,
           CASE WHEN x_cs OR x_cnl THEN sl_p WHEN x_cl OR x_cns THEN ss_p END AS e_op,
           CASE WHEN x_cs OR x_cnl THEN sl_t WHEN x_cl OR x_cns THEN ss_t END AS e_ot,
           CASE WHEN x_cs OR x_cnl OR x_cl OR x_cns THEN ex_p END AS e_cp,
           CASE WHEN x_cs OR x_cnl OR x_cl OR x_cns THEN ex_t END AS e_ct
    FROM (
        SELECT s.*, m.rn AS mrn, m.p AS mp, m.ts AS mt,
               -- interest accrued on each tracker since it anchored
               -- (reference Interest: rho * Δt seconds; multiply-then-
               -- divide in the engine's own operation order)
               {r} * (epoch_us(m.ts) - epoch_us(s.sl_t)) / 1e6 AS i_sl,
               {r} * (epoch_us(m.ts) - epoch_us(s.ss_t)) / 1e6 AS i_ss,
               {r} * (epoch_us(m.ts) - epoch_us(s.ex_t)) / 1e6 AS i_ex,
               -- in-step helper updates (short-mode sl re-anchor, long-mode
               -- ss re-anchor — the engine updates these BEFORE testing
               -- close conditions, which then use the updated tracker)
               CASE WHEN s.mode = 2 AND ln(m.p) - ln(s.sl_p) < i_sl
                    THEN m.p ELSE s.sl_p END AS x_sl1p,
               CASE WHEN s.mode = 2 AND ln(m.p) - ln(s.sl_p) < i_sl
                    THEN m.ts ELSE s.sl_t END AS x_sl1t,
               CASE WHEN s.mode = 1 AND ln(s.ss_p) - ln(m.p) < i_ss
                    THEN m.p ELSE s.ss_p END AS x_ss1p,
               CASE WHEN s.mode = 1 AND ln(s.ss_p) - ln(m.p) < i_ss
                    THEN m.ts ELSE s.ss_t END AS x_ss1t,
               -- transition flags (position_discovery.cpp branch
               -- conditions, interest-bearing forms)
               (s.mode = 0 AND ln(m.p) - ln(s.sl_p) > i_sl + {comm}) AS x_ol,
               (s.mode = 0 AND NOT x_ol
                AND ln(s.ss_p) - ln(m.p) > i_ss + {comm}) AS x_os,
               (s.mode = 1 AND ln(m.p) - ln(s.ex_p) > i_ex) AS x_extl,
               (s.mode = 1 AND NOT x_extl
                AND ln(x_ss1p) - ln(m.p)
                    > {r} * (epoch_us(m.ts) - epoch_us(x_ss1t)) / 1e6
                      + {comm}) AS x_cs,
               (s.mode = 1 AND NOT x_extl AND NOT x_cs
                AND i_ex > {comm} - (ln(s.ex_p) - ln(m.p))) AS x_cnl,
               (s.mode = 2 AND ln(s.ex_p) - ln(m.p) > i_ex) AS x_exts,
               (s.mode = 2 AND NOT x_exts
                AND ln(m.p) - ln(x_sl1p)
                    > {r} * (epoch_us(m.ts) - epoch_us(x_sl1t)) / 1e6
                      + {comm}) AS x_cl,
               (s.mode = 2 AND NOT x_exts AND NOT x_cl
                AND i_ex > {comm} - (ln(m.p) - ln(s.ex_p))) AS x_cns
        FROM step s JOIN mid m
          ON m.pair_id = s.pair_id AND m.era = s.era AND m.rn = s.rn + 1
    )
), last_state AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY pair_id, era
                                     ORDER BY rn DESC) AS rr
        FROM step) WHERE rr = 1
), positions AS (
    SELECT pair_id, era, e_op AS op, e_ot AS ot, e_cp AS cp, e_ct AS ct
    FROM step WHERE e_op IS NOT NULL
    UNION ALL
    SELECT pair_id, era,
           CASE WHEN mode = 1 THEN sl_p ELSE ss_p END,
           CASE WHEN mode = 1 THEN sl_t ELSE ss_t END,
           ex_p, ex_t
    FROM last_state WHERE mode <> 0
)
SELECT pair_id, era, ot AS opened_at, op AS open_price,
       ct AS closed_at, cp AS close_price,
       CASE WHEN op > cp THEN (op - cp) / op * 10000
            ELSE (cp - op) / op * 10000 END AS bps_return,
       CASE WHEN epoch_us(ct) > epoch_us(ot)
            THEN exp(abs(ln(op) - ln(cp))
                     / ((epoch_us(ct) - epoch_us(ot)) / 1e6)) - 1
            ELSE CAST('infinity' AS DOUBLE) END AS rate,
       abs(ln(op) - ln(cp)) AS log_return
FROM positions
"""


def epsilon_draws_mid_oracle_sql(epsilon: float,
                                 mid_cte: str | None = None) -> str:
    """Recursive-CTE replay of _discover_draws over the mid-price stream.

    ``mid_cte`` substitutes the mid-price source (range overload)."""
    from obadiah_spark.operators.depth import SPREAD_L1_CTES

    eps = repr(float(epsilon))
    mid = mid_cte if mid_cte is not None else _MID_CTE
    return f"""
WITH RECURSIVE {SPREAD_L1_CTES}, {mid}, step AS (
    SELECT pair_id, era, rn,
           p AS st_p, ts AS st_t, p AS tp_p, ts AS tp_t,
           CAST(NULL AS DOUBLE) AS e_sp, CAST(NULL AS TIMESTAMP) AS e_st,
           CAST(NULL AS DOUBLE) AS e_ep, CAST(NULL AS TIMESTAMP) AS e_et
    FROM mid WHERE rn = 1
    UNION ALL
    SELECT pair_id, era, mrn,
           CASE WHEN x_close THEN tp_p ELSE st_p END AS st_p,
           CASE WHEN x_close THEN tp_t ELSE st_t END AS st_t,
           CASE WHEN x_ext THEN mp ELSE tp_p END AS tp_p,
           CASE WHEN x_ext THEN mt ELSE tp_t END AS tp_t,
           CASE WHEN x_close THEN st_p END AS e_sp,
           CASE WHEN x_close THEN st_t END AS e_st,
           CASE WHEN x_close THEN tp_p END AS e_ep,
           CASE WHEN x_close THEN tp_t END AS e_et
    FROM (
        SELECT s.*, m.rn AS mrn, m.p AS mp, m.ts AS mt,
               (m.p = s.tp_p) AS x_same,
               (NOT x_same AND ((s.tp_p >= s.st_p AND m.p > s.tp_p)
                                OR (s.tp_p <= s.st_p AND m.p < s.tp_p))) AS x_ext,
               (NOT x_same AND NOT x_ext
                AND abs(ln(m.p) - ln(s.tp_p)) > {eps}) AS x_close
        FROM step s JOIN mid m
          ON m.pair_id = s.pair_id AND m.era = s.era AND m.rn = s.rn + 1
    )
), last_state AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY pair_id, era
                                     ORDER BY rn DESC) AS rr
        FROM step) WHERE rr = 1
), last_row AS (
    SELECT * FROM (
        SELECT pair_id, era, p, ts,
               row_number() OVER (PARTITION BY pair_id, era
                                  ORDER BY rn DESC) AS rr
        FROM mid) WHERE rr = 1
), draws AS (
    SELECT pair_id, era, e_sp AS sp, e_st AS st, e_ep AS ep, e_et AS et
    FROM step WHERE e_sp IS NOT NULL
    UNION ALL
    SELECT ls.pair_id, ls.era, ls.st_p, ls.st_t, lr.p, lr.ts
    FROM last_state ls JOIN last_row lr
      ON lr.pair_id = ls.pair_id AND lr.era = ls.era
    WHERE lr.ts > ls.st_t
)
SELECT pair_id, era, st AS draw_start, sp AS start_price,
       et AS draw_end, ep AS end_price,
       CASE WHEN ep >= sp THEN 'up' ELSE 'down' END AS draw_type,
       CASE WHEN sp > ep THEN (sp - ep) / sp * 10000
            ELSE (ep - sp) / sp * 10000 END AS bps_return,
       abs(ln(sp) - ln(ep)) AS log_return
FROM draws
"""


def mid_price(l1: DataFrame) -> DataFrame:
    """Mid-price stream from the spread fold output."""
    from pyspark.sql import functions as F

    return l1.select(
        "pair_id", "era", "microtimestamp",
        ((F.col("best_bid_price") + F.col("best_ask_price")) / 2).alias("price"),
    )
