"""Deterministic level3 / matches synthesis from the driver's ``events`` table.

The reference engine's canonical input is the ``obanalytics.level3`` order-event
log (reference: db/obanalytics_schema.sql:128-153) plus ``matches`` (trades,
db/obanalytics_schema.sql:181-199).  The driver's testdata has no such table, so
— per FIXTURES.md §8 — we derive one deterministically from ``events``.  The
derivation itself exercises the reference's ingestion semantics:

- per-episode per-order dedup keeping the latest message
  (reference I1, db/bitfinex_schema.sql:374-384),
- event chaining: event_no / next_microtimestamp / fill via windows
  (reference I8, db/obanalytics_schema.sql:1760-1834 — a trigger there, a
  window transform here),
- era assignment (book resets at era start,
  reference db/bitfinex_schema.sql:332-340),
- REINCARNATION: an order deleted mid-era and seen again starts a new life
  with event_no restarting at 1 (reference reincarnation_no,
  db/bitfinex_schema.sql:408-417) — exposed as ``life_no``,
- PRICE CHANGES (pacman orders): price moves mid-life; price chains tracked
  via ``price_microtimestamp``/``price_event_no`` = first event of the
  current price group within a life (reference db/bitfinex_schema.sql:443-458),
- CROSSED EPISODES: occasional aggressive bids placed above the resting ask
  range, so the level1 stream has real crossed periods (exercises Q1/Q2 and
  the is_aggressor/market branches of get.events).

The SQL below is deliberately written in the common dialect of Spark SQL and
DuckDB so the *same text* produces the same rows on both engines; every oracle
in ``__spark_entry__.py`` builds on it.

±infinity convention (reference uses 'infinity'/'-infinity' timestamps,
db/obanalytics_schema.sql:149): ``next_microtimestamp IS NULL`` plus
``chain_state`` ∈ {'alive' (= +inf: the order rests forever), 'deleted'
(= -inf: the order is removed at this event), 'chained'}.

Generator layout (pure integer arithmetic → bit-identical on both engines):
- 240 order ids cycling over events; pair_id = 1 + order_id % 2 (two pairs);
  side from order_id % 4 (both sides per pair); exchange_id = 1.
- base price per order: bids 99.76..100.00, asks 100.05..100.29 in 1-cent
  ticks (25 levels per side).
- PACMAN orders (order_id % 10 IN (1, 4) — both sides, both pairs): price
  wiggles +1 cent every second chain step → real price chains.
- CROSSING bids (order_id % 20 IN (8, 13) — one per pair) are priced at
  100.07 (above the 100.05 best-ask floor) whenever chain_step % 16 = 9 →
  transiently crossed books.
- REINCARNATING orders (order_id % 12 = 7): every 5th event of the order in
  an era is a delete; the next event starts a new life (life_no + 1,
  event_no restarts at 1).
- delete events carry the PREVIOUS event's price/amount (the reference's
  abs(lag(...)) convention for price=0 raw deletes) and have NULL fill.
- amount = 0.25 * (1 + (chain_step*7 + order_id) % 40) where chain_step =
  event_id DIV 240 (exact quarters; fill = prev − cur, positive ~1/6 of the
  time so the matches table is non-empty).
- episode = minute bucket of ts; era = ISO week (2024-01-01 is a Monday →
  eras start Jan 1/8/15/22/29, matching the reference's "new era on month
  boundary / gap" semantics with a deterministic grid).
- orders with order_id % 3 == 0 end their era chain with a delete event.
"""

from __future__ import annotations

import os

# Runs verbatim on Spark SQL and DuckDB. Expects a relation/view `events`
# with columns (event_id bigint, ts timestamp, ...).
LEVEL3_BODY_SQL = """
WITH l3_raw AS (
    SELECT
        event_id,
        date_trunc('minute', ts)            AS microtimestamp,
        ts                                  AS local_timestamp,
        1 + (event_id % 240)                AS order_id
    FROM events
), l3_keyed AS (
    SELECT
        event_id, microtimestamp, local_timestamp, order_id,
        CAST(1 + (order_id % 2) AS INT)     AS pair_id,
        CAST(1 AS INT)                      AS exchange_id,
        CASE WHEN (order_id % 4) < 2 THEN 'b' ELSE 's' END AS side,
        date_trunc('week', microtimestamp)  AS era
    FROM l3_raw
), l3_dedup AS (
    SELECT * FROM (
        SELECT
            k.*,
            row_number() OVER (
                PARTITION BY order_id, microtimestamp
                ORDER BY local_timestamp DESC, event_id DESC) AS _rn
        FROM l3_keyed k) d
    WHERE _rn = 1
), l3_seq AS (
    SELECT
        event_id, microtimestamp, local_timestamp, order_id,
        pair_id, exchange_id, side, era,
        CAST((event_id - (event_id % 240)) / 240 AS BIGINT) AS chain_step,
        row_number() OVER (
            PARTITION BY order_id, era ORDER BY microtimestamp) - 1 AS seq,
        lead(microtimestamp) OVER (
            PARTITION BY order_id, era ORDER BY microtimestamp) IS NULL AS is_last
    FROM l3_dedup
), l3_del AS (
    -- reincarnating orders die every 5th event mid-era; order_id % 3 = 0
    -- orders die at era end (the two families are disjoint: 7 mod 12 is
    -- never 0 mod 3)
    SELECT *,
        CASE WHEN (order_id % 12 = 7 AND (seq % 5) = 4)
                  OR (order_id % 3 = 0 AND is_last)
             THEN 1 ELSE 0 END AS is_delete
    FROM l3_seq
), l3_life AS (
    -- life_no = number of deletes of this order strictly before this event
    -- (reference reincarnation_no, db/bitfinex_schema.sql:408-417)
    SELECT *,
        CAST(coalesce(sum(is_delete) OVER (
            PARTITION BY order_id, era ORDER BY microtimestamp
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT) AS life_no
    FROM l3_del
), l3_chain AS (
    SELECT *,
        CAST(row_number() OVER (
            PARTITION BY order_id, era, life_no ORDER BY microtimestamp) AS INT) AS event_no,
        lead(microtimestamp) OVER (
            PARTITION BY order_id, era, life_no ORDER BY microtimestamp) AS next_microtimestamp,
        -- integer cents, then one exact double division: bit-identical on
        -- Spark and DuckDB (decimal-literal arithmetic is NOT — Spark parses
        -- 100.00 as DECIMAL, DuckDB computes DOUBLE)
        CAST(
            CASE
                -- crossing bids: above the 100.05 ask floor every 16th step
                WHEN (order_id % 20) IN (8, 13) AND (chain_step % 16) = 9 THEN 10007
                ELSE (CASE WHEN (order_id % 4) < 2
                           THEN 10000 - (CAST((order_id - (order_id % 4)) / 4 AS BIGINT) % 25)
                           ELSE 10005 + (CAST((order_id - (order_id % 4)) / 4 AS BIGINT) % 25)
                      END)
                     -- pacman: +1 cent every second chain step
                     + (CASE WHEN (order_id % 10) IN (1, 4)
                             THEN CAST((chain_step - (chain_step % 2)) / 2 AS BIGINT) % 2
                             ELSE 0 END)
            END AS DOUBLE) / CAST(100 AS DOUBLE) AS raw_price,
        -- amount varies ALONG each chain: the chain-step index (event_id DIV
        -- 240) advances by 1 per successive event of an order, so consecutive
        -- amounts differ by +7 or -33 steps (mod 40) — ~1/6 of chained events
        -- shrink the order, i.e. have positive fill → non-empty matches.
        -- (A plain event_id % 40 is constant per chain: 240 ≡ 0 mod 40.)
        CAST(1 + ((chain_step * 7 + order_id) % 40) AS DOUBLE)
            / CAST(4 AS DOUBLE) AS raw_amount
    FROM l3_life
), l3_carry AS (
    -- delete events carry the previous event's price/amount (the reference's
    -- abs(lag(price))/abs(lag(amount)) for price=0 raw deletes,
    -- db/bitfinex_schema.sql:397-399); a delete is never the first event of
    -- a multi-event life, so the (order, era) lag stays inside the life
    SELECT *,
        CASE WHEN is_delete = 1
             THEN coalesce(lag(raw_price) OVER (
                      PARTITION BY order_id, era ORDER BY microtimestamp), raw_price)
             ELSE raw_price END AS price,
        CASE WHEN is_delete = 1
             THEN coalesce(lag(raw_amount) OVER (
                      PARTITION BY order_id, era ORDER BY microtimestamp), raw_amount)
             ELSE raw_amount END AS amount
    FROM l3_chain
), l3_pg1 AS (
    -- price-change flag within a life (first event of a life counts as a
    -- change — reference coalesce(..., 1), db/bitfinex_schema.sql:405)
    SELECT *,
        CASE WHEN is_delete = 1 THEN 0
             WHEN lag(price) OVER (
                      PARTITION BY order_id, era, life_no ORDER BY microtimestamp) IS NULL THEN 1
             WHEN price <> lag(price) OVER (
                      PARTITION BY order_id, era, life_no ORDER BY microtimestamp) THEN 1
             ELSE 0 END AS is_price_changed
    FROM l3_carry
), l3_pg2 AS (
    SELECT *,
        sum(is_price_changed) OVER (
            PARTITION BY order_id, era, life_no ORDER BY microtimestamp
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS price_group
    FROM l3_pg1
)
SELECT
    microtimestamp,
    order_id,
    event_no,
    side,
    price,
    amount,
    CASE WHEN is_delete = 1 THEN NULL
         ELSE lag(amount) OVER (
                  PARTITION BY order_id, era, life_no ORDER BY microtimestamp) - amount
    END AS fill,
    next_microtimestamp,
    CASE WHEN next_microtimestamp IS NOT NULL THEN event_no + 1 END AS next_event_no,
    pair_id,
    exchange_id,
    local_timestamp,
    min(microtimestamp) OVER (
        PARTITION BY order_id, era, life_no, price_group) AS price_microtimestamp,
    CAST(min(event_no) OVER (
        PARTITION BY order_id, era, life_no, price_group) AS INT) AS price_event_no,
    CASE WHEN is_delete = 1 THEN 'deleted'
         WHEN next_microtimestamp IS NOT NULL THEN 'chained'
         ELSE 'alive'
    END AS chain_state,
    era,
    life_no,
    event_id
FROM l3_pg2
"""

# Trades derived from fill events: any chained/alive event with a positive
# fill is interpreted as a partial execution of the resting (maker) order;
# the taker side is the opposite of the maker's. One-sided order links are
# legal in the reference schema (nullable buy_/sell_ columns,
# db/obanalytics_schema.sql:186-191).
MATCHES_BODY_SQL = """
SELECT
    microtimestamp,
    fill                                     AS amount,
    price,
    CASE WHEN side = 'b' THEN 's' ELSE 'b' END AS side,
    CASE WHEN side = 'b' THEN order_id END   AS buy_order_id,
    CASE WHEN side = 'b' THEN event_no END   AS buy_event_no,
    CASE WHEN side = 's' THEN order_id END   AS sell_order_id,
    CASE WHEN side = 's' THEN event_no END   AS sell_event_no,
    CAST(0 AS INT)                           AS buy_match_rule,
    CAST(0 AS INT)                           AS sell_match_rule,
    event_id                                 AS exchange_trade_id,
    local_timestamp,
    pair_id,
    exchange_id,
    era
FROM level3
WHERE fill > 0 AND chain_state <> 'deleted'
"""


# F8: static dimension tables (reference obanalytics.pairs / exchanges,
# db/obanalytics_schema.sql:4772-4804) — broadcast-joined lookups. R0 = -log10
# of the price tick, fmu = -log10 of the amount tick.
PAIRS_SQL = """
SELECT CAST(1 AS INT) AS pair_id, 'BTCUSD' AS pair, CAST(2 AS INT) AS r0, CAST(8 AS INT) AS fmu
UNION ALL
SELECT CAST(2 AS INT), 'ETHUSD', CAST(2 AS INT), CAST(8 AS INT)
"""

EXCHANGES_SQL = """
SELECT CAST(1 AS INT) AS exchange_id, 'bitfinex' AS exchange
"""


def _splice_ctes(ctes: str, body: str) -> str:
    """Prepend CTE definitions to ``body``, merging with the body's own WITH
    clause if it has one (``WITH a AS (...) WITH b AS ...`` is invalid SQL —
    the two CTE lists must be joined with a comma)."""
    stripped = body.lstrip()
    if stripped[:14].upper() == "WITH RECURSIVE":
        # RECURSIVE must stay attached to the WITH keyword (it marks the
        # whole clause; non-recursive CTEs in the list are fine)
        return f"WITH RECURSIVE {ctes},\n{stripped[14:].lstrip()}"
    if stripped[:4].upper() == "WITH":
        return f"WITH {ctes},\n{stripped[4:].lstrip()}"
    return f"WITH {ctes}\n{stripped}"


def level3_cte(body: str) -> str:
    """Wrap an operator query so `level3` (+ the pairs/exchanges dims) are
    available as CTEs (for DuckDB oracles — the driver pre-registers only the
    raw testdata views)."""
    return _splice_ctes(
        f"level3 AS (\n{LEVEL3_BODY_SQL}\n), pairs AS (\n{PAIRS_SQL}\n), "
        f"exchanges AS (\n{EXCHANGES_SQL}\n)", body
    )


def level3_matches_cte(body: str) -> str:
    return _splice_ctes(
        f"level3 AS (\n{LEVEL3_BODY_SQL}\n), matches AS (\n{MATCHES_BODY_SQL}\n), "
        f"pairs AS (\n{PAIRS_SQL}\n), exchanges AS (\n{EXCHANGES_SQL}\n)", body
    )


def register_level3(spark, sf_dir: str | None = None):
    """Create/refresh the `level3` and `matches` temp views on a Spark session.

    If sf_dir is given, (re)loads the `events` view from it first.
    Returns the level3 DataFrame.
    """
    if sf_dir is not None:
        from obadiah_spark.session import read_table

        events = read_table(spark, sf_dir, "events")
        events.createOrReplaceTempView("events")
    l3 = spark.sql(LEVEL3_BODY_SQL)
    l3.createOrReplaceTempView("level3")
    # matches is session-cached like level3 (__spark_entry__._l3): it is
    # consumed by every matching/trading gate, and each reference
    # otherwise re-runs the fill-extraction windows over the level3
    # cache (~0.4 s per consumer at sf0.1).  16k rows at gate scale —
    # the cache is a plan-matched InMemoryRelation for the temp view's
    # consumers, materialized by its first action (r15, guide §5
    # "persist when reused and recompute is the expensive side").
    m = spark.sql(MATCHES_BODY_SQL).cache()
    m.createOrReplaceTempView("matches")
    spark.sql(PAIRS_SQL).createOrReplaceTempView("pairs")
    spark.sql(EXCHANGES_SQL).createOrReplaceTempView("exchanges")
    return l3
