"""Data-quality operators (SURVEY §2.7) as runnable DataFrame functions.

Reference parity:
- Q1 ``obanalytics.crossed_books`` — detect crossed-book periods from the
  level1 stream: gaps-and-islands (state-change flag → running sum → group
  parity) yielding (previous_uncrossed, first_crossed, next_uncrossed)
  (reference db/obanalytics_schema.sql:1183-1216).
- Q4 chain-integrity audits — ``qty_level3_show_duplicate_order_events`` /
  ``show_invalid_chains`` family (reference db/obanalytics_schema.sql:2157-2426)
  re-expressed as ONE violations DataFrame: duplicates, orphan chains,
  broken next-pointers, terminal events carrying next-pointers.

Both are pure window/aggregation SQL — native, codegen-friendly. On healthy
data both return 0 rows; tests corrupt a fixture to prove detection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def crossed_books(l1: DataFrame) -> DataFrame:
    """Q1: crossed periods from a level1 stream
    (pair_id, era, microtimestamp, best_bid_price, best_ask_price)."""
    bid = F.coalesce(F.col("best_bid_price"), F.col("best_ask_price"))
    ask = F.coalesce(F.col("best_ask_price"), F.col("best_bid_price"))
    w = W.partitionBy("pair_id", "era").orderBy("microtimestamp")
    x = l1.select(
        "pair_id", "era", "microtimestamp", (bid > ask).alias("crossed")
    )
    flip = F.when(
        F.lag("crossed").over(w).isNull(), F.col("crossed").cast("int")
    ).otherwise((F.lag("crossed").over(w) != F.col("crossed")).cast("int"))
    grouped = (
        x.withColumn("_t", flip)
        .withColumn("_g", F.sum("_t").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)))
    )
    periods = grouped.groupBy("pair_id", "era", "_g").agg(
        F.min("microtimestamp").alias("period_start"),
        F.max("microtimestamp").alias("period_end"),
        F.first("crossed").alias("crossed"),
    )
    wp = W.partitionBy("pair_id", "era").orderBy("period_start")
    chain = periods.withColumn("previous_uncrossed", F.lag("period_end").over(wp)) \
                   .withColumn("next_uncrossed", F.lead("period_start").over(wp))
    return chain.filter("crossed").select(
        "pair_id", "era", "previous_uncrossed",
        F.col("period_start").alias("first_crossed"), "next_uncrossed",
    )


_CROSSED_BOOKS_CTES = """, x AS (
    SELECT pair_id, era, ts,
           coalesce(best_bid_price, best_ask_price)
             > coalesce(best_ask_price, best_bid_price) AS crossed
    FROM l1_dedup
), flips AS (
    SELECT *,
           CASE WHEN lag(crossed) OVER w IS NULL THEN CAST(crossed AS INT)
                WHEN lag(crossed) OVER w <> crossed THEN 1 ELSE 0 END AS t
    FROM x WINDOW w AS (PARTITION BY pair_id, era ORDER BY ts)
), grouped AS (
    SELECT *, sum(t) OVER (PARTITION BY pair_id, era ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
    FROM flips
), periods AS (
    SELECT pair_id, era, g,
           min(ts) AS period_start, max(ts) AS period_end,
           bool_or(crossed) AS crossed
    FROM grouped GROUP BY pair_id, era, g
), chained AS (
    SELECT *,
           lag(period_end) OVER wp AS previous_uncrossed,
           lead(period_start) OVER wp AS next_uncrossed
    FROM periods WINDOW wp AS (PARTITION BY pair_id, era ORDER BY period_start)
)"""

_CROSSED_BOOKS_SELECT = """
SELECT pair_id, era, previous_uncrossed,
       period_start AS first_crossed, next_uncrossed
FROM chained WHERE crossed
"""

CROSSED_BOOKS_ORACLE_SUFFIX = _CROSSED_BOOKS_CTES + _CROSSED_BOOKS_SELECT


def crossed_books_oracle() -> str:
    from obadiah_spark.operators.depth import SPREAD_L1_CTES

    return f"WITH {SPREAD_L1_CTES}{CROSSED_BOOKS_ORACLE_SUFFIX}"


def invalid_takers(l3: DataFrame, instants: DataFrame) -> DataFrame:
    """The rows the reference's ``p_check_takers`` would RAISE on
    (``_is_valid_taker_event``, db/obanalytics_schema.sql:888-900): live
    NON-maker (crossing) events at the probed ``instants`` whose chain's
    next event is NOT a deletion — a crossing order that went on resting.
    Spark-first, the reference's per-row exception becomes this audit
    relation; ``snapshot(check_takers=True)`` is the filtering twin.

    ``instants`` is a one-column (``at_ts``) frame — typically the
    ``first_crossed`` instants of :func:`crossed_books` — probed in ONE
    distributed ``snapshot_multi`` pass (no per-instant driver loop)."""
    from obadiah_spark.operators.order_book import snapshot_multi, with_next_is_delete

    snap = snapshot_multi(with_next_is_delete(l3), instants)
    return snap.filter(
        ~F.col("is_maker") & ~F.coalesce(F.col("_next_is_delete"), F.lit(False))
    ).select("at_ts", "pair_id", "exchange_id", "microtimestamp",
             "order_id", "event_no", "side", "price", "amount")


def invalid_takers_oracle_sql() -> str:
    """DuckDB mirror: crossed instants → per-instant live sets → maker
    flags → next-event deletion lookup via the same per-life lead."""
    from obadiah_spark.operators.depth import SPREAD_L1_CTES

    return f"""
WITH {SPREAD_L1_CTES}{_CROSSED_BOOKS_CTES}, instants AS (
    SELECT DISTINCT period_start AS at_ts FROM chained WHERE crossed
), nxt AS (
    SELECT *, lead(chain_state) OVER (
        PARTITION BY pair_id, exchange_id, era, order_id, life_no
        ORDER BY event_no) AS next_state
    FROM level3
), cur_era AS (
    SELECT i.at_ts, e.pair_id, e.exchange_id, max(e.era) AS cur_era
    FROM (SELECT DISTINCT pair_id, exchange_id, era FROM level3) e
    JOIN instants i ON e.era <= i.at_ts
    GROUP BY 1, 2, 3
), live AS (
    SELECT l.*, c.at_ts
    FROM nxt l JOIN cur_era c
      ON l.pair_id = c.pair_id AND l.exchange_id = c.exchange_id
     AND l.era = c.cur_era AND l.microtimestamp <= c.at_ts
     AND (l.chain_state = 'alive'
          OR (l.chain_state = 'chained' AND l.next_microtimestamp > c.at_ts))
), flagged AS (
    SELECT *,
           coalesce(CASE side
               WHEN 'b' THEN price <= min(price) FILTER (WHERE side = 's' AND amount > 0)
                   OVER (PARTITION BY at_ts, pair_id, exchange_id
                         ORDER BY price_microtimestamp, microtimestamp)
               WHEN 's' THEN price >= max(price) FILTER (WHERE side = 'b' AND amount > 0)
                   OVER (PARTITION BY at_ts, pair_id, exchange_id
                         ORDER BY price_microtimestamp, microtimestamp)
           END, true) AS is_maker
    FROM live
)
SELECT at_ts, pair_id, exchange_id, microtimestamp,
       order_id, event_no, side, price, amount
FROM flagged
WHERE NOT is_maker AND coalesce(next_state, '') <> 'deleted'
"""


def chain_audit(l3: DataFrame) -> DataFrame:
    """Q4: one row per chain-integrity violation (empty on healthy data).

    Reincarnation-aware: a chain is identified by (pair_id, exchange_id,
    era, order_id, life_no) — event_no restarts at 1 per life (reference
    reincarnation_no, db/bitfinex_schema.sql:408-417), so uniqueness and
    predecessor checks must scope to the life, not the bare (order, era).
    The pair/exchange keys are load-bearing in every join: order_ids are
    only unique within an exchange's pair, so a same-numbered order on
    another pair could otherwise mask a real violation (matching
    repair._CHAIN_KEYS)."""
    keys = ["pair_id", "era", "order_id", "life_no", "event_no"]

    def _same_order(x: str, y: str):
        # order identity — pair/exchange included so cross-pair order_id
        # collisions can't satisfy (or mask) a probe
        return (
            (F.col(f"{x}.order_id") == F.col(f"{y}.order_id"))
            & (F.col(f"{x}.pair_id") == F.col(f"{y}.pair_id"))
            & (F.col(f"{x}.exchange_id") == F.col(f"{y}.exchange_id"))
            & (F.col(f"{x}.era") == F.col(f"{y}.era"))
        )

    def _same_chain(x: str, y: str):
        return _same_order(x, y) \
            & (F.col(f"{x}.life_no") == F.col(f"{y}.life_no"))

    dup = (
        l3.groupBy(*keys, "exchange_id").count().filter("count > 1")
        .select(*keys, F.lit("duplicate_event").alias("issue"))
    )
    a, b = l3.alias("a"), l3.alias("b")
    orphan = (
        a.filter("a.event_no > 1")
        .join(
            b,
            _same_chain("a", "b")
            & (F.col("a.event_no") == F.col("b.event_no") + 1),
            "left_anti",
        )
        .select(*[f"a.{k}" for k in keys], F.lit("orphan_chain").alias("issue"))
    )
    bad_next = (
        l3.filter(
            (F.col("chain_state") == "chained")
            & (
                F.col("next_microtimestamp").isNull()
                | (F.col("next_microtimestamp") <= F.col("microtimestamp"))
                | (F.col("next_event_no") != F.col("event_no") + 1)
            )
        ).select(*keys, F.lit("bad_next_pointer").alias("issue"))
    )
    # a resurrected life must be preceded by a delete of the previous life
    l2 = l3.alias("l2")
    bad_life = (
        l3.alias("l1").filter("l1.life_no > 0")
        .filter(F.col("l1.event_no") == 1)
        .join(
            l2,
            _same_order("l1", "l2")
            & (F.col("l1.life_no") == F.col("l2.life_no") + 1)
            & (F.col("l2.chain_state") == "deleted")
            & (F.col("l2.microtimestamp") < F.col("l1.microtimestamp")),
            "left_anti",
        )
        .select(*[f"l1.{k}" for k in keys], F.lit("life_without_death").alias("issue"))
    )
    terminal = (
        l3.filter(
            F.col("chain_state").isin("alive", "deleted")
            & F.col("next_microtimestamp").isNotNull()
        ).select(*keys, F.lit("terminal_with_next").alias("issue"))
    )
    # POINTER-level orphan: nobody's next targets this event (the
    # reference's fix_eternals orphan definition,
    # db/obanalytics_schema.sql:2231-2238) — stricter than the
    # predecessor-by-number check above (a wiped pointer leaves the
    # numbering intact but strands the successor)
    c, d = l3.alias("c"), l3.alias("d")
    ptr_orphan = (
        c.filter("c.event_no > 1")
        .join(
            d,
            _same_chain("c", "d")
            & (F.col("d.next_microtimestamp") == F.col("c.microtimestamp"))
            & (F.col("d.next_event_no") == F.col("c.event_no")),
            "left_anti",
        )
        .select(*[f"c.{k}" for k in keys],
                F.lit("pointer_orphan").alias("issue"))
    )
    # an 'alive' event must be its life's LAST event (a non-terminal
    # 'alive' is fix_eternals' reconnect target)
    e, g = l3.alias("e"), l3.alias("g")
    dangling = (
        e.filter(F.col("e.chain_state") == "alive")
        .join(
            g,
            _same_chain("e", "g")
            & (F.col("g.event_no") > F.col("e.event_no")),
            "left_semi",
        )
        .select(*[f"e.{k}" for k in keys],
                F.lit("dangling_alive").alias("issue"))
    )
    return (
        dup.unionByName(orphan).unionByName(bad_next)
        .unionByName(bad_life).unionByName(terminal)
        .unionByName(ptr_orphan).unionByName(dangling)
    )


CHAIN_AUDIT_ORACLE_BODY = """
SELECT pair_id, era, order_id, life_no, event_no, 'duplicate_event' AS issue
FROM (SELECT pair_id, exchange_id, era, order_id, life_no, event_no,
             count(*) AS n
      FROM level3
      GROUP BY pair_id, exchange_id, era, order_id, life_no, event_no) d
WHERE n > 1
UNION ALL
SELECT a.pair_id, a.era, a.order_id, a.life_no, a.event_no, 'orphan_chain'
FROM level3 a
WHERE a.event_no > 1
  AND NOT EXISTS (SELECT 1 FROM level3 b
                  WHERE b.order_id = a.order_id AND b.pair_id = a.pair_id
                    AND b.exchange_id = a.exchange_id AND b.era = a.era
                    AND b.life_no = a.life_no
                    AND b.event_no = a.event_no - 1)
UNION ALL
SELECT pair_id, era, order_id, life_no, event_no, 'bad_next_pointer'
FROM level3
WHERE chain_state = 'chained'
  AND (next_microtimestamp IS NULL
       OR next_microtimestamp <= microtimestamp
       OR next_event_no <> event_no + 1)
UNION ALL
SELECT l1.pair_id, l1.era, l1.order_id, l1.life_no, l1.event_no, 'life_without_death'
FROM level3 l1
WHERE l1.life_no > 0 AND l1.event_no = 1
  AND NOT EXISTS (SELECT 1 FROM level3 l2
                  WHERE l2.order_id = l1.order_id AND l2.pair_id = l1.pair_id
                    AND l2.exchange_id = l1.exchange_id AND l2.era = l1.era
                    AND l2.life_no = l1.life_no - 1
                    AND l2.chain_state = 'deleted'
                    AND l2.microtimestamp < l1.microtimestamp)
UNION ALL
SELECT pair_id, era, order_id, life_no, event_no, 'terminal_with_next'
FROM level3
WHERE chain_state IN ('alive', 'deleted') AND next_microtimestamp IS NOT NULL
UNION ALL
SELECT c.pair_id, c.era, c.order_id, c.life_no, c.event_no, 'pointer_orphan'
FROM level3 c
WHERE c.event_no > 1
  AND NOT EXISTS (SELECT 1 FROM level3 d
                  WHERE d.order_id = c.order_id AND d.pair_id = c.pair_id
                    AND d.exchange_id = c.exchange_id AND d.era = c.era
                    AND d.life_no = c.life_no
                    AND d.next_microtimestamp = c.microtimestamp
                    AND d.next_event_no = c.event_no)
UNION ALL
SELECT e.pair_id, e.era, e.order_id, e.life_no, e.event_no, 'dangling_alive'
FROM level3 e
WHERE e.chain_state = 'alive'
  AND EXISTS (SELECT 1 FROM level3 g
              WHERE g.order_id = e.order_id AND g.pair_id = e.pair_id
                AND g.exchange_id = e.exchange_id AND g.era = e.era
                AND g.life_no = e.life_no AND g.event_no > e.event_no)
"""


def audit_microtimestamp_moves(rewritten: DataFrame, max_change_s: int = 15) -> DataFrame:
    """I13 ``save_exchange_microtimestamp`` + I14 ``check_microtimestamp_change``
    as one batch audit over a rewrite's moved rows.

    The reference implements both as row triggers: the first reassignment of
    ``microtimestamp`` stashes the original exchange-assigned instant in
    ``exchange_microtimestamp`` (db/obanalytics_schema.sql:2432-2447), and a
    move is blocked when it goes backward or farther forward than
    ``parameters.max_microtimestamp_change`` seconds (:1162-1174; per-pair
    values db/parameters_schema.sql:47-97, default 15 s). A declarative
    engine has no row triggers — the rewrite operators carry the pre-rewrite
    instant (``_old_ts``, see merge_crossed_books) and this audit derives,
    per moved row, the preserved exchange microtimestamp and the violation
    class ('backward' / 'too_far' / NULL-ok) in one narrow projection.
    Callers enforce by filtering ``violation IS NOT NULL`` (raise or quarantine).

    Scale: no shuffle at all — a filter + projection over the rewrite's own
    partitioning.
    """
    moved = rewritten.filter(F.col("microtimestamp") != F.col("_old_ts"))
    delta_us = F.unix_micros("microtimestamp") - F.unix_micros("_old_ts")
    return moved.select(
        "pair_id", "era", "order_id", "event_no", "life_no",
        F.col("_old_ts").alias("old_microtimestamp"),
        F.col("microtimestamp").alias("new_microtimestamp"),
        # I13: first-ever move ⇒ the original IS the exchange instant (the
        # level3 log carries no prior exchange_microtimestamp column here)
        F.col("_old_ts").alias("exchange_microtimestamp"),
        F.when(delta_us < 0, "backward")
        .when(delta_us > max_change_s * 1_000_000, "too_far")
        .alias("violation"),
    )


def match_audit(l3: DataFrame, matches: DataFrame) -> DataFrame:
    """Trade-link integrity audit — the invariants the reference enforces
    with FKs on ``obanalytics.matches`` and the bitstamp
    ``live_trades_validate`` / ``live_trades_manage_linked_events``
    triggers (db/bitstamp_schema.sql): every linked (order, event) exists
    at the trade's instant, the linked event's fill equals the trade
    amount, and the link is on the correct side. Returns violations
    (zero rows on a consistent store — the gate entry)."""
    # the reference link is the FULL level3 pkey (microtimestamp, order_id,
    # event_no) — event_no alone is reused across reincarnation lives, so
    # the instant is part of the identity, not a separate consistency check
    ev = l3.select(
        "pair_id", "era", "order_id", "event_no", "microtimestamp",
        F.lit(True).alias("_found"),
        F.col("side").alias("_ev_side"), F.col("fill").alias("_ev_fill"))

    out = []
    for side, oid, eno in (("b", "buy_order_id", "buy_event_no"),
                           ("s", "sell_order_id", "sell_event_no")):
        m = matches.filter(F.col(oid).isNotNull()).select(
            "pair_id", "era", "microtimestamp", "amount",
            "exchange_trade_id",
            F.col(oid).alias("order_id"), F.col(eno).alias("event_no"))
        j = m.join(ev, ["pair_id", "era", "order_id", "event_no",
                        "microtimestamp"], "left")
        missing = j.filter(F.col("_found").isNull()).select(
            "pair_id", "exchange_trade_id",
            F.lit(f"missing_{side}_event").alias("issue"))
        bad_fill = j.filter(
            F.col("_found") & (F.col("_ev_fill") != F.col("amount"))).select(
            "pair_id", "exchange_trade_id",
            F.lit(f"fill_mismatch_{side}").alias("issue"))
        wrong_side = j.filter(
            F.col("_found") & (F.col("_ev_side") != side)).select(
            "pair_id", "exchange_trade_id",
            F.lit(f"wrong_side_{side}").alias("issue"))
        out += [missing, bad_fill, wrong_side]
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


MATCH_AUDIT_ORACLE_BODY = """
WITH links AS (
    SELECT pair_id, era, microtimestamp, amount, exchange_trade_id,
           buy_order_id AS order_id, buy_event_no AS event_no, 'b' AS lside
    FROM matches WHERE buy_order_id IS NOT NULL
    UNION ALL
    SELECT pair_id, era, microtimestamp, amount, exchange_trade_id,
           sell_order_id, sell_event_no, 's'
    FROM matches WHERE sell_order_id IS NOT NULL
), j AS (
    SELECT k.*, e.microtimestamp IS NOT NULL AS found,
           e.side AS ev_side, e.fill AS ev_fill
    FROM links k LEFT JOIN level3 e
      ON e.pair_id = k.pair_id AND e.era = k.era
     AND e.order_id = k.order_id AND e.event_no = k.event_no
     AND e.microtimestamp = k.microtimestamp
)
SELECT pair_id, exchange_trade_id,
       'missing_' || lside || '_event' AS issue
FROM j WHERE NOT found
UNION ALL
SELECT pair_id, exchange_trade_id, 'fill_mismatch_' || lside
FROM j WHERE found AND ev_fill <> amount
UNION ALL
SELECT pair_id, exchange_trade_id, 'wrong_side_' || lside
FROM j WHERE found AND ev_side <> lside
"""
