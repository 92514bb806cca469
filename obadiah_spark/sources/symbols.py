"""SRC8 symbol-metadata monitor (reference python/obadiah/bitfinex.py:205-238
+ ``bitfinex.update_symbol_details`` / ``bitfinex.symbol_details``,
db/bitfinex_schema.sql:906-930).

The reference polls the exchange's symbols_details endpoint and appends a
history row per pair whenever any tracked attribute changed (``known_since``
timestamps the change); ``latest_symbol_details`` is the DISTINCT ON
(pair_id) latest row. The batch equivalent is an append-only SCD-2-style
upsert: join the snapshot to each pair's latest history row, append rows
that are new or differ. (No network in this engine — the snapshot arrives
as a DataFrame; the polling loop is the scheduler's concern.)

Scale: one window over the (tiny) dims history + one broadcast-sized join —
dimension maintenance, not a data-path operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

ATTRS = ["price_precision", "initial_margin", "minimum_margin",
         "maximum_order_size", "minimum_order_size", "expiration", "margin"]


def latest_symbol_details(history: DataFrame) -> DataFrame:
    """The reference's DISTINCT ON (pair_id) ... ORDER BY known_since DESC —
    with a deterministic attribute tiebreak: two history rows CAN share a
    known_since (same-instant reprocessing), and DISTINCT ON would pick one
    arbitrarily; ordering by the attribute tuple pins the choice on both
    engines."""
    w = W.partitionBy("pair_id").orderBy(
        F.desc("known_since"), F.desc(F.struct(*ATTRS)))
    return (history.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def update_symbol_details(history: DataFrame, snapshot: DataFrame,
                          as_of: str) -> DataFrame:
    """Append a history row (known_since = ``as_of``) for every snapshot
    pair that is new or differs from its latest history row; returns the
    full updated history."""
    latest = latest_symbol_details(history).select(
        F.col("pair_id").alias("h_pair"),
        *[F.col(c).alias(f"h_{c}") for c in ATTRS],
    )
    j = snapshot.join(latest, snapshot["pair_id"] == latest["h_pair"], "left")
    differs = F.col("h_pair").isNull()
    for c in ATTRS:
        differs = differs | ~F.col(c).eqNullSafe(F.col(f"h_{c}"))
    appended = j.filter(differs).select(
        "pair_id", *ATTRS,
        F.lit(as_of).cast("timestamp").alias("known_since"),
    )
    return history.unionByName(appended)


# gate fabric: history (150 pairs at T0) + snapshot (180 pairs: every 3rd
# bumps initial_margin, 30 are brand new) derived from `part`
SYMBOLS_FABRIC_CTES = """pairs_src AS (
    SELECT DISTINCT p_partkey % 180 AS pk FROM part
), hist AS (
    SELECT CAST(pk AS INT) AS pair_id,
           CAST(2 + pk % 3 AS INT) AS price_precision,
           CAST(pk % 7 AS DOUBLE) / 10 AS initial_margin,
           CAST(pk % 5 AS DOUBLE) / 10 AS minimum_margin,
           CAST(100 + pk % 50 AS DOUBLE) AS maximum_order_size,
           CAST(1 + pk % 4 AS DOUBLE) / 10 AS minimum_order_size,
           'NA' AS expiration,
           (pk % 2) = 0 AS margin,
           TIMESTAMP '2024-01-01 00:00:00' AS known_since
    FROM pairs_src WHERE pk < 150
), snap AS (
    SELECT CAST(pk AS INT) AS pair_id,
           CAST(2 + pk % 3 AS INT) AS price_precision,
           CAST(pk % 7 AS DOUBLE) / 10
               + CASE WHEN pk % 3 = 0 THEN 0.05 ELSE 0.0 END AS initial_margin,
           CAST(pk % 5 AS DOUBLE) / 10 AS minimum_margin,
           CAST(100 + pk % 50 AS DOUBLE) AS maximum_order_size,
           CAST(1 + pk % 4 AS DOUBLE) / 10 AS minimum_order_size,
           'NA' AS expiration,
           (pk % 2) = 0 AS margin
    FROM pairs_src
)"""

SYMBOLS_AS_OF = "2024-01-02 00:00:00"


def update_symbol_details_oracle_sql() -> str:
    attrs = ", ".join(ATTRS)
    differs = " OR ".join(
        f"s.{c} IS DISTINCT FROM l.{c}" for c in ATTRS)
    return f"""
WITH {SYMBOLS_FABRIC_CTES}, latest AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (
            PARTITION BY pair_id
            ORDER BY known_since DESC, ROW({attrs}) DESC) AS _rn
        FROM hist) h WHERE _rn = 1
), appended AS (
    SELECT s.pair_id, {", ".join("s." + c for c in ATTRS)},
           TIMESTAMP '{SYMBOLS_AS_OF}' AS known_since
    FROM snap s LEFT JOIN latest l ON s.pair_id = l.pair_id
    WHERE l.pair_id IS NULL OR {differs}
)
SELECT pair_id, {attrs}, known_since FROM hist
UNION ALL
SELECT pair_id, {attrs}, known_since FROM appended
"""
