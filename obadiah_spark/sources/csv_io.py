"""Typed level3 CSV writer/reader with ±infinity timestamps (SURVEY §2.1 SRC7).

Reference parity: the reference stores chain endpoints as the special
PostgreSQL timestamps ``'infinity'`` (order rests forever) / ``'-infinity'``
(order removed at this event) and its Python test reader parses the level3
CSV back into typed records, mapping ``'NULL'`` text to None (reference
db/python2/obadiah_db/orderbook.py:43-67; ±infinity convention
db/obanalytics_schema.sql:149).

This engine's in-memory encoding is ``next_microtimestamp IS NULL`` plus
``chain_state`` ∈ {'alive' (+inf), 'deleted' (-inf), 'chained'} (see
obadiah_spark.synth). The CSV interchange format keeps the reference's text
convention — ``infinity`` / ``-infinity`` in the ``next_microtimestamp``
column — so a file written here is shaped like the reference's exports, and
the reader reverses it losslessly.

Spark-first: both directions are single projections around the built-in
distributed CSV source/sink — the formatting/parsing expressions are JVM-side
(`when`/`cast`), no Python UDFs, so the scan stays in whole-stage codegen and
scales to any number of part files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# interchange column order (superset of the reference CSV: era/life_no are
# this engine's partition bookkeeping, kept so a roundtrip is lossless)
CSV_COLS = [
    "microtimestamp", "order_id", "event_no", "side", "price", "amount",
    "fill", "next_microtimestamp", "next_event_no", "pair_id", "exchange_id",
    "local_timestamp", "price_microtimestamp", "price_event_no", "era",
    "life_no",
]

_TYPES = {
    "microtimestamp": "timestamp", "order_id": "bigint", "event_no": "int",
    "side": "string", "price": "double", "amount": "double", "fill": "double",
    "next_event_no": "int", "pair_id": "int", "exchange_id": "int",
    "local_timestamp": "timestamp", "price_microtimestamp": "timestamp",
    "price_event_no": "int", "era": "timestamp", "life_no": "int",
}


def level3_to_csv_frame(l3: DataFrame) -> DataFrame:
    """Project level3 to its all-string CSV interchange shape.

    ``CAST(x AS STRING)`` on DOUBLE is Spark's shortest-roundtrip repr and on
    TIMESTAMP the ISO 'yyyy-MM-dd HH:mm:ss[.ffffff]' form — both parse back
    exactly. ``next_microtimestamp`` folds the (NULL, chain_state) encoding
    back into the reference's ±infinity text.
    """
    ninf = (
        F.when(F.col("chain_state") == "deleted", F.lit("-infinity"))
        .when(F.col("next_microtimestamp").isNull(), F.lit("infinity"))
        .otherwise(F.col("next_microtimestamp").cast("string"))
    )
    cols = []
    for c in CSV_COLS:
        if c == "next_microtimestamp":
            cols.append(ninf.alias(c))
        else:
            cols.append(F.col(c).cast("string").alias(c))
    return l3.select(*cols)


def write_level3_csv(l3: DataFrame, path: str) -> None:
    """SRC6/SRC7 sink: distributed CSV export (one part file per partition)."""
    level3_to_csv_frame(l3).write.mode("overwrite").csv(path, header=True)


def read_level3_csv(spark: SparkSession, path: str) -> DataFrame:
    """SRC7: typed level3 reader including ±infinity text.

    Reads all columns as strings (so 'infinity' never poisons a timestamp
    cast), then applies one typed projection mirroring the reference reader's
    per-field conversions (db/python2/obadiah_db/orderbook.py:43-67).
    """
    raw = spark.read.csv(path, header=True, inferSchema=False)
    is_del = F.col("next_microtimestamp") == "-infinity"
    is_alive = F.col("next_microtimestamp") == "infinity"
    null_if = lambda c: F.when(  # noqa: E731 — reference maps 'NULL' text to None
        (F.col(c) == "NULL") | F.col(c).isNull(), F.lit(None)
    ).otherwise(F.col(c))
    cols = []
    for c in CSV_COLS:
        if c == "next_microtimestamp":
            cols.append(
                F.when(is_del | is_alive, F.lit(None).cast("timestamp"))
                .otherwise(F.col(c).cast("timestamp")).alias(c)
            )
        else:
            cols.append(null_if(c).cast(_TYPES[c]).alias(c))
    cols.append(
        F.when(is_del, "deleted").when(is_alive, "alive")
        .otherwise("chained").alias("chain_state")
    )
    return raw.select(*cols)


def csv_roundtrip(l3: DataFrame, path: str) -> DataFrame:
    """Gate query: write the level3 log to CSV and read it back typed.

    The result must hash-match the original rows (the oracle selects them
    straight from the level3 CTE), proving writer ∘ reader = identity —
    including the ±infinity and NULL text conventions.
    """
    write_level3_csv(l3, path)
    out = read_level3_csv(l3.sparkSession, path)
    # canonical column order: CSV interchange order + chain_state
    return out.select(*CSV_COLS, "chain_state")


def csv_roundtrip_oracle_sql() -> str:
    cols = ", ".join(CSV_COLS)
    return f"SELECT {cols}, chain_state FROM level3"
