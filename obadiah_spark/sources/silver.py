"""Silver-layer parquet layout for the canonical tables (SURVEY §1.3).

The reference partitions ``obanalytics.level3`` four levels deep —
LIST(exchange_id) → LIST(pair_id) → LIST(side) → RANGE(microtimestamp,
monthly) (db/obanalytics_schema.sql:153, _create_level3_partition
:325-448) — so that era-bounded scans prune storage. The Spark-native
equivalent is a parquet directory layout partitioned by the same columns
with rows sorted by (microtimestamp, order_id, event_no) inside each file:

- partition pruning: any query filtering on exchange/pair/side/month reads
  only matching directories (PushedFilters/PartitionFilters in the plan —
  pytest asserts this);
- sort order: parquet min/max row-group stats on microtimestamp make
  point-in-time and range scans skip row groups, the moral equivalent of
  the reference's (microtimestamp, order_id, event_no) leaf pkey;
- unlike the reference, event chains MAY span months (Spark windows cross
  partition directories freely), so the month boundary does NOT force an
  era — only real capture gaps do (SURVEY §1.3's deliberate deviation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COLS = ["exchange_id", "pair_id", "side", "month"]


def write_level3(l3: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write the level3 log in the pruned silver layout."""
    (
        l3.withColumn("month", F.date_format("microtimestamp", "yyyy-MM"))
        .repartition(*PARTITION_COLS)
        .sortWithinPartitions("microtimestamp", "order_id", "event_no")
        .write.mode(mode).partitionBy(*PARTITION_COLS).parquet(path)
    )


def read_level3(spark: SparkSession, path: str) -> DataFrame:
    """Read the silver layout back with canonical column types (partition
    directory values come back as inferred types — re-cast the int keys)."""
    df = spark.read.parquet(path)
    return df.withColumn("exchange_id", F.col("exchange_id").cast("int")) \
             .withColumn("pair_id", F.col("pair_id").cast("int")) \
             .drop("month")
