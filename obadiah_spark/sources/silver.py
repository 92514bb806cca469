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
        # lead the sort with the partition columns: the dynamic-partition
        # writer inserts its own sort on them, and only a sort that
        # SUBSUMES it guarantees the in-file (microtimestamp, ...) order
        # the row-group min/max skipping depends on (relying on the
        # writer sort's tie-stability would be an implementation detail)
        .sortWithinPartitions(*PARTITION_COLS, "microtimestamp",
                              "order_id", "event_no")
        .write.mode(mode).partitionBy(*PARTITION_COLS).parquet(path)
    )


def read_level3(spark: SparkSession, path: str) -> DataFrame:
    """Read the silver layout back with canonical column types (partition
    directory values come back as inferred types — re-cast the int keys)."""
    df = spark.read.parquet(path)
    return df.withColumn("exchange_id", F.col("exchange_id").cast("int")) \
             .withColumn("pair_id", F.col("pair_id").cast("int")) \
             .drop("month")


# ------------------------------------------- book-checkpoint silver table --

CKPT_PARTITION_COLS = ["exchange_id", "pair_id", "era_us", "boundary_us"]


def write_checkpoints(ckpts: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Materialize a :func:`obadiah_spark.fold.book_checkpoints` frame as the
    write-once silver table the point-in-time probe reads (SURVEY §4.2.3; the
    reference materializes the same state as Q6's boundary clones /
    scheduled `order_book()` seeds rather than re-deriving per query).

    Partition layout: exchange_id / pair_id / era_us / boundary_us —
    era and boundary encoded as **unix-microsecond longs** so the directory
    values round-trip exactly (timestamps-as-strings would need fragile
    format parsing) and numeric partition filters prune. The full-fidelity
    ``era`` / ``period_start`` timestamp columns stay in the data files, so
    the read needs no reconstruction.
    """
    (
        ckpts
        .withColumn("era_us", F.unix_micros("era"))
        .withColumn("boundary_us", F.unix_micros("period_start"))
        .repartition("exchange_id", "pair_id", "era_us", "boundary_us")
        .sortWithinPartitions(*CKPT_PARTITION_COLS, "order_id")
        .write.mode(mode).partitionBy(*CKPT_PARTITION_COLS).parquet(path)
    )


def write_era_registry(l3: DataFrame, path: str) -> None:
    """Write the tiny era registry sidecar (``<path>/_eras``) next to the
    checkpoint table: distinct (exchange_id, pair_id, era) as
    unix-microsecond longs. The reference keeps the same catalog as
    ``obanalytics.level3_eras``; here it lets a point-in-time probe resolve
    "current era per pair" with a driver-side pyarrow read of one tiny file
    — no Spark job. The ``_``-prefixed directory is invisible to Spark's
    parquet reader, so it never pollutes :func:`read_checkpoints`."""
    import os

    (
        l3.select("exchange_id", "pair_id", F.unix_micros("era").alias("era_us"))
        .distinct().coalesce(1)
        .write.mode("overwrite").parquet(os.path.join(path, "_eras"))
    )


def checkpoint_metadata(path: str) -> dict:
    """Driver-side catalog lookup for the checkpoint silver table — the
    moral equivalent of a metastore partition listing, O(#directories), no
    Spark job. Returns ``{"eras": [(exchange_id, pair_id, era_us), ...],
    "boundaries": {(exchange_id, pair_id, era_us): sorted [boundary_us]}}``.
    """
    import os
    import re

    import pyarrow.parquet as pq

    eras_tbl = pq.read_table(os.path.join(path, "_eras"))
    eras = list(zip(*(eras_tbl.column(c).to_pylist()
                      for c in ("exchange_id", "pair_id", "era_us"))))
    pat = re.compile(
        r"exchange_id=(\d+)/pair_id=(\d+)/era_us=(\d+)/boundary_us=(\d+)$")
    boundaries: dict[tuple, list[int]] = {}
    for root, _dirs, _files in os.walk(path):
        m = pat.search(root.replace(os.sep, "/"))
        if m:
            e, p, era, b = (int(g) for g in m.groups())
            boundaries.setdefault((e, p, era), []).append(b)
    for v in boundaries.values():
        v.sort()
    return {"eras": eras, "boundaries": boundaries}


def resolve_probe(path: str, at_us: int) -> list[tuple]:
    """For a point-in-time probe at ``at_us``: per (exchange, pair), the
    current era (max era <= at) and the latest checkpoint boundary at or
    before ``at_us`` in that era (None when the era has no usable boundary
    — the probe then replays the era tail from its start). Driver-side
    metadata only."""
    meta = checkpoint_metadata(path)
    cur: dict[tuple, int] = {}
    for e, p, era in meta["eras"]:
        if era <= at_us and era > cur.get((e, p), -1):
            cur[(e, p)] = era
    out = []
    for (e, p), era in sorted(cur.items()):
        bs = [b for b in meta["boundaries"].get((e, p, era), []) if b <= at_us]
        out.append((e, p, era, bs[-1] if bs else None))
    return out


def read_checkpoints(spark: SparkSession, path: str,
                     at_ts: str | None = None) -> DataFrame:
    """Read the checkpoint silver table back with canonical types.

    ``at_ts`` pushes ``boundary_us <= at`` down onto the **partition**
    column, so a point-in-time probe lists only past-boundary directories
    (PartitionFilters in the plan — pytest-asserted): at 100 TB the probe
    reads one boundary's worth of open chains, never the checkpoint history.
    """
    df = spark.read.parquet(path)
    if at_ts is not None:
        at_us = F.unix_micros(F.lit(at_ts).cast("timestamp"))
        df = df.filter(F.col("boundary_us") <= at_us)
    return (
        df.withColumn("exchange_id", F.col("exchange_id").cast("int"))
        .withColumn("pair_id", F.col("pair_id").cast("int"))
        .drop("era_us", "boundary_us")
    )
