"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); the design
target is a 1000-executor cluster reading ~100 TB, so every config here is
chosen to also make sense at that scale (AQE, adaptive coalescing/skew-join,
Arrow for the pandas-fold path, UTC session time for oracle comparability).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "obadiah_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None):
    """Load driver parquet tables and register them as temp views.

    Returns a dict name -> DataFrame. Registering views lets both the
    DataFrame API and spark.sql() paths share one catalog.
    """
    if names is None:
        names = (
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        )
    out = {}
    for name in names:
        df = read_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def read_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one driver parquet table, normalizing the ``ts`` timestamp type.

    The driver's ``events.parquet`` has stored ``ts`` as TIMESTAMP(NANOS)
    (which the Spark parquet reader rejects — read nanos as long via
    ``spark.sql.legacy.parquet.nanosAsLong`` and floor-divide to µs with
    integer DIV; a double division would lose precision at ~1.7e18) and as
    TIMESTAMP(MICROS, isAdjustedToUTC=false) (which Spark reads as
    TIMESTAMP_NTZ — cast to the session-UTC TIMESTAMP so ``unix_micros`` and
    LTZ literal comparisons resolve). Either way the values match what DuckDB
    reads, so oracles agree.
    """
    from pyspark.sql import functions as F  # local import keeps module import cheap
    from pyspark.sql import types as T

    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        for f in df.schema.fields:
            if f.name == "ts":
                if isinstance(f.dataType, T.LongType):
                    df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
                elif isinstance(f.dataType, T.TimestampNTZType):
                    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)
