"""Persisted IVF-PQ index: query-path parity with the in-memory
operator (bit-identical — same ADC fold, tiebreaks, adaptive depth)
and the layout property the index exists for: the vectors scan carries
a dynamic partition-pruning expression on cell, so a query reads only
its probed cell directories."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")


def _emb(spark, sf_dir):
    from obadiah_spark.session import read_table

    try:
        return read_table(spark, sf_dir, "embeddings")
    except Exception:
        return spark.read.parquet(os.path.join(sf_dir,
                                               "embeddings.parquet"))


def test_indexed_query_matches_inmemory(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from obadiah_spark.pipelines.similarity import (ann_ivfpq,
                                                    ann_ivfpq_query,
                                                    write_ivfpq_index)

    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(emb, path, train_pq=True)
    cb = spark.read.parquet(os.path.join(path, "codebook"))
    subcb = spark.read.parquet(os.path.join(path, "subcodebook"))
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    got = (ann_ivfpq_query(spark, path, q, k=5).toPandas()
           .sort_values(["q_id", "rank"]).reset_index(drop=True))
    want = (ann_ivfpq(emb, 10, 5, codebook=cb, subcodebook=subcb)
            .toPandas().sort_values(["q_id", "rank"])
            .reset_index(drop=True))
    assert len(got) == 50
    assert got.equals(want)


def test_indexed_query_prunes_cell_partitions(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from obadiah_spark.pipelines.similarity import (ann_ivfpq_query,
                                                    write_ivfpq_index)

    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "ivfpq_p")
    write_ivfpq_index(emb, path, train_pq=False)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    df = ann_ivfpq_query(spark, path, q, k=5)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    # the probe join must reach the partitioned scan as a dynamic
    # partition-pruning filter on cell — the "read only probed
    # directories" guarantee, asserted on the plan like the silver
    # layout's PartitionFilters test
    assert "dynamicpruning" in plan, plan[:2000]
    assert df.count() > 0
