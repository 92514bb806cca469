"""A/B evidence for the semdedup salt rework (VERDICT r13 task #5).

The one-sided salt exploded the a side's EMBEDDING VECTORS into all R
buckets, so salt shuffle bytes scaled R × corpus × dim; the two-sided
⌈√R⌉×⌈√R⌉ grid (now production, ``pipelines/dedup.py``) replicates each
side's payload only ⌈√R⌉ times at the same n_cells × R join
parallelism.  This probe runs BOTH pair stages over the same
cell-assigned frame with R forced to a cluster-scale value (local R is
only ceil(2·32/16) = 4; 1000 executors ≈ 2·8000/16 = 1000 — default 64
here keeps the probe tractable while making the payload ratio visible),
and records:

* wall seconds per variant,
* total shuffle WRITE bytes per variant (Spark status REST API — the
  probe session enables the UI for exactly this; broadcast joins are
  disabled so both variants take the shuffle path a 100 TB corpus
  forces anyway),
* the pair count and an order-insensitive pair-set checksum
  (sum of xxhash64(b_id, a_id, cos) as decimal) — bit-identical output
  is the correctness clause of the A/B.

Usage:  python tools/semdedup_salt_ab.py [sf_dir] [factor] [R]
Prints one JSON line; the SCALE.md §7 r14 section records the result.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _shuffle_write_bytes(spark) -> int:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages"
    with urllib.request.urlopen(url) as fh:
        stages = json.load(fh)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    r = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    from pyspark.sql import SparkSession, functions as F

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("semdedup_salt_ab")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "true")  # REST stage metrics
        # both variants must take the shuffle path (at 100 TB neither
        # side is broadcastable), or the byte comparison is vacuous
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    from obadiah_spark.pipelines.similarity import (_cosine, _rank_cells,
                                                    train_ivf_codebook)
    from tools.scale_probe import build_embs

    work = "/tmp/semdedup_salt_ab"
    os.makedirs(work, exist_ok=True)
    emb = spark.read.parquet(build_embs(spark, sf_dir, work, factor))
    cb = train_ivf_codebook(emb)
    assign = (_rank_cells(emb.select("vec_id", "embedding"), cb,
                          "vec_id", "embedding")
              .filter(F.col("cr") == 1).select("vec_id", "cell"))
    paired = (emb.select("vec_id", "embedding").join(assign, "vec_id")
              .localCheckpoint())

    def one_sided():  # the pre-r14 salt, reconstructed for the A/B
        a = paired.select(
            "cell", F.col("vec_id").alias("a_id"),
            F.col("embedding").alias("a_emb"),
            F.explode(F.array(*[F.lit(i) for i in range(r)])).alias("bkt"))
        b = paired.select(
            "cell", F.col("vec_id").alias("b_id"),
            F.col("embedding").alias("b_emb"),
            F.pmod(F.col("vec_id"), F.lit(r)).alias("bkt"))
        return (a.join(b, ["cell", "bkt"])
                .filter(F.col("a_id") < F.col("b_id"))
                .select("b_id", "a_id",
                        _cosine("a_emb", "b_emb").alias("cos")))

    def two_sided():  # the production grid (pipelines/dedup.py)
        s = math.isqrt(r - 1) + 1 if r > 1 else 1
        grid = F.array(*[F.lit(i) for i in range(s)])
        a = paired.select(
            "cell", F.col("vec_id").alias("a_id"),
            F.col("embedding").alias("a_emb"),
            F.pmod(F.col("vec_id"), F.lit(s)).alias("abk"),
            F.explode(grid).alias("bbk"))
        b = paired.select(
            "cell", F.col("vec_id").alias("b_id"),
            F.col("embedding").alias("b_emb"),
            F.explode(grid).alias("abk"),
            F.pmod(F.col("vec_id"), F.lit(s)).alias("bbk"))
        return (a.join(b, ["cell", "abk", "bbk"])
                .filter(F.col("a_id") < F.col("b_id"))
                .select("b_id", "a_id",
                        _cosine("a_emb", "b_emb").alias("cos")))

    def run(df) -> dict:
        before = _shuffle_write_bytes(spark)
        t0 = time.time()
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("b_id", "a_id", "cos")
                  .cast("decimal(38,0)")).alias("chk")).collect()[0]
        wall = time.time() - t0
        return {"pairs": int(row.n), "checksum": str(row.chk),
                "wall_s": round(wall, 2),
                "shuffle_write_bytes": _shuffle_write_bytes(spark) - before}

    # SALT_AB_VARIANT=one|two runs a single variant — used to show the
    # heap asymmetry (the one-sided salt OOMs a small-heap worker at
    # cluster R where the two-sided grid completes: compressed shuffle
    # FILES hide much of the replication — identical copies compress —
    # but the deserialized in-memory payload does not)
    pick = os.environ.get("SALT_AB_VARIANT", "both")
    out: dict = {"sf_base": sf_dir, "factor": factor, "forced_r": r,
                 "s": math.isqrt(r - 1) + 1 if r > 1 else 1,
                 "n_vectors": paired.count()}
    if pick in ("one", "both"):
        out["one_sided"] = run(one_sided())
    if pick in ("two", "both"):
        out["two_sided"] = run(two_sided())
    if pick == "both":
        res_a, res_b = out["one_sided"], out["two_sided"]
        out["values_bit_identical"] = (
            res_a["pairs"] == res_b["pairs"]
            and res_a["checksum"] == res_b["checksum"])
        out["shuffle_bytes_ratio"] = round(
            res_b["shuffle_write_bytes"]
            / max(res_a["shuffle_write_bytes"], 1), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
