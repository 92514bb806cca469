"""The synthesized level3 log must (a) be identical on Spark and DuckDB —
it is the foundation of every oracle — and (b) satisfy the reference's
declared chain invariants (db/obanalytics_schema.sql:146-151, 2346-2426)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from obadiah_spark.synth import LEVEL3_BODY_SQL  # noqa: E402
from tools.verify_local import compare  # noqa: E402


def test_level3_identical_on_both_engines(spark, duck, level3):
    spark_pdf = level3.toPandas()
    duck_pdf = duck.sql(LEVEL3_BODY_SQL).df()
    problems = compare("level3", spark_pdf, duck_pdf)
    assert not problems, "\n".join(problems)


def test_chain_invariants(level3):
    from pyspark.sql import functions as F

    l3 = level3
    # price/amount ≥ 0
    assert l3.filter((F.col("price") <= 0) | (F.col("amount") < 0)).count() == 0
    # (order_id, era, event_no) unique
    dup = l3.groupBy("order_id", "era", "event_no").count().filter("count > 1")
    assert dup.count() == 0
    # chained events: next_microtimestamp strictly after and next_event_no = event_no + 1
    bad_next = l3.filter(
        (F.col("chain_state") == "chained")
        & (
            F.col("next_microtimestamp").isNull()
            | (F.col("next_microtimestamp") <= F.col("microtimestamp"))
            | (F.col("next_event_no") != F.col("event_no") + 1)
        )
    )
    assert bad_next.count() == 0
    # terminal events carry no next pointer
    bad_term = l3.filter(
        F.col("chain_state").isin("alive", "deleted") & F.col("next_microtimestamp").isNotNull()
    )
    assert bad_term.count() == 0
    # no orphans: every event_no > 1 has a predecessor in the same (order, era)
    a = l3.alias("a")
    b = l3.alias("b")
    orphans = a.filter("a.event_no > 1").join(
        b,
        (F.col("a.order_id") == F.col("b.order_id"))
        & (F.col("a.era") == F.col("b.era"))
        & (F.col("a.event_no") == F.col("b.event_no") + 1),
        "left_anti",
    )
    assert orphans.count() == 0
    # eras: chains never span eras (era = week of microtimestamp by construction)
    bad_era = l3.filter(F.date_trunc("week", F.col("microtimestamp")) != F.col("era"))
    assert bad_era.count() == 0
    # fill consistency: fill = prev.amount − amount
    w_bad = l3.filter("event_no = 1 AND fill IS NOT NULL")
    assert w_bad.count() == 0
