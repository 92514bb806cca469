"""Q6 insert_level3_era invariants (beyond the gate's hash check)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SPLIT_AT = "2024-01-10 00:00:00"


@pytest.fixture(scope="module")
def split(level3):
    from obadiah_spark.operators.repair import insert_level3_era

    return insert_level3_era(level3, SPLIT_AT).cache()


def test_split_creates_new_era_with_clones(level3, split):
    eras_before = {r.era for r in level3.select("era").distinct().collect()}
    eras_after = {r.era for r in split.select("era").distinct().collect()}
    new = eras_after - eras_before
    assert len(new) == 1 and str(next(iter(new))) == SPLIT_AT
    clones = split.filter(
        (F.col("era") == F.lit(SPLIT_AT).cast("timestamp"))
        & (F.col("microtimestamp") == F.lit(SPLIT_AT).cast("timestamp"))
        & (F.col("event_no") == 1) & (F.col("price_event_no") == 1)
    )
    assert clones.count() > 0


def test_split_preserves_book_state(level3, split):
    """The point of the clones: the live book at an instant after the split
    boundary keeps every order with a FINITE forward pointer across it.
    Ever-resting orders ('alive', next = +infinity) are NOT cloned — the
    reference's clone insert requires ``next_microtimestamp < 'infinity'``
    (db/obanalytics_schema.sql:1545-1546), so they drop out of the new era's
    book by design."""
    from obadiah_spark.operators.order_book import live_at

    at = "2024-01-12 00:00:00"
    cols = ["pair_id", "order_id", "side", "price", "amount"]
    orig = live_at(level3, at).select(*cols, "microtimestamp", "chain_state")
    # expected drops: book entries whose supporting event predates the split
    # and rests forever (nothing to clone a pointer to)
    ts = F.lit(SPLIT_AT).cast("timestamp")
    kept = orig.filter(
        ~((F.col("microtimestamp") < ts) & (F.col("chain_state") == "alive")))
    a = sorted(map(tuple, kept.select(*cols).collect()))
    b = sorted(map(tuple, live_at(split, at).select(*cols).collect()))
    assert a == b
    # the drop branch is non-vacuous on the synthetic data
    assert orig.count() > len(a)
    # and before the boundary the old era's history is untouched
    at0 = "2024-01-09 12:00:00"
    a0 = sorted(map(tuple, live_at(level3, at0).select(*cols).collect()))
    b0 = sorted(map(tuple, live_at(split, at0).select(*cols).collect()))
    assert a0 == b0


def test_split_chains_stay_audit_clean(split):
    from obadiah_spark.operators.quality import chain_audit

    issues = chain_audit(split)
    assert issues.count() == 0, issues.limit(20).collect()


def test_split_tail_clipped(split):
    """Old-era chains never point across the boundary any more."""
    ts = F.lit(SPLIT_AT).cast("timestamp")
    leak = split.filter(
        (F.col("era") < ts) & (F.col("next_microtimestamp") >= ts))
    assert leak.count() == 0
