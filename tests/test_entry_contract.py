"""Gate-contract guard: every registered query must be oracle-backed (or
carry a documented exemption), and the rotation must keep every entry
driver-verified within two rounds (VERDICT r5 process note)."""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

# Approximate-by-design operators whose output is intentionally not
# SQL-reproducible; each MUST have a gate-checked companion metric bounding
# it (listed as the value, which must itself be oracle-backed).
NO_ORACLE = {
    "ann_lsh_pairs": "ann_lsh_recall",
}


def test_every_query_is_oracle_backed():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    missing = [k for k in qs if k not in oracles and k not in NO_ORACLE]
    assert not missing, f"queries without oracle or exemption: {missing}"


def test_exemptions_have_gate_checked_bounds():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    for k, bound in NO_ORACLE.items():
        assert k in qs, f"exemption {k} is not even registered"
        assert bound in qs and bound in oracles, (
            f"{k} is exempt but its bounding metric {bound} is not "
            f"oracle-backed")


def test_no_orphan_oracles():
    qs = entry.queries()
    orphans = [k for k in entry.oracle_sql() if k not in qs]
    assert not orphans, f"oracles without a query: {orphans}"


def test_rotation_priority_sections_fit_the_driver_cap():
    """The driver records only the first 50 entries; the never-checked and
    previously-rotated sections must all be inside that window."""
    keys = list(entry.queries())
    must_be_checked_this_round = [
        # never driver-checked before r6 + rotated out of r5's 50
        "match_audit", "repair_missing_fill", "reveal_episodes",
        "fix_aggressor_order", "bs_capture_orders", "capture_trades",
        "episode_framing", "capture_raw_book", "cleanse_order",
        "symbol_upsert", "move_audit", "insert_era", "csv_roundtrip",
        "move_events", "move_trades", "staging_summary", "depth_chains",
    ]
    head = set(keys[:50])
    late = [k for k in must_be_checked_this_round if k not in head]
    assert not late, f"priority entries past the driver's 50-slot cap: {late}"
