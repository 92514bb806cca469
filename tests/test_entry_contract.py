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


def _latest_correctness() -> tuple[str, dict]:
    """The newest CORRECTNESS_r*.json at the repo root (the last driver
    verdict available when the current ordering was authored)."""
    import glob
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    assert files, "no driver correctness files found"
    with open(files[-1]) as fh:
        return files[-1], json.load(fh)


def test_rotation_age_bound():
    """Driver-row age bound (VERDICT r6 task #1): the driver records only
    the first 50 entries, so every entry PAST the cap must already have a
    green row in the latest driver correctness file — otherwise its last
    driver verification would age past two rounds before the next cap.

    New entries (registered after the latest driver run) must sit inside
    the 50-slot window so they get their first row immediately."""
    keys = list(entry.queries())
    head = set(keys[:50])
    path, latest = _latest_correctness()
    stale = []
    for k in keys[50:]:
        row = latest.get(k)
        green = bool(row) and row.get("rows_match") and not row.get("err")
        if not green:
            stale.append(k)
    assert not stale, (
        f"entries past the driver's 50-slot cap without a green row in "
        f"{os.path.basename(path)} (their driver verification would age "
        f"past two rounds): {stale}")
