"""I2/I3 invariant: update(before, diff(before, after)) == after, using two
real snapshots of the synthetic book 3 days apart."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from obadiah_spark.operators.book_ops import diff_order_books, update_order_book  # noqa: E402
from obadiah_spark.operators.order_book import live_at  # noqa: E402
from tools.verify_local import compare  # noqa: E402

COLS = ["pair_id", "order_id", "side", "price", "amount"]


def test_diff_then_update_roundtrip(level3):
    before = live_at(level3, "2024-01-10 00:00:00").select(*COLS)
    after = live_at(level3, "2024-01-13 00:00:00").select(*COLS)
    assert before.count() > 0 and after.count() > 0
    diff = diff_order_books(before, after)
    rebuilt = update_order_book(before, diff)
    assert not compare("roundtrip", rebuilt.toPandas(), after.toPandas())


def test_diff_is_minimal(level3):
    book = live_at(level3, "2024-01-10 00:00:00").select(*COLS)
    assert diff_order_books(book, book).count() == 0
