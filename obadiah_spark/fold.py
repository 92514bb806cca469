"""The one custom physical primitive: ordered stateful fold per (pair, era).

Reference parity:
- B2/B3/B5 ``order_book_by_episode`` + ``_order_book_after_episode`` — running
  book fold grouped into per-microtimestamp episodes
  (reference db/obanalytics_schema.sql:2084-2126, step fn :920-970; C episode
  iterator db/c/obadiah_db/episode.cpp:44-159; C book
  db/c/obadiah_db/order_book.cpp:22-174).
- D6 ``spread_by_episode_fast`` — level1 emitted only on change
  (reference db/c/obadiah_db/obadiah_db.cpp:270-363).
- D1 ``depth_change_by_episode_fast`` — level2 (price, side) volume changes per
  episode (reference db/obanalytics_schema.sql:1225-1230, change detection
  db/c/obadiah_db/order_book.cpp:60-88).

Spark-first design
------------------
``groupBy(pair, exchange, era).applyInPandas(fold)``: Spark shuffles once on
the fold keys, each group arrives as one Arrow batch, the fold is a linear
scan. Parallelism axis = (exchange, pair, era) — the reference's own
decomposition (``_periods_within_eras``, db/obanalytics_schema.sql:979-1005):
book state never crosses an era boundary, so eras are embarrassingly parallel.
At 100 TB the unit of serial work is one era of one pair (bounded by capture
session length); a single giant era serializes its own fold only — callers can
additionally split on period boundaries exactly as the reference does.

State is O(open orders) per book plus O(price levels) for depth — both small
(≤1e5) regardless of event count, so executor memory is bounded even for
billion-event eras; only the *scan* is linear.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

FOLD_KEYS = ("pair_id", "exchange_id", "era")
EVENT_ORDER = ["microtimestamp", "order_id", "event_no"]

SPREAD_SCHEMA = (
    "pair_id int, era timestamp, microtimestamp timestamp, best_bid_price double, "
    "best_bid_qty double, best_ask_price double, best_ask_qty double"
)

DEPTH_SCHEMA = (
    "pair_id int, microtimestamp timestamp, side string, price double, "
    "volume double, volume_change double"
)


def ordered_fold(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
    keys: tuple[str, ...] = FOLD_KEYS,
    order: list[str] | None = None,
) -> DataFrame:
    """Apply ``fn`` to each key group as one pandas frame sorted by ``order``.

    One shuffle on ``keys``; Arrow-batched transfer; ``fn`` must be a pure
    function of the sorted group (no cross-group state).
    """
    order_cols = EVENT_ORDER if order is None else order

    def runner(pdf: pd.DataFrame) -> pd.DataFrame:
        return fn(pdf.sort_values(order_cols, kind="mergesort"))

    return df.groupBy(*keys).applyInPandas(runner, schema)


class _Events:
    """Columnar view of one sorted group: numpy arrays + episode slicing.

    Iterating episodes as pandas sub-frames costs ~1 ms *per episode* in
    frame construction; at one episode per book tick that dominates the whole
    fold. Numpy boundary detection + index ranges is ~100× cheaper.
    """

    def __init__(self, pdf: pd.DataFrame) -> None:
        self.ts = pdf["microtimestamp"].to_numpy()
        self.order_id = pdf["order_id"].to_numpy()
        self.side = pdf["side"].to_numpy()
        self.price = pdf["price"].to_numpy()
        self.amount = pdf["amount"].to_numpy()
        self.deleted = (pdf["chain_state"] == "deleted").to_numpy()

    def episodes(self) -> Iterator[tuple[object, int, int]]:
        """Yield (ts, start, end) per microtimestamp episode (B5 semantics:
        all events sharing one microtimestamp are applied atomically)."""
        n = len(self.ts)
        if n == 0:
            return
        starts = np.flatnonzero(np.concatenate(([True], self.ts[1:] != self.ts[:-1])))
        bounds = np.append(starts, n)
        for k in range(len(starts)):
            yield self.ts[starts[k]], int(bounds[k]), int(bounds[k + 1])


class _Book:
    """In-memory book for one (pair, exchange, era): order dict + per-(side,
    price) level sums, mirroring the reference's order_book_side structure
    (hash by order_id + price-keyed aggregation,
    db/c/obadiah_db/order_book.cpp:22-174). Exact-quarter/cent arithmetic on
    the synthetic data keeps level sums bit-exact; ``_ZERO_TOL`` guards float
    residue on general data."""

    _ZERO_TOL = 1e-12

    def __init__(self) -> None:
        self.orders: dict[int, tuple[str, float, float]] = {}
        self.levels: dict[tuple[str, float], float] = {}
        self.touched: set[tuple[str, float]] = set()

    def _level_add(self, side: str, price: float, dq: float) -> None:
        key = (side, price)
        q = self.levels.get(key, 0.0) + dq
        if abs(q) <= self._ZERO_TOL:
            self.levels.pop(key, None)
        else:
            self.levels[key] = q
        self.touched.add(key)

    def apply(self, order_id: int, side: str, price: float, amount: float, deleted: bool) -> None:
        prev = self.orders.pop(order_id, None)
        if prev is not None:
            self._level_add(prev[0], prev[1], -prev[2])
        if not deleted:
            self.orders[order_id] = (side, price, amount)
            self._level_add(side, price, amount)

    def best(self, side: str) -> tuple[float | None, float | None]:
        prices = [p for (s, p) in self.levels if s == side]
        if not prices:
            return None, None
        best = max(prices) if side == "b" else min(prices)
        return best, self.levels[(side, best)]

    def take_touched(self) -> list[tuple[str, float]]:
        t = sorted(self.touched)
        self.touched.clear()
        return t


def _spread_fold_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """D6: emit level1 (best bid/ask price+qty) only when it changes."""
    book = _Book()
    pair_id = int(pdf["pair_id"].iloc[0]) if len(pdf) else None
    era = pdf["era"].iloc[0] if len(pdf) else None
    ev = _Events(pdf)
    out: dict[str, list] = {c: [] for c in (
        "pair_id", "era", "microtimestamp", "best_bid_price", "best_bid_qty",
        "best_ask_price", "best_ask_qty")}
    prev = None
    apply_, best = book.apply, book.best
    for ts, s, e in ev.episodes():
        for i in range(s, e):
            apply_(ev.order_id[i], ev.side[i], ev.price[i], ev.amount[i], ev.deleted[i])
        bb, bbq = best("b")
        ba, baq = best("s")
        cur = (bb, bbq, ba, baq)
        # a still-empty book emits nothing (a no-op leading episode is not a
        # level1 change; the declarative forms have no such timestamp either)
        if prev is None and cur == (None, None, None, None):
            continue
        if cur != prev:
            out["pair_id"].append(pair_id)
            out["era"].append(era)
            out["microtimestamp"].append(ts)
            out["best_bid_price"].append(bb)
            out["best_bid_qty"].append(bbq)
            out["best_ask_price"].append(ba)
            out["best_ask_qty"].append(baq)
            prev = cur
    return pd.DataFrame(out)


def _depth_fold_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """D1: per-episode (price, side) volume + change, only for levels whose
    volume actually changed (skips no-change episodes entirely)."""
    book = _Book()
    pair_id = int(pdf["pair_id"].iloc[0]) if len(pdf) else None
    ev = _Events(pdf)
    emitted: dict[tuple[str, float], float] = {}
    out: dict[str, list] = {c: [] for c in (
        "pair_id", "microtimestamp", "side", "price", "volume", "volume_change")}
    apply_ = book.apply
    for ts, s, e in ev.episodes():
        for i in range(s, e):
            apply_(ev.order_id[i], ev.side[i], ev.price[i], ev.amount[i], ev.deleted[i])
        for key in book.take_touched():
            vol = book.levels.get(key, 0.0)
            prev = emitted.get(key, 0.0)
            if vol != prev:
                out["pair_id"].append(pair_id)
                out["microtimestamp"].append(ts)
                out["side"].append(key[0])
                out["price"].append(key[1])
                out["volume"].append(vol)
                out["volume_change"].append(vol - prev)
                if vol == 0.0:
                    emitted.pop(key, None)
                else:
                    emitted[key] = vol
    return pd.DataFrame(out)


_EVENT_COLS = [
    "pair_id", "exchange_id", "era",
    "microtimestamp", "order_id", "event_no", "side", "price", "amount", "chain_state",
]


def spread_fold(l3: DataFrame) -> DataFrame:
    """The 100 TB level1 path: one shuffle on (pair, exchange, era), linear
    scan per group, output compressed by emit-on-change (10-100× smaller)."""
    return ordered_fold(l3.select(*_EVENT_COLS), _spread_fold_pdf, SPREAD_SCHEMA)


def depth_change_fold(l3: DataFrame) -> DataFrame:
    """The 100 TB level2 path (D1)."""
    return ordered_fold(l3.select(*_EVENT_COLS), _depth_fold_pdf, DEPTH_SCHEMA)
