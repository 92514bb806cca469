"""D10 ``depth.changes`` — depth updates → changes with heuristic chain ids.

Reference parity: Rcpp ``DepthChanges`` (src/order_book_investigation.h:277-355;
R wrapper R/obanalytics.R:323-334): each level change gets
- ``volume_change`` = new level volume − current book volume at that price,
- a ``chain_id`` linking related changes: per side, a map |change| → id; an
  unseen |change| magnitude allocates the next id (ids shared across both
  sides' maps via one counter),
- the prevailing best bid/ask AT EPISODE START (spread before the episode's
  updates are applied).

Sequential per (pair, exchange, era) → the book fold. Deterministic order:
events in (microtimestamp, order_id, event_no); changed levels in sorted
(side, price) order — the id sequence is reproducible run to run.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

from obadiah_spark.fold import _Book, _Events, ordered_fold

DEPTH_CHAINS_SCHEMA = (
    "pair_id int, microtimestamp timestamp, side string, price double, "
    "volume double, volume_change double, chain_id bigint, "
    "bid_price double, ask_price double"
)


def depth_changes_with_chains(l3: DataFrame) -> DataFrame:
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        book = _Book()
        pair_id = int(pdf["pair_id"].iloc[0]) if len(pdf) else None
        ev = _Events(pdf)
        emitted: dict = {}
        chains: dict[tuple[str, float], int] = {}  # (side, |change|) -> id
        next_id = 1
        out: dict[str, list] = {c: [] for c in (
            "pair_id", "microtimestamp", "side", "price", "volume",
            "volume_change", "chain_id", "bid_price", "ask_price")}
        for ts, s, e in ev.episodes():
            bb = book.best("b")[0]   # spread BEFORE this episode
            ba = book.best("s")[0]
            for i in range(s, e):
                book.apply(ev.order_id[i], ev.side[i], ev.price[i],
                           ev.amount[i], ev.deleted[i])
            for key in book.take_touched():
                vol = book.levels.get(key, 0.0)
                prev = emitted.get(key, 0.0)
                if vol == prev:
                    continue
                change = vol - prev
                ck = (key[0], abs(change))
                cid = chains.get(ck)
                if cid is None:
                    chains[ck] = cid = next_id
                    next_id += 1
                out["pair_id"].append(pair_id)
                out["microtimestamp"].append(ts)
                out["side"].append(key[0])
                out["price"].append(key[1])
                out["volume"].append(vol)
                out["volume_change"].append(change)
                out["chain_id"].append(cid)
                out["bid_price"].append(bb)
                out["ask_price"].append(ba)
                if vol == 0.0:
                    emitted.pop(key, None)
                else:
                    emitted[key] = vol
        return pd.DataFrame(out)

    cols = ["pair_id", "exchange_id", "era", "microtimestamp", "order_id",
            "event_no", "side", "price", "amount", "chain_state"]
    return ordered_fold(l3.select(*cols), fn, DEPTH_CHAINS_SCHEMA)
