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

from obadiah_spark.fold import EpisodeFolder, stream_fold

DEPTH_CHAINS_SCHEMA = (
    "pair_id int, microtimestamp timestamp, side string, price double, "
    "volume double, volume_change double, chain_id bigint, "
    "bid_price double, ask_price double"
)


class _DepthChainsFolder(EpisodeFolder):
    OUT_COLS = ("pair_id", "microtimestamp", "side", "price", "volume",
                "volume_change", "chain_id", "bid_price", "ask_price")

    def __init__(self, meta: pd.Series) -> None:
        super().__init__(meta)
        self.chains: dict[tuple[str, float], int] = {}  # (side, |change|) -> id
        self.next_id = 1
        self._pre_bb = None
        self._pre_ba = None

    def on_episode_start(self, ts) -> None:
        # spread BEFORE this episode's updates are applied
        self._pre_bb = self.book.best("b")[0]
        self._pre_ba = self.book.best("s")[0]

    def on_episode(self, ts) -> None:
        out = self.out
        for key, vol, prev in self.changed_levels():
            change = vol - prev
            ck = (key[0], abs(change))
            cid = self.chains.get(ck)
            if cid is None:
                self.chains[ck] = cid = self.next_id
                self.next_id += 1
            out["pair_id"].append(self.pair_id)
            out["microtimestamp"].append(ts)
            out["side"].append(key[0])
            out["price"].append(key[1])
            out["volume"].append(vol)
            out["volume_change"].append(change)
            out["chain_id"].append(cid)
            out["bid_price"].append(self._pre_bb)
            out["ask_price"].append(self._pre_ba)


def depth_changes_with_chains(l3: DataFrame) -> DataFrame:
    cols = ["pair_id", "exchange_id", "era", "microtimestamp", "order_id",
            "event_no", "side", "price", "amount", "chain_state"]
    return stream_fold(l3.select(*cols), _DepthChainsFolder, DEPTH_CHAINS_SCHEMA)
