"""Training-sequence packing ON INGEST — the streaming twin of
:func:`obadiah_spark.pipelines.packing.pack_sequences`, completing the
shard pipeline's last mile: documents arriving on a stream are assigned
to (shard, seq_no, offset) slots the moment they arrive, so shard
writers can append to open training sequences without a batch re-pack.

State discipline: the fold is keyed by SHARD, and the state is three
scalars (open-sequence number, fill, open flag) — cardinality is the
shard count, a configuration constant, so state is O(n_shards) forever
and needs NO TTL/eviction (unlike the dedup/sessionize states, whose
key spaces grow with the data; same reasoning as the batch operator's
"fold memory = three integers per shard").

Exactness contract (the repo's streaming rule): next-fit packing is
sequential per shard, so batch ≡ stream REQUIRES per-shard
non-decreasing doc_id arrival — exactly the per-key ordered-replay
contract the event-time reorderer (streaming/reorder.py) provides in
production, and the same contract the sessionize/corpus gates replay
under.  Within a micro-batch rows are sorted by doc_id; across
micro-batches the contract carries the order.  Every document emits its
row in the micro-batch it arrives in (packing output is per document,
not per closed sequence, so no flush sentinel is needed).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (BooleanType, IntegerType, LongType,
                               StructField, StructType)

from obadiah_spark.pipelines.packing import (PACK_BUDGET, PACK_SHARDS,
                                             _token_counts)

PACK_OUT_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("shard", IntegerType()),
    StructField("seq_no", LongType()),
    StructField("offset", LongType()),
    StructField("n_tokens", LongType()),
    StructField("overflow", BooleanType()),
])
_STATE_SCHEMA = StructType([
    StructField("seq_no", LongType()),
    StructField("fill", LongType()),
    StructField("open", BooleanType()),
])


def _fold_factory(budget: int):
    """The per-shard stateful fold (exposed for fake-state unit
    tests, the sessionize precedent)."""

    def fold(key: tuple, pdfs: Iterable[pd.DataFrame],
             state: GroupState) -> Iterator[pd.DataFrame]:
        (shard,) = key
        if state.exists:
            seq_no, fill, open_ = state.get
        else:
            seq_no, fill, open_ = 0, 0, False
        out = []
        # the group may arrive as MULTIPLE Arrow chunks whose relative
        # order is arbitrary — sorting each chunk alone would fold
        # cross-chunk doc_ids out of order (the batch twin receives the
        # whole group as one frame), so concat first, sort once
        chunks = list(pdfs)
        if chunks:
            whole = (pd.concat(chunks) if len(chunks) > 1
                     else chunks[0]).sort_values("doc_id")
            for doc_id, n_tok in zip(whole["doc_id"], whole["n_tokens"]):
                n_tok = int(n_tok)
                if not open_ or fill + n_tok > budget:
                    seq_no += 1
                    offset = 0
                    fill = n_tok
                    open_ = True
                else:
                    offset = fill
                    fill += n_tok
                out.append((int(doc_id), int(shard), seq_no, offset,
                            n_tok, n_tok > budget))
        state.update((int(seq_no), int(fill), bool(open_)))
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in
                                             PACK_OUT_SCHEMA])

    return fold


def pack_stream(docs: DataFrame, budget: int = PACK_BUDGET,
                n_shards: int = PACK_SHARDS) -> DataFrame:
    """Streaming packing over a frame with columns (doc_id, text):
    emits the batch operator's row per document as it arrives.  Under
    per-shard doc_id-ordered arrival the cumulative output equals
    ``pack_sequences`` on the same documents (pytest differential)."""
    counts = (_token_counts(docs)
              .withColumn("shard", F.pmod(F.col("doc_id"),
                                          F.lit(n_shards)).cast("int")))
    return (counts.groupBy("shard")
            .applyInPandasWithState(_fold_factory(budget),
                                    PACK_OUT_SCHEMA, _STATE_SCHEMA,
                                    "append",
                                    GroupStateTimeout.NoTimeout))
