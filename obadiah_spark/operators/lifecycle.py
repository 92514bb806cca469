"""Incremental / scheduled matching lifecycle (SURVEY §3.4).

Reference parity — the reference re-runs trade matching every few minutes
over a bounded chunk with a delay guard, resuming from its own link state:

- ``bitfinex.pga_match`` (reference db/bitfinex_schema.sql:748-846): frame
  = [last linked match, newest match − p_delay('2 min')], capped at
  p_max_interval('2 h'); first run (no links yet) starts at the oldest
  match and covers at most one max_interval. Inside the frame it runs
  ``match_price_and_fill_exact`` then ``match_price_and_sum_of_fill_exact``
  (I5 then I6 on the residual).
- ``bitstamp.pga_match`` (reference db/bitstamp_schema.sql:1780-1872):
  same resume-from-last-link shape (v_start = max linked microtimestamp)
  driving I9/I10.

This module is the batch embodiment of that scheduler loop: a driver-side
chunk cursor stands in for the cron cadence (documented deviation — the
reference's advisory locks and pgagent jobs are orchestration, out of
scope per SURVEY §2.6; the QUERY content per chunk is what's reproduced),
and the reference's in-place UPDATEs become recompute-and-return link
frames (the repo-wide convention).

Chunked ≡ one-shot, exactly
---------------------------
The I5 link rule is a pure local property: (trade T, event E) is a link
iff E is T's argmin candidate event (events in [T, T+max_delay]) AND T is
E's argmin candidate trade (trades in [E−max_delay, E]) — the dual
row_number filter has no cascading (a loser is dropped, never re-ranked).
So a chunk that evaluates I5 over trades in [lo − slack, hi + slack] with
slack >= max_delay and keeps only links with trade_microtimestamp in
(lo, hi] reproduces the one-shot result restricted to (lo, hi] exactly,
and chunks tile without overlap or loss.

I6 adds run structure (sets = maximal adjacent same-(price, origination)
trade runs) and group contests (one group per event, earliest group_ts;
no-reuse minimality among groups sharing a member — both confined to a
single run ± max_delay). A chunk that evaluates I6 over trades in
[lo − L, hi + L] and keeps whole GROUPS by their group_ts (the last
member's timestamp) in (lo, hi] therefore tiles exactly too, PROVIDED
L >= (longest trade run duration + max_delay) — the exactness
precondition, asserted against the fabric in tests/test_lifecycle.py.
Groups are kept atomically (all member links or none), matching the
reference's per-group UPDATE.

Later trades never steal an I5 contest from earlier ones (the contest
orders by trade_microtimestamp ascending), so the delay-tail trades —
visible to the last chunk's extended window but past its keep bound —
cannot perturb kept links; the one-shot oracle may equivalently filter
trades to <= (newest − delay) for I5 while leaving the I6 run fabric
unfiltered and bounding groups by group_ts (see
``incremental_match_oracle_sql``).

Scale: each step touches only the chunk ± horizon — the level3 scan is
pruned to it (predicate pushdown on microtimestamp), the matchers shuffle
on (pair, era, price/fill) within the chunk, and accumulated links are
lineage-cut per step (localCheckpoint), so a month of backlog replays as
a sequence of bounded jobs instead of one unbounded one. State = the link
frame itself (resume is max linked trade ts), so a restart resumes and a
replay is idempotent (re-running over already-linked ground produces the
same links, merged by key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from obadiah_spark.operators.matching import (
    match_fill_exact_oracle_sql,
    match_price_and_fill_exact,
    match_sequential,
    match_sequential_body_sql,
    match_sequential_pairs_sql,
    match_sum_of_fills,
    match_sum_of_fills_oracle_sql,
    sequential_event_pairs,
)

# reference defaults: p_delay '00:02:00', p_max_interval '02:00:00'
# (db/bitfinex_schema.sql:748); the gate uses a larger max_interval so the
# synthetic month still spans multiple chunks without thousands of steps.
DELAY_US = 120_000_000
MAX_INTERVAL_US = 7_200_000_000

_LINK_COLS = ["pair_id", "exchange_trade_id", "trade_microtimestamp",
              "event_microtimestamp", "order_id", "event_no", "side",
              "price", "fill"]


def match_frame(trades: DataFrame, linked: DataFrame | None,
                cursor_us: int | None = None,
                delay_us: int = DELAY_US,
                max_interval_us: int = MAX_INTERVAL_US,
                ) -> tuple[int, int] | None:
    """One ``pga_match`` frame decision: ``(o_start_us, o_end_us]`` or None.

    Mirrors reference db/bitfinex_schema.sql:788-811: resume from the last
    linked trade if any (else the oldest trade), stop ``delay_us`` before
    the newest trade (first run: at most one ``max_interval_us`` from the
    start), cap the chunk at ``max_interval_us``. ``cursor_us`` is the
    batch driver's progress cursor (max of all previous o_ends) — it
    guarantees termination when a chunk yields no links, which the
    reference delegates to its cron cadence. Three scalar aggregates;
    driver-side by design (the scheduler's frame decision, catalog-lookup
    class)."""
    b = trades.agg(
        F.min(F.unix_micros("trade_microtimestamp")).alias("mn"),
        F.max(F.unix_micros("trade_microtimestamp")).alias("mx"),
    ).collect()[0]
    if b.mn is None:
        return None
    last_link = None
    if linked is not None:
        last_link = linked.agg(
            F.max(F.unix_micros("trade_microtimestamp"))).collect()[0][0]
    resumes = [x for x in (last_link, cursor_us) if x is not None]
    if resumes:
        o_start = max(resumes)
        o_end = b.mx - delay_us
    else:
        # first run: inclusive of the very first trade -> open the interval
        # 1 us below it; no delay guard (reference else-branch :803-806)
        o_start = b.mn - 1
        o_end = min(b.mx - delay_us, b.mn + max_interval_us)
    o_end = min(o_end, o_start + max_interval_us)
    if o_end <= o_start:
        return None
    return o_start, o_end


def _between_us(col: str, lo_us: int, hi_us: int):
    c = F.unix_micros(col)
    return (c > F.lit(lo_us)) & (c <= F.lit(hi_us))


def incremental_match_step(l3: DataFrame, trades: DataFrame,
                           lo_us: int, hi_us: int,
                           max_delay_s: int = 1,
                           lookback_s: int = 60) -> DataFrame:
    """Links owned by the chunk ``(lo_us, hi_us]``: I5 links keyed by trade
    timestamp, then I6 (on the I5 residual) keyed by group timestamp,
    both evaluated over the lookback-extended window so the result is
    exactly the one-shot restriction (module docstring). Pure function of
    its inputs — replaying a chunk is idempotent."""
    d_us = max_delay_s * 1_000_000
    l_us = lookback_s * 1_000_000
    ext_lo, ext_hi = lo_us - l_us - d_us, hi_us + l_us + d_us
    # materialize both chunk windows once: I5 and I6 each reference the
    # event/trade windows in several subtrees (joins + windows), and
    # without the cut every subtree re-scans the full cached l3/trades
    # and re-applies the filter — ~6 full-input scan waves per chunk of
    # pure overhead (guide §2.4: share one materialization instead of
    # re-deriving). LAZY on purpose (r16 A/B): flipping these three to
    # eager — the fix for the winnow_pairs concurrent-materialization
    # race — was tried and measured SLOWER here (warm union 7.5-7.9 s
    # lazy vs 10.5-10.7 s eager at sf0.1): the chunk loop already runs
    # up to 4 chunks from driver threads, and three eager barriers per
    # chunk serialize each thread's pipeline without buying overlap,
    # while the cross-job duplication race is confined to one chunk's
    # broadcast builds and rarely fires.
    t_ext = trades.filter(_between_us("trade_microtimestamp",
                                      ext_lo - 1, ext_hi)
                          ).localCheckpoint(eager=False)
    # events matter within [trade, trade + max_delay] of an extended trade
    l3_ext = l3.filter(_between_us("microtimestamp", ext_lo - 1,
                                   ext_hi + d_us)).localCheckpoint(eager=False)
    # i5_all feeds both the keep-filter and the residual anti-join — cut
    # lineage so the I5 joins and dedup windows evaluate once, not twice
    i5_all = match_price_and_fill_exact(
        l3_ext, t_ext, max_delay_s).localCheckpoint(eager=False)
    i5_keep = i5_all.filter(_between_us("trade_microtimestamp", lo_us, hi_us))

    residual = t_ext.join(
        i5_all.select("pair_id", "exchange_trade_id").distinct(),
        ["pair_id", "exchange_trade_id"], "left_anti")
    i6_all = match_sum_of_fills(l3_ext, residual, max_delay_s)
    # groups are atomic: owned by the LAST member's timestamp (group_ts);
    # one event link == one group, so the window max reconstructs it
    w_grp = W.partitionBy("pair_id", "order_id", "event_no",
                          "event_microtimestamp")
    i6_keep = (
        i6_all.withColumn("_gts", F.max("trade_microtimestamp").over(w_grp))
        .filter(_between_us("_gts", lo_us, hi_us))
    )
    return (
        i5_keep.select(*_LINK_COLS)
        .withColumn("matcher", F.lit("fill_exact"))
        .unionByName(
            i6_keep.select(
                "pair_id", "exchange_trade_id", "trade_microtimestamp",
                "event_microtimestamp", "order_id", "event_no", "side",
                "price", F.col("amount").alias("fill"))
            .withColumn("matcher", F.lit("sum_of_fills")))
    )


def incremental_match(l3: DataFrame, trades: DataFrame,
                      existing_links: DataFrame | None = None,
                      delay_us: int = DELAY_US,
                      max_interval_us: int = MAX_INTERVAL_US,
                      max_delay_s: int = 1, lookback_s: int = 60,
                      max_steps: int = 10_000,
                      cache_inputs: bool = True,
                      parallelism: int = 4) -> DataFrame:
    """Drive :func:`incremental_match_step` to the current frame horizon —
    the whole ``pga_match`` lifecycle replayed as a bounded batch loop.

    Returns the NEW links only (recompute-and-return, like the matchers);
    pass the previous result as ``existing_links`` to resume after a
    restart — the frame rule picks up from the last linked trade, and a
    full replay over already-linked ground yields zero rows
    (tests/test_lifecycle.py).

    The chunk frames advance arithmetically off the cursor (which by
    construction is >= every kept link, so the per-step linked-state
    aggregate of :func:`match_frame` is redundant here) — they are known
    up front, and the tiling proof (module docstring) makes the steps
    INDEPENDENT: a backlog replay therefore submits up to ``parallelism``
    chunk jobs concurrently from driver threads (Spark schedules
    concurrent jobs from one session fairly), instead of serializing a
    month of bounded jobs end to end. The live scheduled job
    (streaming/match_job.py) still advances one frame per micro-batch —
    the cadence is the point there; the thread pool is the batch-replay
    path. Results are unioned in frame order, so the output is
    bit-identical to the serial loop (pytest: chunk-size invariance).

    With ``cache_inputs`` (default) the trades frame is materialized up
    front so a computed/view-backed input isn't re-derived every chunk;
    pass False when trades is a silver parquet table — then each chunk's
    time filter reaches the scan as a pushed-down predicate and nothing
    is pinned."""
    if cache_inputs:
        trades = trades.localCheckpoint(eager=True)
    b = trades.agg(
        F.min(F.unix_micros("trade_microtimestamp")).alias("mn"),
        F.max(F.unix_micros("trade_microtimestamp")).alias("mx"),
    ).collect()[0]
    cursor: int | None = None
    if existing_links is not None:
        cursor = existing_links.agg(
            F.max(F.unix_micros("trade_microtimestamp"))).collect()[0][0]
    frames: list[tuple[int, int]] = []
    if b.mn is not None:
        lo = cursor if cursor is not None else b.mn - 1
        while len(frames) <= max_steps:
            hi = min(b.mx - delay_us, lo + max_interval_us)
            if hi <= lo:
                break
            frames.append((lo, hi))
            lo = hi
        if len(frames) > max_steps:
            raise RuntimeError(f"incremental_match did not converge in "
                               f"{max_steps} steps")
    if not frames:
        return incremental_match_step(l3, trades.limit(0), 0, 0,
                                      max_delay_s, lookback_s).limit(0)

    def run(frame: tuple[int, int]) -> DataFrame:
        # cut lineage per chunk: unioning raw steps would stack one plan
        # per chunk (verify-skill gotcha on multi-stage self-joins); the
        # eager checkpoint is also what each worker thread blocks on
        return incremental_match_step(
            l3, trades, *frame, max_delay_s, lookback_s
        ).localCheckpoint(eager=True)

    if parallelism > 1 and len(frames) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=parallelism) as pool:
            steps = list(pool.map(run, frames))
    else:
        steps = [run(f) for f in frames]
    links = steps[0]
    for step in steps[1:]:
        links = links.unionByName(step)
    return links


def incremental_match_oracle_sql(delay_us: int = DELAY_US,
                                 max_delay_s: int = 1,
                                 trades_cte: str = "it_trades") -> str:
    """One-shot equivalent of the full :func:`incremental_match` run (the
    chunking is provably invisible — module docstring): I5 over all
    trades kept to <= newest − delay, then I6 over the I5 residual with
    groups bounded by group_ts <= the same horizon. Expects a CTE named
    ``trades_cte`` with the matcher trade schema; each matcher oracle is
    embedded whole as a nested-WITH CTE body (outer CTEs are lexically
    visible inside, so ``it_residual``/``level3`` resolve)."""
    i5 = match_fill_exact_oracle_sql(max_delay_s)
    old_trades = """trades AS (
    SELECT pair_id, era, microtimestamp AS trade_microtimestamp, price,
           amount AS fill, side AS origination, exchange_trade_id
    FROM matches
)"""
    assert old_trades in i5, "i5 oracle trades CTE drifted; update splice"
    i5 = i5.replace(old_trades, f"trades AS (SELECT * FROM {trades_cte})")
    i6 = match_sum_of_fills_oracle_sql(max_delay_s, trades_cte="it_residual")
    return f"""
WITH horizon AS (
    SELECT max(trade_microtimestamp)
           - INTERVAL '{delay_us} microseconds' AS hi
    FROM {trades_cte}
), i5_links AS MATERIALIZED (
{i5}
), it_residual AS (
    SELECT t.* FROM {trades_cte} t
    WHERE NOT EXISTS (
        SELECT 1 FROM i5_links l
        WHERE l.pair_id = t.pair_id
          AND l.exchange_trade_id = t.exchange_trade_id)
), i6_links AS (
{i6}
), i6_grouped AS (
    SELECT *, max(trade_microtimestamp) OVER (
        PARTITION BY pair_id, order_id, event_no, event_microtimestamp
    ) AS _gts
    FROM i6_links
)
SELECT pair_id, exchange_trade_id, trade_microtimestamp,
       event_microtimestamp, order_id, event_no, side, price, fill,
       'fill_exact' AS matcher
FROM i5_links
WHERE trade_microtimestamp <= (SELECT hi FROM horizon)
UNION ALL
SELECT pair_id, exchange_trade_id, trade_microtimestamp,
       event_microtimestamp, order_id, event_no, side, price,
       amount AS fill, 'sum_of_fills' AS matcher
FROM i6_grouped
WHERE _gts <= (SELECT hi FROM horizon)
"""


# reference bitstamp.pga_match sweep grid (db/bitstamp_schema.sql:1849-1857):
# tolerance OUTER loop over these percentages, offset INNER loop 1..MAX_OFFSET
SWEEP_TOLERANCES = (0.0001, 0.001, 0.01, 0.1, 1.0)
SWEEP_MAX_OFFSET = 4


def claimed_events(matches: DataFrame) -> DataFrame:
    """(pair_id, era, microtimestamp, order_id, event_no) of every event a
    match claims — the recompute-and-return stand-in for the reference's
    live_orders trade_id backfill (an event linked to a trade may not link
    again). The key includes microtimestamp — the full level3 identity —
    because (order_id, event_no) repeats across reincarnation lives; a
    claim on one life must not block the other."""
    return (
        matches.select(
            "pair_id", "era",
            F.col("buy_microtimestamp").alias("microtimestamp"),
            F.col("buy_order_id").alias("order_id"),
            F.col("buy_event_no").alias("event_no"))
        .unionByName(matches.select(
            "pair_id", "era",
            F.col("sell_microtimestamp").alias("microtimestamp"),
            F.col("sell_order_id").alias("order_id"),
            F.col("sell_event_no").alias("event_no")))
    )


def bitstamp_match_sweep(l3: DataFrame, trades: DataFrame,
                         tolerances: tuple[float, ...] = SWEEP_TOLERANCES,
                         max_offset: int = SWEEP_MAX_OFFSET,
                         claimed: DataFrame | None = None,
                         cache_inputs: bool = True,
                         period_s: int | None = None) -> DataFrame:
    """The ``bitstamp.pga_match`` sequential-matching sweep (reference
    db/bitstamp_schema.sql:1780-1861): for each tolerance percentage (outer)
    and event offset 1..max_offset (inner), run
    ``match_trades_to_sequential_events`` (I10, :func:`match_sequential`)
    over the still-unmatched trades, excluding events claimed by earlier
    cells — the reference threads this state through live_trades UPDATEs
    (matched trades leave ``unmatched_trades``) and the live_orders trade_id
    backfill (claimed events fail ``trade_id is null``); here both are
    derived from the accumulated result frame.

    Returns one row per matched trade: the I10 link columns plus
    (tolerance, sweep_offset) provenance — which grid cell matched it.
    A trade matches in at most one cell; an event is claimed by at most one
    trade across the whole sweep. The claimed-event exclusion is applied
    AFTER the lead window (claimed events still occupy positions in the
    event stream), exactly the reference's filter placement.

    ``claimed`` seeds the exclusion set with events matched by PREVIOUS
    runs — the resume path: the reference re-runs the sweep every few
    minutes over [last matched event, era end]; a caller replays that by
    filtering ``l3``/``trades`` to the window (plain filters — the repo
    convention) and passing the prior links' :func:`claimed_events`.
    Re-running over already-matched ground is then a no-op
    (tests/test_lifecycle.py idempotency test).

    The reference's full pga_match also UPSERTS ``inferred_trades`` (I9)
    first; that phase is the separately-gated :func:`inferred_trades` — a
    deployment composes I9 → promote → this sweep, the same composition the
    gate's closed loop performs. Orchestration (pgagent cadence, advisory
    locks) is out of scope per SURVEY §2.6.

    Scale: the expensive part — the per-offset lead-window over the full
    event stream — runs ONCE per offset (``sequential_event_pairs``,
    checkpointed), not once per grid cell: a 5×4 grid costs 4 windows plus
    at most 20 cheap equi-joins against broadcast-size state frames.
    Three further bit-identical prunes (r13) cut the dead-cell overhead:
    a fused per-offset stats pass counts feasible rows at EACH grid
    tolerance, so cells with zero feasible candidates are skipped without
    running any jobs (exact: resolve filters on feasibility at the cell's
    tolerance over a subset of the counted frame); the claimed-state
    broadcasts drop their defensive ``distinct`` (anti-joins are invariant
    under duplicate build rows); and the grid short-circuit bound is the
    distinct matchable-trade count across the feasible frames rather than
    the raw trade count, so it fires even when some trades are
    unmatchable at every cell. Each cell's
    result is checkpointed, so the threaded state (anti-join frames) stays
    a union of tiny in-memory leaves and the logical plan depth is bounded
    per cell, not cumulative across the grid. ``period_s`` passes through
    to :func:`sequential_event_pairs` — the period-parallel neighbor
    lookup for reducer-breakingly large eras (same opt-in and same
    split-equality guarantee as :func:`match_sequential`).
    """
    if not tolerances or max_offset < 1:
        raise ValueError("sweep grid is empty")
    if cache_inputs:
        trades = trades.localCheckpoint(eager=True)
    # the per-offset lead-window frames — and the tolerance-INDEPENDENT
    # candidate join of each against the full trade set — are independent
    # of each other and of the grid state, so they materialize as
    # concurrent jobs (the cells themselves are sequentially dependent by
    # the reference's semantics: each cell's exclusion state is every
    # earlier cell's claims). Hoisting the candidate join per offset is
    # what makes the full 5x4 grid affordable: each cell then anti-joins
    # and resolves over a frame of O(trades) candidate rows instead of
    # rescanning the O(events) pair frame — measured 21.6 s -> ~8 s at
    # sf0.1 for the 20-cell reference grid.
    from concurrent.futures import ThreadPoolExecutor

    from obadiah_spark.operators.matching import (
        match_candidates, match_feasible, match_resolve, match_rule)

    offsets = range(1, max_offset + 1)
    max_tol = max(tolerances)

    def _feasible_at(tol_pct: float):
        # mirror of match_feasible's rule pair at ONE grid tolerance —
        # used only for provable-emptiness stats, never to produce rows
        tol = F.lit(tol_pct) * F.col("t_price")
        mr = match_rule(F.col("t_amount"), F.col("t_price"),
                        F.col("amount"), F.col("fill"), F.col("is_del"), tol)
        n_mr = match_rule(F.col("t_amount"), F.col("t_price"),
                          F.col("n_amount"), F.col("n_fill"),
                          F.col("n_is_del"), tol)
        return mr.isNotNull() & n_mr.isNotNull()

    def _cand_for(off: int):
        p = sequential_event_pairs(l3, off, period_s)
        c = match_feasible(
            match_candidates(p, trades), max_tol).localCheckpoint(eager=True)
        # fused stats pass over the checkpointed leaf (replaces the old
        # isEmpty probe — same job count): per grid tolerance, how many
        # candidate rows are feasible. The F7 rule's non-NULL set is
        # monotone in tolerance and the claimed/matched anti-joins only
        # SHRINK the frame, so a (tolerance, offset) cell whose count is
        # zero here is PROVABLY empty — it can be skipped without running
        # any of its jobs, bit-identically (an empty cell contributes
        # nothing to the union). At the gate grid this skips the
        # low-tolerance cells of the sparse offsets >= 2.
        row = c.agg(*[
            F.sum(_feasible_at(t).cast("int")).alias(f"f{i}")
            for i, t in enumerate(tolerances)]).first()
        return c, [row[f"f{i}"] or 0 for i in range(len(tolerances))]

    with ThreadPoolExecutor(max_workers=min(4, max_offset)) as pool:
        res = dict(zip(offsets, pool.map(_cand_for, offsets)))
    cand0 = {off: c for off, (c, _) in res.items()}
    feas = {off: f for off, (_, f) in res.items()}
    # short-circuit (r11, tightened r13): a trade matches in at most one
    # cell, so once every MATCHABLE trade is matched the remaining grid is
    # all-empty — break out of it. The bound is the distinct count of
    # trades appearing in ANY offset's feasible candidate frame (one tiny
    # job over the checkpointed leaves) — strictly tighter than the old
    # trades.count() bound, which never fired when some trades are
    # unmatchable at every cell. Output is bit-identical: a cell past the
    # bound could only match a NEW trade, and every matchable trade is
    # feasible somewhere, hence already counted. A per-cell
    # candidate-emptiness probe (WITH the anti-joins) was tried and
    # REJECTED: on productive grids (the gate's shape) the extra action
    # per cell costs more than the cells it ever skips; the monotone
    # zero-count skip above is the free subset of it.
    idx_max = tolerances.index(max_tol)
    n_matchable = None
    if cache_inputs:
        ids = [cand0[off].select("pair_id", "exchange_trade_id")
               for off in offsets if feas[off][idx_max] > 0]
        if ids:
            u = ids[0]
            for d in ids[1:]:
                u = u.unionByName(d)
            n_matchable = u.distinct().count()
        else:
            n_matchable = 0
    n_matched = 0
    out: DataFrame | None = None
    for ti, tol in enumerate(tolerances):
        if n_matchable is not None and n_matched >= n_matchable:
            break  # every matchable trade matched — the rest is empty
        # (a row-start probe — one anti-join job per tolerance row to skip
        # cells whose feasible trades are all matched — was tried in r13
        # and REVERTED: the gate's dead mid-grid cells die in RESOLVE
        # (claimed events, one-event-one-trade dedup), not in the trade
        # anti-join, so the probe count stays positive, skips nothing,
        # and its jobs made the warm grid 26.0 -> 30.9 s at sf0.1.)
        for off in range(1, max_offset + 1):
            if feas[off][ti] == 0:
                continue  # provably empty at this tolerance (see above)
            cl = claimed
            cand = cand0[off]
            if out is not None:
                new_cl = claimed_events(out)
                cl = new_cl if cl is None else cl.unionByName(new_cl)
                cand = cand.join(
                    out.select("pair_id", "exchange_trade_id"),
                    ["pair_id", "exchange_trade_id"], "left_anti")
            if cl is not None:
                # claimed exclusion on the candidate frame — identical to
                # filtering the pair frame (the trade equi-join commutes
                # with a filter on the event-side columns) and still AFTER
                # the lead window, the reference's filter placement.
                # No distinct: left_anti is invariant under duplicate build
                # rows, claims are unique by construction (one event per
                # trade, resolve dedups within a cell), and the distinct
                # was a shuffle inside BOTH broadcast builds every cell
                cand = cand.join(
                    F.broadcast(cl),
                    ["pair_id", "era", "microtimestamp", "order_id",
                     "event_no"], "left_anti")
                cl2 = cl.select(
                    "pair_id", "era",
                    F.col("microtimestamp").alias("n_microtimestamp"),
                    F.col("order_id").alias("n_order_id"),
                    F.col("event_no").alias("n_event_no"))
                cand = cand.join(
                    F.broadcast(cl2),
                    ["pair_id", "era", "n_microtimestamp", "n_order_id",
                     "n_event_no"], "left_anti")
            # ACCUMULATED state, one flat leaf (r16): the loop used to
            # checkpoint each cell's result separately and union the
            # leaves, so by cell k the threaded state was a union of k
            # leaves and the claims chain 2k projections — and every
            # cell's CONSTRUCTION (py4j + analysis of the growing plan)
            # cost ~0.4-0.9 s of pure driver time, the gate's real floor
            # (profiled: 19.9 s pass = 10.4 s of jobs + ~9 s of driver
            # gaps; per-cell build dominated both checkpoint job and
            # count). Re-checkpointing the ACCUMULATED union instead
            # keeps every cell's plan flat (one leaf + three anti-joins)
            # for the cost of re-writing <= a few thousand tiny rows per
            # cell. Same rows, same exclusion state — claimed_events
            # distributes over union, and the count short-circuit reads
            # the cumulative total directly. (Eager, as before: the next
            # cell's broadcast builds would otherwise each re-derive the
            # state — measured slower lazy in r13, 26.0 -> 62.8 s.)
            # checkpoint_proposed=False (r16 re-A/B under the flat-state
            # regime): the per-cell proposed checkpoint job now costs
            # more than evaluating the narrow filter over the
            # checkpointed candidate leaf twice — alternating-arm A/B at
            # sf0.1: lazy 12.9-14.7 s vs eager 14.3-16.8 s per pass (the
            # r9/r13 A/Bs that favored eager predate the hoisted
            # candidate checkpoint and the flat accumulated state).
            m = (
                match_resolve(cand, tol, checkpoint_proposed=False)
                .withColumn("tolerance", F.lit(float(tol)))
                .withColumn("sweep_offset", F.lit(off))
            )
            # coalesce(1): the accumulated state is bounded by the
            # matched trades and is BROADCAST into every later cell's
            # anti-joins anyway (it must fit in memory by design), so one
            # partition keeps each cell's checkpoint/count/broadcast jobs
            # single-task instead of concatenating every prior cell's
            # shuffle partitions (A/B: 14.3-15.9 s vs 16.2-17.4 s warm)
            out = (m if out is None else out.unionByName(m)
                   ).coalesce(1).localCheckpoint(eager=True)
            n_matched = out.count()  # free: materialized by the checkpoint
            if n_matchable is not None and n_matched >= n_matchable:
                break
    if out is None:  # every offset infeasible — a correctly-typed empty
        out = (match_resolve(cand0[1], float(tolerances[0]))
               .withColumn("tolerance", F.lit(float(tolerances[0])))
               .withColumn("sweep_offset", F.lit(1)))
    return out


def bitstamp_match_sweep_oracle_sql(
        tolerances: tuple[float, ...] = SWEEP_TOLERANCES,
        max_offset: int = SWEEP_MAX_OFFSET,
        trades_cte: str = "sweep_trades") -> str:
    """One-statement DuckDB mirror of :func:`bitstamp_match_sweep`: the grid
    unrolls into chained CTEs — ``sweep_pairs_o{k}`` materialized once per
    offset (the Spark checkpoint), then per cell i: ``m_i`` (one
    :func:`match_sequential_body_sql` over the not-yet-matched trades
    ``u_i`` with claimed-event exclusion ``c_i``), running union ``acc_i``,
    and the next cell's state ``u_{i+1}``/``c_{i+1}`` derived from it."""
    ctes = [f"sweep_pairs_o{k} AS MATERIALIZED (\n"
            f"{match_sequential_pairs_sql(k)}\n)"
            for k in range(1, max_offset + 1)]
    ctes.append(f"u_0 AS (SELECT * FROM {trades_cte})")
    ctes.append("""c_0 AS (
    SELECT CAST(NULL AS INTEGER) AS pair_id, CAST(NULL AS TIMESTAMP) AS era,
           CAST(NULL AS TIMESTAMP) AS microtimestamp,
           CAST(NULL AS BIGINT) AS order_id, CAST(NULL AS INTEGER) AS event_no
    WHERE FALSE)""")
    finals = []
    i = 0
    for tol in tolerances:
        for off in range(1, max_offset + 1):
            body = match_sequential_body_sql(
                tol, f"u_{i}", f"sweep_pairs_o{off}", f"c_{i}")
            ctes.append(f"m_{i} AS MATERIALIZED (\n{body}\n)")
            if i == 0:
                ctes.append("acc_0 AS (SELECT * FROM m_0)")
            else:
                ctes.append(f"acc_{i} AS (SELECT * FROM acc_{i - 1} "
                            f"UNION ALL SELECT * FROM m_{i})")
            ctes.append(f"""u_{i + 1} AS (
    SELECT t.* FROM {trades_cte} t
    WHERE NOT EXISTS (SELECT 1 FROM acc_{i} a
        WHERE a.pair_id = t.pair_id
          AND a.exchange_trade_id = t.exchange_trade_id))""")
            ctes.append(f"""c_{i + 1} AS (
    SELECT pair_id, era, buy_microtimestamp AS microtimestamp,
           buy_order_id AS order_id, buy_event_no AS event_no
    FROM acc_{i}
    UNION ALL
    SELECT pair_id, era, sell_microtimestamp, sell_order_id, sell_event_no
    FROM acc_{i})""")
            finals.append(f"SELECT *, CAST({tol} AS DOUBLE) AS tolerance, "
                          f"{off} AS sweep_offset FROM m_{i}")
            i += 1
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(finals)
