"""Z-order (Morton) clustering for multi-dimensional parquet pruning.

Parquet pruning is min/max zone maps per row group: a scan skips a row
group when the predicate excludes its [min, max] interval.  Sorting the
table by ONE column makes that column prunable and leaves every other
dimension scattered — a rectangle predicate (ts range AND key range)
still reads everything.  The standard fix (Delta/Iceberg OPTIMIZE
ZORDER) is to sort by the interleaved-bit Morton key instead: each row
group then covers a small hyper-rectangle of the key space, so BOTH
dimensions prune.

Everything is integer arithmetic so the DuckDB oracle reproduces keys
bit-for-bit:

* each column is bucketed to ``bits`` bits by exact bigint scaling
  ``(v - min) * (2^bits - 1) DIV max(max - min, 1)`` (corpus min/max
  come from one tiny aggregate, broadcast);
* the Morton key interleaves the bucket bits — column j contributes
  bit i to key bit ``i * n_cols + j``.

``zorder_write`` is the layout operator: ``repartitionByRange`` on the
key (range partitioner → each output file owns a contiguous key range
→ each file covers a compact hyper-rectangle) + ``sortWithinPartitions``
so row groups WITHIN a file stay compact too.  At 100 TB this is one
range-shuffle write — the same cost as any global sort the table
needed anyway, paid once at layout time to make every later rectangle
scan prune.

No reference-repo counterpart (the reference stores rows in Postgres
monthly partitions; era/month pruning is covered by the silver layout —
SCALE.md §1); this is the LLM-pipeline / lakehouse-layout brief.
r13 gate candidate (the r12 rotation window is full); the oracle below
is exercised in-pytest meanwhile, and SCALE.md §1 records the measured
row-group pruning win.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

ZORDER_BITS = 16


def _bucket_expr(col: str, cmin: str, cmax: str, bits: int) -> Column:
    """Exact bigint scaling of ``col`` onto [0, 2^bits - 1]."""
    m = (1 << bits) - 1
    return F.expr(
        f"(({col} - {cmin}) * {m}) DIV greatest({cmax} - {cmin}, 1)")


def _morton(bucket_cols: list[str], bits: int) -> Column:
    """Interleave the bucket columns' bits into one bigint key."""
    n = len(bucket_cols)
    terms = []
    for j, c in enumerate(bucket_cols):
        for i in range(bits):
            terms.append(f"((({c} >> {i}) & 1) * {1 << (i * n + j)})")
    return F.expr(" + ".join(terms))


def _check_geometry(n_cols: int, bits: int) -> None:
    """The Morton key must fit a signed BIGINT: the highest bit index is
    ``bits * n_cols - 1`` and must stay below 63.  Bucket scaling needs
    headroom too: ``(v - min) * (2^bits - 1)`` must not wrap, so value
    RANGES above ``2^(63 - bits)`` (~2^47 at the default 16 bits — e.g.
    nanosecond timestamps over years) need fewer bits; that bound
    depends on data, so it is documented here and the caller picks
    ``bits`` to suit (microsecond timestamps over a century fit)."""
    if n_cols < 1:
        raise ValueError("need at least one layout column")
    if bits < 1 or bits * n_cols > 63:
        raise ValueError(
            f"bits * n_cols must be in [1, 63] to fit a signed BIGINT "
            f"key (got {bits} * {n_cols} = {bits * n_cols}); lower "
            f"bits for wider layouts (e.g. 4 columns -> bits <= 15)")


def zorder_keys(df: DataFrame, cols: list[str],
                bits: int = ZORDER_BITS) -> DataFrame:
    """``df`` plus per-column buckets (``zb_<col>``) and the Morton key
    (``zkey``).  One tiny min/max aggregate broadcasts; the key itself
    is a pure map expression."""
    _check_geometry(len(cols), bits)
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    bnames = []
    for c in cols:
        b = f"zb_{c}"
        out = out.withColumn(
            b, _bucket_expr(c, f"_min_{c}", f"_max_{c}", bits))
        bnames.append(b)
    out = out.withColumn("zkey", _morton(bnames, bits))
    return out.drop(*[f"_min_{c}" for c in cols],
                    *[f"_max_{c}" for c in cols])


def zorder_write(df: DataFrame, cols: list[str], path: str,
                 n_files: int = 32, bits: int = ZORDER_BITS,
                 curve: str = "z") -> None:
    """Write ``df`` parquet in space-filling-curve layout:
    range-partition on the curve key (each file owns a contiguous key
    range) and sort within partitions (compact row groups inside each
    file).  ``curve="z"`` uses the Morton key (any dimensionality);
    ``curve="hilbert"`` uses the 2-D Hilbert index (tighter chunk
    bounding boxes — see :func:`hilbert_keys`)."""
    if curve == "z":
        keyed, key = zorder_keys(df, cols, bits), "zkey"
        extra = []
    elif curve == "hilbert":
        keyed, key = hilbert_keys(df, cols, bits), "hkey"
        extra = ["zkey"]
    else:
        raise ValueError(f"curve must be 'z' or 'hilbert', got {curve!r}")
    (keyed.repartitionByRange(n_files, key)
     .sortWithinPartitions(key)
     .drop(key, *extra, *[f"zb_{c}" for c in cols])
     .write.mode("overwrite").parquet(path))


def zorder_keys_oracle_sql(cols: list[str], bits: int = ZORDER_BITS,
                           table: str = "events",
                           id_col: str = "event_id") -> str:
    """DuckDB replica of :func:`zorder_keys` projected to (id, buckets,
    zkey) — the value-gate shape."""
    _check_geometry(len(cols), bits)
    n = len(cols)
    m = (1 << bits) - 1
    stat_sel = ", ".join(
        f"min({c}) AS min_{c}, max({c}) AS max_{c}" for c in cols)
    bucket_sel = ", ".join(
        f"((t.{c} - s.min_{c}) * {m}) // greatest(s.max_{c} - s.min_{c}, 1)"
        f" AS zb_{c}" for c in cols)
    terms = " + ".join(
        f"(((zb_{c} >> {i}) & 1) * {1 << (i * n + j)})"
        for j, c in enumerate(cols) for i in range(bits))
    zb_cols = ", ".join(f"CAST(zb_{c} AS BIGINT) AS zb_{c}" for c in cols)
    return f"""
WITH s AS (
    SELECT {stat_sel} FROM {table}
), b AS (
    SELECT t.{id_col}, {bucket_sel} FROM {table} t CROSS JOIN s
)
SELECT {id_col}, {zb_cols}, CAST({terms} AS BIGINT) AS zkey FROM b
"""


# ---- Hilbert curve (2-D) ----------------------------------------------
# Z-order's weakness is the "seam" jumps: consecutive keys can sit far
# apart in space, so a chunk's bounding rectangle is occasionally huge.
# The Hilbert curve removes them — consecutive keys are ALWAYS adjacent
# cells (unit Manhattan step), so chunk bounding boxes are tight and
# worst-case pruning beats Z-order (why Delta's OPTIMIZE grew a Hilbert
# mode).  The classic xy2d walk is a per-bit state machine (reflect +
# rotate); with a FIXED ``bits`` it unrolls into straight-line integer
# arithmetic, so both engines compute it in codegen'd expressions — no
# UDF, no recursion.


def hilbert_keys(df: DataFrame, cols: list[str],
                 bits: int = ZORDER_BITS) -> DataFrame:
    """``df`` plus buckets and the 2-D Hilbert index ``hkey``.  Exactly
    :func:`zorder_keys`'s bucketing (same min/max broadcast, same exact
    bigint scaling), then the unrolled xy2d walk.  2-D only — the
    classic curve; higher dimensions use :func:`zorder_keys`."""
    if len(cols) != 2:
        raise ValueError("hilbert_keys is 2-D; use zorder_keys for "
                         f"other dimensionalities (got {len(cols)})")
    _check_geometry(2, bits)
    out = zorder_keys(df, cols, bits)
    base = [c for c in out.columns]
    cx, cy = (f"zb_{c}" for c in cols)
    # one PROJECTION per level (not one composed expression): each
    # level's x/y/d reference the previous projection's attributes —
    # a single nested expression would double in size per level
    # (2^bits nodes, OOM at plan time; measured)
    out = out.select(*base, F.col(cx).alias("_hx"),
                     F.col(cy).alias("_hy"),
                     F.lit(0).cast("long").alias("_hd"))
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        x, y, d = F.col("_hx"), F.col("_hy"), F.col("_hd")
        rx = F.when((x.bitwiseAND(F.lit(s))) > 0, 1).otherwise(0)
        ry = F.when((y.bitwiseAND(F.lit(s))) > 0, 1).otherwise(0)
        # s*s*3 exceeds int32 at the top level — keep the literal long
        nd = d + (F.lit(s * s).cast("long")
                  * ((F.lit(3) * rx).bitwiseXOR(ry)))
        # reflect/rotate the quadrant frame for the next level
        nx = F.when(ry == 0,
                    F.when(rx == 1, F.lit(s - 1) - y).otherwise(y)) \
             .otherwise(x)
        ny = F.when(ry == 0,
                    F.when(rx == 1, F.lit(s - 1) - x).otherwise(x)) \
             .otherwise(y)
        out = out.select(*base, nx.alias("_hx"), ny.alias("_hy"),
                         nd.alias("_hd"))
    return (out.withColumn("hkey", F.col("_hd").cast("long"))
            .drop("_hx", "_hy", "_hd"))


def hilbert_keys_oracle_sql(cols: list[str], bits: int = ZORDER_BITS,
                            table: str = "events",
                            id_col: str = "event_id") -> str:
    """DuckDB replica of :func:`hilbert_keys`: the same bucketing CTE as
    the zorder oracle, then the unrolled walk as a chain of per-level
    CTEs carrying (x, y, d)."""
    if len(cols) != 2:
        raise ValueError("hilbert oracle is 2-D")
    _check_geometry(2, bits)
    m = (1 << bits) - 1
    a, b = cols
    stat_sel = ", ".join(
        f"min({c}) AS min_{c}, max({c}) AS max_{c}" for c in cols)
    bucket_sel = ", ".join(
        f"((t.{c} - s.min_{c}) * {m}) // greatest(s.max_{c} - s.min_{c}, 1)"
        f" AS zb_{c}" for c in cols)
    steps = []
    prev = "h_in"
    for i, level in enumerate(range(bits - 1, -1, -1)):
        s = 1 << level
        steps.append(f"""h{i} AS (
    SELECT {id_col}, zb_{a}, zb_{b},
           d + CAST({s} AS BIGINT) * {s} * xor(3 * (CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END),
                               (CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)) AS d,
           CASE WHEN (y & {s}) = 0
                THEN CASE WHEN (x & {s}) > 0 THEN {s - 1} - y ELSE y END
                ELSE x END AS x,
           CASE WHEN (y & {s}) = 0
                THEN CASE WHEN (x & {s}) > 0 THEN {s - 1} - x ELSE x END
                ELSE y END AS y
    FROM {prev}
)""")
        prev = f"h{i}"
    chain = ",\n".join(steps)
    return f"""
WITH s AS (
    SELECT {stat_sel} FROM {table}
), h_in AS (
    SELECT t.{id_col}, b.zb_{a}, b.zb_{b},
           b.zb_{a} AS x, b.zb_{b} AS y, CAST(0 AS BIGINT) AS d
    FROM {table} t CROSS JOIN s
    JOIN LATERAL (SELECT {bucket_sel}) b ON TRUE
),
{chain}
SELECT {id_col}, CAST(zb_{a} AS BIGINT) AS zb_{a},
       CAST(zb_{b} AS BIGINT) AS zb_{b}, CAST(d AS BIGINT) AS hkey
FROM {prev}
"""
