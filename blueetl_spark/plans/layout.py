"""Z-order (Morton-curve) data layout: multi-column pruning at write time.

Parquet skipping works off per-file / per-row-group min-max statistics.
A table sorted on one column prunes beautifully on that column and not at
all on any other; at 100 TB, queries that filter on *either* of two keys
(``report_extract`` by time, per-gid features by gid) can't both win from
a single linear sort. Interleaving the bits of the clustering columns
into one Morton key and range-partitioning + sorting on it gives every
file a tight bounding box in **all** clustered dimensions — each
dimension's min-max stays narrow, so single-column predicates on any of
them skip most files (the same trick as Delta Lake's ``OPTIMIZE ZORDER
BY`` / the classic UB-tree layout, done here with plain DataFrame ops).

Mechanics, all JVM-side built-ins:

1. Per column, map values to a ``bits``-wide integer rank. Numeric
   columns scale linearly between the column min/max (one tiny agg to
   fetch the bounds); pre-computed integer ranks can be passed through
   as-is. Linear scaling keeps the map order-preserving, which is all
   Morton needs.
2. Interleave bits round-robin (MSB first) into one ≤63-bit key. The
   interleave is a flat ``concat_ws`` of '0'/'1' chars + one signed
   base-2 ``conv`` — the same shallow-expression shape as ``simhash``
   (a nested shift/or fold costs seconds of codegen at 64 bits).
3. ``repartitionByRange`` on the key (range boundaries from a sampled
   sketch — this is the only exchange) then ``sortWithinPartitions`` and
   write: one file ≈ one compact Z-range ≈ one small hyper-rectangle.

Verification is empirical and engine-independent: tests read back the
per-file min-max of each clustered column and assert a point-range
predicate on ANY single clustered column intersects only a small
fraction of files, while a linear sort on the first column fails that
bound on the second (``tests/test_layout.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_KEY_BITS = 63  # signed-long key; conv(..., 2, -10) semantics


def _to_rank(df: DataFrame, col: str, bits: int) -> Column:
    """Order-preserving map of a numeric column onto [0, 2^bits)."""
    lo, hi = df.agg(
        F.min(F.col(col).cast("double")), F.max(F.col(col).cast("double"))
    ).first()
    if lo is None or hi is None or hi == lo:
        return F.lit(0).cast("long")
    span = hi - lo
    top = (1 << bits) - 1
    return F.least(
        F.lit(top).cast("long"),
        F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(span) * (top + 1)),
    ).cast("long")


def zorder_key(
    df: DataFrame, cols: list[str], bits: int | None = None
) -> Column:
    """Morton key column interleaving ``cols`` (MSB-first, round-robin).

    ``bits`` is the per-column rank width; default spends the whole
    63-bit budget evenly (2 cols → 31 bits each, 3 → 21, 4 → 15).
    """
    if not 2 <= len(cols) <= 6:
        raise ValueError("zorder_key interleaves 2-6 columns")
    if bits is None:
        bits = MAX_KEY_BITS // len(cols)
    if bits * len(cols) > MAX_KEY_BITS:
        raise ValueError(
            f"{len(cols)} cols x {bits} bits = {bits * len(cols)} exceeds the "
            f"{MAX_KEY_BITS}-bit key budget"
        )
    ranks = [_to_rank(df, c, bits) for c in cols]
    chars = []
    for i in range(bits - 1, -1, -1):  # MSB first
        for r in ranks:
            bit = F.shiftright(r, i).bitwiseAND(F.lit(1))
            chars.append(F.when(bit == 1, "1").otherwise("0"))
    return F.conv(F.concat_ws("", *chars), 2, -10).cast("long")


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 64,
    bits: int | None = None,
) -> None:
    """Write ``df`` as parquet laid out along the Z-curve of ``cols``.

    One range exchange on the Morton key (boundaries come from Spark's
    reservoir sample of the key), an in-partition sort, and a plain
    parquet write — each output file covers a compact Z-range, i.e. a
    small bounding box in every clustered dimension. The key column is
    dropped before writing; it is derivable, not data.

    Sizing: ``n_files`` plays the role of target file count — at scale
    pick it so files land at a few hundred MB, same rule as compaction.
    """
    key = zorder_key(df, cols, bits)
    (
        df.withColumn("__z", key)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_bounds(df_reader, path: str, cols: list[str]) -> DataFrame:
    """Per-file min-max of ``cols`` for a parquet directory — the layout
    quality metric (how tight each file's bounding box is). Used by the
    layout tests; at ops time the same query answers 'would a predicate
    on X prune?' without touching engine internals."""
    df = df_reader.parquet(path).withColumn("__file", F.input_file_name())
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return df.groupBy("__file").agg(*aggs)
