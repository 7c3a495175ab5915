"""Pluggable table stores: Parquet (distributed), Feather (driver-side),
HDF (driver-side, requires pytables — probed at use, clear error without).

Reference design: one store object per cache directory with
``dump/load/checksum/delete`` (``/root/reference/src/blueetl/store/base.py:
16-67``; parquet ``store/parquet.py:89-114``, feather ``store/feather.py:
51-73``, hdf ``store/hdf.py:19-48``). The reference also hand-unifies
schemas across part files (``store/parquet.py:18-65``) — Spark's
``mergeSchema`` option replaces that wholesale.

Scale notes: Parquet is the only store that stays distributed (a directory
of parts written by executors — at 100 TB this is the one to use, with the
partition columns of the table's grain). Feather is a *driver-side*
convenience for small repo tables (windows, neuron_classes): the DataFrame
is collected through Arrow, never use it for the report. Both write
zstd-compressed.
"""

from __future__ import annotations

import hashlib
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class BaseStore:
    """dump/load/checksum/delete for one directory of named tables."""

    EXT = ""
    #: Row cap for stores that materialize through the driver (Feather/HDF).
    #: Mirrors the ``max_broadcast_rows`` gate in ``operators/dedup.py``:
    #: refuse with an actionable error instead of OOMing the driver when a
    #: user points a big table at a small-table convenience format.
    MAX_DRIVER_ROWS = 5_000_000

    def __init__(
        self, base_path: str | Path, max_driver_rows: int | None = None
    ) -> None:
        self.base_path = Path(base_path)
        self.base_path.mkdir(parents=True, exist_ok=True)
        if max_driver_rows is not None:
            self.MAX_DRIVER_ROWS = max_driver_rows

    def _gate_driver_rows(self, df: DataFrame, name: str, kind: str) -> None:
        """Cheap bounded probe: scan at most cap+1 rows (limit pushes into
        the scan), never the full table, before a driver-side collect."""
        cap = self.MAX_DRIVER_ROWS
        if df.limit(cap + 1).count() > cap:
            raise ValueError(
                f"{kind} store collects table {name!r} through the driver, "
                f"and it exceeds max_driver_rows={cap}. Use the 'parquet' "
                "store (distributed) for tables this size, or pass "
                "max_driver_rows explicitly if it genuinely fits in driver "
                "memory."
            )

    def path_for(self, name: str) -> Path:
        return self.base_path / f"{name}{self.EXT}"

    def exists(self, name: str) -> bool:
        return self.path_for(name).exists()

    def delete(self, name: str) -> None:
        p = self.path_for(name)
        if p.is_dir():
            shutil.rmtree(p)
        elif p.exists():
            p.unlink()

    def checksum(self, name: str) -> str | None:
        """blake2b identity of the CURRENT MATERIALIZATION: file bytes for
        single-file stores; the sorted (relative-path, size, mtime) list
        for directory stores. File stores are stable across identical
        dumps; directory stores are NOT (Spark names part files randomly
        and mtimes change), so use this to detect "was the dataset
        rewritten since I last looked", not "is the content equal"."""
        p = self.path_for(name)
        if not p.exists():
            return None
        h = hashlib.blake2b(digest_size=16)
        if p.is_file():
            with open(p, "rb") as f:
                for chunk in iter(lambda: f.read(1 << 20), b""):
                    h.update(chunk)
        else:
            for f in sorted(p.rglob("*")):
                if f.is_file() and not f.name.startswith("."):
                    st = f.stat()
                    h.update(str(f.relative_to(p)).encode())
                    h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
        return h.hexdigest()

    def dump(self, df: DataFrame, name: str) -> None:
        raise NotImplementedError

    def load(self, spark: SparkSession, name: str) -> DataFrame:
        raise NotImplementedError


class ParquetStore(BaseStore):
    """Distributed parquet directory per table (zstd, schema-merging reads)."""

    EXT = ".parquet"

    def dump(self, df: DataFrame, name: str) -> None:
        df.write.mode("overwrite").option("compression", "zstd").parquet(
            str(self.path_for(name))
        )

    def load(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.option("mergeSchema", "true").parquet(
            str(self.path_for(name))
        )


class FeatherStore(BaseStore):
    """Driver-side Arrow/Feather file per table — small tables only.

    The reference needs an index→column shim for feather
    (``store/feather.py:16-50``); Spark DataFrames have no index, so the
    round-trip is plain.
    """

    EXT = ".feather"

    def dump(self, df: DataFrame, name: str) -> None:
        import pyarrow.feather as feather

        self._gate_driver_rows(df, name, "feather")
        table = df.toArrow()
        feather.write_feather(table, str(self.path_for(name)), compression="zstd")

    def load(self, spark: SparkSession, name: str) -> DataFrame:
        import pyarrow.feather as feather

        table = feather.read_table(str(self.path_for(name)))
        # hand Spark the Arrow table directly: the to_pandas() detour turns
        # nullable int64 into float64 (NaN for null) and loses > 2^53 values
        return spark.createDataFrame(table)


def _have_pytables() -> bool:
    try:
        import tables  # noqa: F401  (pandas' HDF backend)

        return True
    except ImportError:
        return False


class HDFStore(BaseStore):
    """Driver-side HDF5 file per table, via pandas ``to_hdf``/``read_hdf``
    — the same backend and key layout as the reference
    (``store/hdf.py:19-48``), gated behind an import probe: environments
    without pytables get a clear error naming the alternatives instead of
    a bare ImportError.

    Like Feather, this is a small-table convenience: the DataFrame is
    collected to the driver. The distributed store is Parquet.
    """

    EXT = ".h5"

    _MISSING = (
        "HDF store requires pytables (pandas' HDF backend), which is not "
        "installed; use 'parquet' (distributed) or 'feather' (driver-side) "
        "instead"
    )

    def dump(self, df: DataFrame, name: str) -> None:
        if not _have_pytables():
            raise NotImplementedError(self._MISSING)
        self._gate_driver_rows(df, name, "hdf")
        df.toPandas().to_hdf(str(self.path_for(name)), key=name, mode="w")

    def load(self, spark: SparkSession, name: str) -> DataFrame:
        if not _have_pytables():
            raise NotImplementedError(self._MISSING)
        import pandas as pd

        return spark.createDataFrame(pd.read_hdf(str(self.path_for(name)), key=name))


class OrcStore(BaseStore):
    """Distributed ORC directory per table (zstd). Same fully-
    distributed contract as parquet — predicate pushdown, column
    pruning, and splittable stripes all apply — for deployments whose
    warehouse standardizes on ORC instead."""

    EXT = ".orc"

    def dump(self, df: DataFrame, name: str) -> None:
        df.write.mode("overwrite").option("compression", "zstd").orc(
            str(self.path_for(name))
        )

    def load(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.orc(str(self.path_for(name)))


class JsonlStore(BaseStore):
    """Distributed newline-delimited-JSON directory per table (gzip).
    The interchange format: lossy on types relative to parquet/ORC
    (timestamps stringify, ints widen), so loads pass an explicit
    schema captured at dump time via a sidecar ``_schema.json`` —
    without it Spark would re-infer with an extra scan AND could drift
    types between dump and load."""

    EXT = ".jsonl"

    def dump(self, df: DataFrame, name: str) -> None:
        p = self.path_for(name)
        df.write.mode("overwrite").option("compression", "gzip").json(str(p))
        (Path(str(p)) / "_schema.json").write_text(df.schema.json())

    def load(self, spark: SparkSession, name: str) -> DataFrame:
        from pyspark.sql.types import StructType

        p = Path(str(self.path_for(name)))
        schema = StructType.fromJson(
            __import__("json").loads((p / "_schema.json").read_text())
        )
        return spark.read.schema(schema).json(str(p))


STORES = {
    "parquet": ParquetStore,
    "feather": FeatherStore,
    "hdf": HDFStore,
    "orc": OrcStore,
    "jsonl": JsonlStore,
}


def get_store(kind: str, base_path: str | Path) -> BaseStore:
    try:
        return STORES[kind](base_path)
    except KeyError:
        raise ValueError(f"unknown store kind {kind!r}; one of {sorted(STORES)}")


def upsert_parquet(
    spark: SparkSession,
    path: str | Path,
    updates: DataFrame,
    key: str | list[str],
    delete_missing: bool = False,
) -> dict:
    """Keyed MERGE (upsert) into a parquet table: rows whose key appears
    in ``updates`` are replaced, new keys are inserted, everything else
    is carried over unchanged (``delete_missing=True`` instead keeps
    ONLY the updated keys — full-snapshot replace semantics). The slowly
    changing dimension maintenance step plain parquet lacks.

    Idempotent by construction: replaying the same ``updates`` batch
    rewrites the same rows (``updates`` is deduplicated on the key —
    last-writer-wins is NOT guessable from an unordered frame, so
    duplicate keys in one batch raise instead).

    Scale + crash shape: ONE anti join of the current table against the
    (typically broadcastable) update keys, staged write, then the shared
    crash-safe rename publish (``plans/atomic.py``) — a reader sees the
    old or the new table, never a mix; ``recover_parquet_upsert``
    (= ``atomic.recover_dir``) repairs an interrupted publish. For
    update batches comparable to the table itself, partition/bucket the
    table on the key upstream so the anti join co-locates.
    """
    from pyspark.sql import functions as F

    from blueetl_spark.plans import atomic

    keys = [key] if isinstance(key, str) else list(key)
    path = str(path)
    # the updates subtree feeds the dup guard, the broadcast key frame,
    # the merged write and the stats count — pin once (batch-sized by
    # contract) so an expensive upstream runs once per upsert, not 4x
    updates = updates.localCheckpoint(eager=True)
    dup = (
        updates.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count()
    )
    if dup:
        raise ValueError(
            f"updates contain duplicate keys on {keys}; resolve to one row "
            "per key first (last-writer-wins is not inferable from an "
            "unordered frame)"
        )
    atomic.recover_dir(spark, path)
    if not atomic.fs_exists(spark, path):
        updates.write.mode("overwrite").parquet(path)
        return {"inserted": updates.count(), "carried": 0}
    cur = spark.read.parquet(path)
    carried = (
        cur.join(F.broadcast(updates.select(*keys).distinct()), keys, "left_anti")
        if not delete_missing
        else None
    )
    merged = (
        updates.unionByName(carried, allowMissingColumns=True)
        if carried is not None
        else updates
    )
    tmp = f"{path}.staging"
    merged.write.mode("overwrite").parquet(tmp)
    n_updates = updates.count()
    n_total = spark.read.parquet(tmp).count()
    atomic.swap_dir(spark, path, tmp)
    return {"inserted": n_updates, "carried": n_total - n_updates}


def upsert_scd2(
    spark: SparkSession,
    path: str | Path,
    updates: DataFrame,
    key: str | list[str],
    effective_col: str = "effective_ts",
    stats: bool = True,
) -> dict:
    """History-preserving (SCD Type 2) upsert: instead of overwriting,
    the current version of each updated key is CLOSED
    (``__valid_to`` = the update's effective time) and the new version
    appended (``__valid_to`` NULL = current). The table accumulates
    full change history, queryable as of any time with
    :func:`scd2_snapshot` — the dimension-table twin of the event-side
    as-of join.

    Replay/out-of-order rule: an update whose key's current version
    already has ``__valid_from >= effective`` is DROPPED (a replayed
    batch re-derives the same effective time, so at-least-once delivery
    folds out; a genuinely stale update must not rewrite newer
    history). Duplicate keys in one batch raise, as in
    :func:`upsert_parquet`.

    Scale + crash shape: every join streams the table side and
    broadcasts a BATCH-sized frame (the update keys, then the current
    rows of updated keys — never the table's whole current slice, which
    grows with the table); closed history is carried through untouched;
    same staged-write + atomic rename publish.
    History never rewrites — at 100 TB, partition the table on a date
    of ``__valid_to`` so the hot current slice (NULL partition) stays
    small and snapshot reads prune closed history.

    ``stats=False`` skips the applied/dropped_stale/closed counters —
    three extra Spark jobs per upsert (one of which re-runs the whole
    ``updates`` subtree) that exist only to fill the returned dict.
    Callers that discard the dict (the scd2 bench gate; any bulk
    backfill loop) avoid ~half the per-batch job count; the duplicate-
    key guard always runs. The returned dict then carries ``None`` for
    the skipped counters.
    """
    from pyspark.sql import functions as F

    from blueetl_spark.plans import atomic

    keys = [key] if isinstance(key, str) else list(key)
    path = str(path)
    # the updates subtree feeds the dup guard, BOTH broadcast key frames
    # of the merge, and the appended rows — pin once (batch-sized by
    # contract) so an expensive upstream (e.g. the bench gate's per-year
    # max_by aggregate over orders) runs once per upsert instead of 4x
    updates = updates.localCheckpoint(eager=True)
    if updates.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count():
        raise ValueError(f"updates contain duplicate keys on {keys}")
    eff = F.col(effective_col).cast("double")
    new_rows = updates.select(
        "*",
        eff.alias("__valid_from"),
        F.lit(None).cast("double").alias("__valid_to"),
    ).drop(effective_col)

    atomic.recover_dir(spark, path)
    if not atomic.fs_exists(spark, path):
        new_rows.write.mode("overwrite").parquet(path)
        return {
            "applied": new_rows.count() if stats else None,
            "dropped_stale": 0 if stats else None,
            "closed": 0 if stats else None,
        }

    cur = spark.read.parquet(path)
    merged, live_upd = _scd2_merge_frames(cur, new_rows, updates, keys, eff)
    if stats:
        n_live = live_upd.count()
        n_total_upd = updates.count()
        n_closed = live_upd.join(
            cur.filter(F.col("__valid_to").isNull()), keys, "left_semi"
        ).count()
    else:
        n_live = n_total_upd = n_closed = None

    tmp = f"{path}.staging"
    merged.write.mode("overwrite").parquet(tmp)
    atomic.swap_dir(spark, path, tmp)
    return {
        "applied": n_live,
        "dropped_stale": (n_total_upd - n_live) if stats else None,
        "closed": n_closed,
    }


def _scd2_merge_frames(cur, new_rows, updates, keys, eff):
    """Build the SCD2 merge plan over an existing table frame ``cur``.

    Broadcast direction invariant (plan-guarded in tests): the table
    side is NEVER broadcast — its current slice grows with the table,
    not the batch. A broadcast semi-join of the batch keys first narrows
    the current slice to the updated keys (a batch-sized frame), which
    then rides a second batch-side broadcast into the stale check; the
    close/carry joins likewise broadcast only batch-derived frames.
    Returns ``(merged, live_upd)``.
    """
    from pyspark.sql import functions as F

    upd_k = updates.select(*keys, eff.alias("__eff"))
    # drop stale/replayed updates: key's current version is already at
    # or past this effective time
    current_for_upd = (
        cur.filter(F.col("__valid_to").isNull())
        .select(*keys, F.col("__valid_from").alias("__cur_from"))
        .join(F.broadcast(upd_k.select(*keys)), keys, "left_semi")
    )
    live_upd = (
        upd_k.join(F.broadcast(current_for_upd), keys, "left")
        .filter(
            F.col("__cur_from").isNull()
            | (F.col("__cur_from") < F.col("__eff"))
        )
        .select(*keys, "__eff")
        # batch-sized, consumed by 4 joins + 2 counts: pin once so the
        # table's current slice is scanned once for the stale check
        .localCheckpoint(eager=True)
    )

    closing = F.broadcast(live_upd)
    closed = (
        cur.filter(F.col("__valid_to").isNull())
        .join(closing, keys, "inner")
        .withColumn("__valid_to", F.col("__eff"))
        .drop("__eff")
    )
    untouched = cur.join(closing, keys, "left_anti").unionByName(
        cur.filter(F.col("__valid_to").isNotNull())
        .join(closing, keys, "left_semi")
    )
    applied_new = new_rows.join(
        live_upd.select(*keys), keys, "left_semi"
    )
    merged = untouched.unionByName(closed).unionByName(applied_new)
    return merged, live_upd


def scd2_snapshot(spark: SparkSession, path: str | Path, at: float | None = None) -> DataFrame:
    """The table as of time ``at`` (None = current): rows with
    ``__valid_from <= at < __valid_to`` (open interval NULL = forever).
    A plain filter — partition-prunable when the table is laid out on
    ``__valid_to`` — returned without the bookkeeping columns."""
    from pyspark.sql import functions as F

    from blueetl_spark.plans import atomic

    atomic.recover_dir(spark, str(path))
    df = spark.read.parquet(str(path))
    if at is None:
        out = df.filter(F.col("__valid_to").isNull())
    else:
        out = df.filter(
            (F.col("__valid_from") <= F.lit(float(at)))
            & (
                F.col("__valid_to").isNull()
                | (F.col("__valid_to") > F.lit(float(at)))
            )
        )
    return out.drop("__valid_from", "__valid_to")


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    key: str | list[str],
    order_col: str,
    op_col: str = "op",
    broadcast_keys: bool = True,
) -> DataFrame:
    """Apply a change-data-capture batch to a snapshot — the lakehouse
    MERGE pattern for upstream-database feeds: ``changes`` rows carry an
    op code (``I``/``U`` upsert, ``D`` delete) and a version/order
    column; within the batch the LAST writer per key wins (a key
    inserted then deleted in one batch ends deleted; updated twice ends
    at the later version), then the surviving ops apply to ``base`` in
    one pass. Returns the new snapshot with ``base``'s columns.

    Deterministic by contract: ``(order_col, op precedence)`` must give
    a TOTAL order per key — two change rows for one key with the same
    order value raise (silently picking one would apply different
    snapshots on different runs; upstream CDC streams have an LSN/
    sequence precisely so consumers never tie-break).

    Scale shape: one window over the CHANGES (batch-sized, never
    snapshot-sized) picks survivors, one ``left_anti`` join removes
    every touched key from the snapshot, one union appends the
    non-delete survivors. With ``broadcast_keys`` (default — CDC
    batches are tiny next to the snapshot) the base table never
    shuffles at all; set it False for a giant backfill batch and the
    anti join becomes the base's single shuffle. No read-modify-write
    per row anywhere.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    keys = [key] if isinstance(key, str) else list(key)
    payload = [c for c in base.columns if c not in keys]
    missing = [c for c in (*keys, *payload, op_col, order_col)
               if c not in changes.columns]
    if missing:
        raise ValueError(f"changes is missing columns: {missing}")

    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    ranked = changes.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__ties",
        F.count(F.lit(1)).over(
            Window.partitionBy(*keys, order_col)
        ),
    )
    dup = ranked.filter((F.col("__rn") == 1) & (F.col("__ties") > 1)).limit(1)
    if dup.count() > 0:
        r = dup.first()
        raise ValueError(
            f"apply_cdc: tied {order_col} for key "
            f"{[r[k] for k in keys]} — the change feed must carry a "
            "total per-key order (LSN / sequence number)"
        )
    latest = ranked.filter(F.col("__rn") == 1)
    touched = latest.select(*keys).distinct()
    if broadcast_keys:
        touched = F.broadcast(touched)
    kept = base.join(touched, keys, "left_anti")
    upserts = latest.filter(F.col(op_col) != "D").select(*keys, *payload)
    return kept.unionByName(upserts)


def incremental_rollup(
    agg: DataFrame,
    delta: DataFrame,
    keys: str | list[str],
    sum_cols: list[str],
    sign_col: str = "sign",
    count_col: str = "n_rows",
) -> DataFrame:
    """Maintain a stored COUNT/SUM rollup from a SIGNED row delta —
    incremental view maintenance, the refresh pattern that keeps a
    key-sized aggregate current without rescanning history: ``delta``
    carries base-table row images with ``sign_col`` +1 (row arrived) /
    −1 (row retracted; the CDC update is a −old +new pair). Returns the
    new rollup: counts and sums merged per key, keys whose count
    reaches zero dropped, keys first seen in the delta added.

    Only DECOMPOSABLE aggregates maintain this way (COUNT, SUM, and
    anything derived from them — AVG, ratios); MIN/MAX/COUNT DISTINCT
    need a rescan or a different sketch (that asymmetry is inherent,
    not an implementation gap). A delta that retracts more rows than a
    key ever had would drive its count negative — that is a corrupt
    feed, and the plan RAISES on it (a silently negative rollup row
    poisons every downstream read).

    Scale shape: ONE map-side-combined aggregate over the delta
    (batch-sized), then one key join against the stored rollup. The
    join shuffles on the keys — store the rollup BUCKETED on the same
    keys and the refresh becomes shuffle-free on the stored side,
    which is the point of maintaining it incrementally.
    """
    from pyspark.sql import functions as F

    keys = [keys] if isinstance(keys, str) else list(keys)
    for c in (count_col, *(f"sum_{c}" for c in sum_cols)):
        if c not in agg.columns:
            raise ValueError(f"stored rollup is missing column {c!r}")
    sgn = F.col(sign_col).cast("long")
    d = delta.groupBy(*keys).agg(
        F.sum(sgn).alias("__dn"),
        *[
            F.sum(sgn * F.col(c)).alias(f"__ds_{c}")
            for c in sum_cols
        ],
    )
    merged = agg.join(d, keys, "full_outer")
    n_new = F.coalesce(F.col(count_col), F.lit(0)) + F.coalesce(
        F.col("__dn"), F.lit(0)
    )
    checked = F.when(n_new >= 0, n_new).otherwise(
        F.raise_error(
            F.format_string(
                "incremental_rollup: count for a key went negative (%d) — "
                "the delta retracts rows the rollup never counted",
                n_new,
            )
        )
    )
    out = merged.select(
        *keys,
        checked.alias(count_col),
        *[
            (
                F.coalesce(F.col(f"sum_{c}"), F.lit(0))
                + F.coalesce(F.col(f"__ds_{c}"), F.lit(0))
            ).alias(f"sum_{c}")
            for c in sum_cols
        ],
    )
    return out.filter(F.col(count_col) > 0)
