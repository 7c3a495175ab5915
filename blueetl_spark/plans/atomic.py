"""Crash-safe directory swap for parquet-backed indexes.

The maintenance pattern shared by the incremental dedup indexes
(``operators/dedup.py``) and the persisted ANN index
(``operators/similarity.py``): a compaction stages its output in a temp
dir, then publishes with temp-write → rename cur→cur.old → rename
tmp→cur → delete cur.old. :func:`recover_dir` repairs a crash at either
interruption point so the directory is always readable in the old or the
new state, never neither — idempotent and metadata-only, call it from
every read/compact entry point.

Hadoop ``FileSystem`` via py4j (NOT ``pathlib``/``os``): the paths may be
``hdfs://`` / ``s3a://`` URIs, and rename through the FileSystem API is
the closest-to-atomic publish each store offers.
"""

from __future__ import annotations


def _fs(spark, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p, jvm


def fs_exists(spark, path: str) -> bool:
    fs, p, _ = _fs(spark, path)
    return fs.exists(p)


def swap_dir(spark, cur: str, tmp: str) -> None:
    """Publish ``tmp`` as ``cur``: rename cur→cur.old, tmp→cur, drop the
    backup. A crash in between is repaired by :func:`recover_dir`."""
    fs, cur_p, jvm = _fs(spark, cur)
    P = jvm.org.apache.hadoop.fs.Path
    bak = P(cur + ".old")
    if fs.exists(bak):
        fs.delete(bak, True)
    if not fs.rename(cur_p, bak):
        raise IOError(f"swap: rename {cur} -> {cur}.old failed")
    if not fs.rename(P(tmp), cur_p):
        raise IOError(f"swap: rename {tmp} -> {cur} failed")
    fs.delete(bak, True)


def recover_dir(spark, cur: str) -> None:
    """Repair a swap interrupted mid-publish: no ``cur`` but an intact
    ``cur.old`` → restore it; both present → the new state is live, drop
    the stale backup."""
    fs, cur_p, jvm = _fs(spark, cur)
    bak = jvm.org.apache.hadoop.fs.Path(cur + ".old")
    if fs.exists(bak):
        if not fs.exists(cur_p):
            if not fs.rename(bak, cur_p):
                raise IOError(f"recovery: restore {cur}.old -> {cur} failed")
        else:
            fs.delete(bak, True)
