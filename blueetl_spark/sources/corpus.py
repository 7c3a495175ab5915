"""JSONL corpus ingest/egress with corrupt-record quarantine.

Web-scale text corpora arrive as JSONL (often gzipped) with a long tail
of malformed lines — truncated records, invalid UTF-8 escapes, schema
drift. The failure modes to avoid at 100 TB are (a) FAILFAST killing a
day-long job on line 10⁹, and (b) PERMISSIVE silently nulling fields so
corruption becomes invisible data loss. The middle path: read PERMISSIVE
with an explicit corrupt-record column, split good rows from quarantined
raw lines in one pass, and hand both back — the caller decides whether
the quarantine rate is acceptable.

Schema discipline: pass an explicit ``schema``. Inference reads the data
twice and locks in whatever the first sample shows; at multi-TB scale
that is both a full extra scan and a drift hazard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    multiline: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL into (good, quarantine).

    ``good`` has exactly the caller's schema; ``quarantine`` is
    (raw_line) — every line Spark could not parse into that schema,
    preserved verbatim for inspection or re-processing. One scan feeds
    both (the split is a filter on the corrupt column, not a re-read).
    """
    if multiline:
        # multi-line JSON documents can't be split into text lines, and
        # the text+from_json quarantine below is line-based
        raise NotImplementedError(
            "multiline JSON quarantine is not supported; convert to "
            "line-delimited JSONL upstream"
        )
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema must not already contain {CORRUPT_COL!r}")
    # fresh StructType: StructType.add mutates in place, which would
    # silently append the corrupt column to the CALLER's schema object
    read_schema = T.StructType(
        [*schema.fields, T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    # Read as TEXT + from_json rather than the JSON source: Spark forbids
    # queries that touch only the corrupt-record column of a JSON source
    # (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) and the
    # documented workaround is .cache() — a non-starter at corpus scale.
    # The text source has no such restriction, handles .gz the same, and
    # keeps the raw line around for the quarantine verbatim.
    lines = spark.read.text(path).filter(F.trim("value") != "")
    parsed = lines.select(
        F.col("value"),
        F.from_json(
            "value",
            read_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("__p"),
    )
    bad_mark = F.col("__p").isNull() | F.col(f"__p.{CORRUPT_COL}").isNotNull()
    good = parsed.filter(~bad_mark).select(
        *[F.col(f"__p.{f}").alias(f) for f in schema.fieldNames()]
    )
    quarantine = parsed.filter(bad_mark).select(F.col("value").alias("raw_line"))
    # lazy handle (no cache attached) for single-scan statistics
    # (quarantine_rate) — carries only the parse-status projection
    good._jsonl_parsed = parsed.select(bad_mark.alias("__bad"))
    return good, quarantine


def quarantine_rate(good: DataFrame, quarantine: DataFrame) -> float:
    """Fraction of input lines quarantined — the go/no-go number for an
    ingest run.

    For frames returned by :func:`read_jsonl` this is ONE scan of the
    source (one aggregate over the shared parse); arbitrary frames fall
    back to two counts."""
    parsed = getattr(good, "_jsonl_parsed", None)
    if parsed is not None:
        row = parsed.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("__bad").cast("long")).alias("bad"),
        ).first()
        return (row["bad"] or 0) / row["n"] if row["n"] else 0.0
    n_bad = quarantine.count()
    n_good = good.count()
    total = n_bad + n_good
    return n_bad / total if total else 0.0


def write_jsonl(
    df: DataFrame, path: str, n_files: int | None = None, compression: str = "gzip"
) -> None:
    """Write a corpus as JSONL (optionally repartitioned to a target file
    count; gzip by default — the interchange format peers actually
    ingest). Column order follows the DataFrame schema."""
    out = df.repartition(n_files) if n_files else df
    out.write.mode("overwrite").option("compression", compression).json(path)
