"""Local emulation of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at sf0.01, compares row count, column names, and an order-insensitive
value hash (rows sorted, floats compared after the query's own rounding).

Usage: python tools/check_oracle.py [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Serialize every value to its string form BEFORE comparing.

    The driver's gate hashes serialized values, so int64 ``99111`` and
    float64 ``99111.0`` (DuckDB HUGEINT sums land as float64 in pandas)
    must NOT compare equal — ``astype(str)`` keeps exactly that
    distinction while remaining insensitive to int32-vs-int64 width.
    """
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> int:
    import __spark_entry__ as entry
    from blueetl_spark.session import get_spark

    spark = get_spark(app_name="oracle_check")
    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = sys.argv[1:] or list(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM '{SF_DIR}/{t}.parquet'")

    failures = []
    for name in names:
        try:
            got = qs[name](spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(got)} rows (no oracle)")
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL  {name}: columns {sorted(got.columns)} vs {sorted(exp.columns)}")
            failures.append(name)
            continue
        if len(got) != len(exp):
            print(f"FAIL  {name}: rows {len(got)} vs {len(exp)}")
            failures.append(name)
            continue
        g, e = canon(got), canon(exp)
        try:
            # the driver's gate is a value HASH over serialized values —
            # exact string equality of every serialized cell is the real
            # contract (queries round their float columns themselves, and
            # int-vs-float dtype drift MUST fail here like it fails there)
            pd.testing.assert_frame_equal(g, e, check_exact=True)
            print(f"OK    {name}: {len(got)} rows")
        except AssertionError as err:
            try:
                gl = got[sorted(got.columns)].sort_values(
                    sorted(got.columns), ignore_index=True)
                el = exp[sorted(exp.columns)].sort_values(
                    sorted(exp.columns), ignore_index=True)
                pd.testing.assert_frame_equal(
                    gl, el, check_dtype=False, check_exact=False,
                    rtol=1e-9, atol=1e-9,
                )
                # values agree numerically but their serialized forms
                # differ (dtype drift / float repr): the driver's hash
                # gate would flag this — surface it loudly
                print(f"WARN  {name}: value-identical at rtol=1e-9 but "
                      "serialized forms differ — the driver's hash gate "
                      "would flag this")
                failures.append(name)
            except AssertionError:
                print(f"FAIL  {name}: value mismatch: {str(err)[:500]}")
                failures.append(name)
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
