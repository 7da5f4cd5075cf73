"""Local replica of the driver's differential check: run a registered
query on Spark and its oracle SQL on DuckDB, compare row count, column
names, and (column-name-sorted, row-sorted) values exactly.
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb

from mapreduceplusplus_spark.sources.tables import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    # DECIMAL-typed results surface as decimal.Decimal on one engine and
    # float on the other — normalize both to float before repr
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # STRICT: plain repr, no signed-zero collapsing.  The driver's
        # hash distinguishes -0.0 from 0.0; a lenient local canon here
        # masked exactly that divergence in round 4 (multimodal_columns,
        # VERDICT r4 #1).  Query/oracle pairs must normalize with `+ 0`
        # on BOTH sides wherever a rounded double can land at -0.0.
        return repr(v)
    if v is None:
        return "\x00NULL"
    return repr(v)


def run_compare(spark, sf_dir: str, query_fn, oracle: str):
    """Returns (ok, message). Mirrors: row-count + schema(col names) +
    order-insensitive value comparison with columns sorted by name."""
    sdf = query_fn(spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    spark_rows = [tuple(r[c] for c in spark_cols) for r in sdf.collect()]

    con = duck_connect(sf_dir)
    rel = con.execute(oracle)
    duck_cols_all = [d[0] for d in rel.description]
    duck_rows_raw = rel.fetchall()
    con.close()
    order = sorted(range(len(duck_cols_all)), key=lambda i: duck_cols_all[i])
    duck_cols = [duck_cols_all[i] for i in order]
    duck_rows = [tuple(r[i] for i in order) for r in duck_rows_raw]

    if spark_cols != duck_cols:
        return False, f"schema mismatch: spark={spark_cols} duck={duck_cols}"
    if len(spark_rows) != len(duck_rows):
        return False, f"rowcount mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"

    s = sorted(tuple(_canon(v) for v in row) for row in spark_rows)
    d = sorted(tuple(_canon(v) for v in row) for row in duck_rows)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:3]
        return False, f"value mismatch, first diffs (spark, duck): {diffs}"
    return True, f"ok ({len(spark_rows)} rows)"
