"""Data-layout / table-maintenance operators: Z-order clustering and
file-compaction planning — the two layout jobs every large parquet
lake runs continuously (Delta ``OPTIMIZE ZORDER BY``, Iceberg
``rewrite_data_files`` bin-packing), re-expressed as declarative
Spark plans over the engine's own tables.

Both queries share their FULL SQL text with the DuckDB oracle
(dialect-intersection arithmetic only: ``floor``/``CAST`` instead of
dialect-specific integer division, no date functions), so the Spark
side runs the identical statement through ``spark.sql`` — these rows
double as raw-SQL-surface coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (parity with sibling modules)

from mapreduceplusplus_spark.registry import query
from mapreduceplusplus_spark.session import ensure_utc
from mapreduceplusplus_spark.sources.tables import load_table


def _bit(expr: str, i: int) -> str:
    """Dialect-neutral extraction of bit ``i`` of a small nonneg int."""
    return f"(CAST(floor(({expr}) / {1 << i}) AS BIGINT) % 2)"


def _morton16(x: str, y: str) -> str:
    """Interleave the low 8 bits of ``x`` and ``y`` into a 16-bit
    Morton (Z-order) value: z = Σ x_i·4^i + Σ y_i·2·4^i.  Operands are
    ≤ 255 so every intermediate is exact in both BIGINT and DOUBLE."""
    terms = []
    for i in range(8):
        terms.append(f"{_bit(x, i)} * {1 << (2 * i)}")
        terms.append(f"{_bit(y, i)} * {1 << (2 * i + 1)}")
    return " + ".join(terms)


#: normalize a bounded integer column onto 0..255 with pure integer
#: arithmetic — (v - mn) * 255 / (mx - mn), floored; exact in DOUBLE
#: because v ≤ ~1e5 here so (v-mn)*255 ≤ 2^53
def _norm255(v: str, mn: str, mx: str) -> str:
    return (
        f"CAST(floor((({v}) - ({mn})) * 255.0 / "
        f"(CASE WHEN ({mx}) > ({mn}) THEN ({mx}) - ({mn}) ELSE 1 END)) AS BIGINT)"
    )


_X = _norm255("p_size", "b.mn_size", "b.mx_size")
_Y = _norm255(
    "CAST(round(p_retailprice * 100) AS BIGINT)", "b.mn_cents", "b.mx_cents"
)

_ZORDER_SQL = f"""
    WITH b AS (
      SELECT min(p_size) AS mn_size, max(p_size) AS mx_size,
             min(CAST(round(p_retailprice * 100) AS BIGINT)) AS mn_cents,
             max(CAST(round(p_retailprice * 100) AS BIGINT)) AS mx_cents
      FROM part
    ),
    z AS (
      SELECT {_X} AS x, {_Y} AS y,
             {_morton16(_X, _Y)} AS zval
      FROM part CROSS JOIN b
    )
    SELECT CAST(floor(zval / 4096.0) AS BIGINT) AS zbucket,
           count(*)    AS n_rows,
           CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x,
           CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y,
           CAST(min(zval) AS BIGINT) AS min_z, CAST(max(zval) AS BIGINT) AS max_z
    FROM z
    GROUP BY CAST(floor(zval / 4096.0) AS BIGINT)
"""


@query("layout_zorder", oracle=_ZORDER_SQL)
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering key — the multi-dimensional
    data-layout primitive behind Delta's ``OPTIMIZE ZORDER BY`` and
    ClickHouse/Databricks liquid clustering: both dimensions are
    normalized onto 0..255 with exact integer arithmetic, their bits
    interleaved into a 16-bit Morton value, and rows grouped by the
    top-4-bit Z-bucket.  Writing files in ``zval`` order makes every
    file's per-column min/max stats TIGHT IN BOTH DIMENSIONS at once
    (each bucket here provably spans ≤ 64 of 256 normalized units per
    axis — pinned by ``test_zorder_buckets_are_2d_tiles``), so a
    reader filtering on EITHER ``p_size`` or ``p_retailprice`` (or
    both) can skip most files — a 1-D sort gives that for one column
    only.

    At 100 TB the production form is ``df.withColumn("z", <this
    expression>).repartitionByRange(N, "z").sortWithinPartitions("z")
    .write...`` — one range shuffle, then the layout pays for itself
    on every subsequent scan.  The registered query materializes the
    per-bucket envelope (the file-skipping index a lakehouse manifest
    would store): one narrow codegen'd projection + one hash agg; the
    min/max CTE is a 1-row broadcast.

    The full SQL text (bit math via ``floor``/``CAST`` only — exact in
    the dialect intersection) is shared verbatim with the DuckDB
    oracle."""
    ensure_utc(spark)
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(_ZORDER_SQL)


#: compaction target: bins of ~2000 chars of documents per source —
#: stand-in for the real knob (e.g. 512 MB of parquet per output file)
_COMPACT_TARGET = 2000

_COMPACTION_SQL = f"""
    WITH sized AS (
      SELECT doc_id, source, n_chars,
             sum(n_chars) OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS csum
      FROM documents
    )
    SELECT doc_id, source, n_chars,
           CAST(ceil(csum / {_COMPACT_TARGET}.0) AS BIGINT) AS bin_id
    FROM sized
"""


@query("maintenance_compaction_plan", oracle=_COMPACTION_SQL)
def maintenance_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner — the table-maintenance job that
    keeps a 100 TB lake readable: within each partition (``source``),
    files (documents standing in, ``n_chars`` as size) are ordered
    largest-first and packed greedily into target-size bins by a
    cumulative-sum window; every file in bin k is then rewritten into
    one output file.  Largest-first next-fit is the classic
    Iceberg/Delta binning heuristic: deterministic, single-pass, and
    within a constant factor of optimal bin count.

    Scale: the window is hash-partitioned on the layout partition key
    — one shuffle, each task plans its own partitions independently;
    no global state, no driver loop.  The plan (doc→bin assignment)
    is itself a DataFrame, so the follow-up rewrite is a
    ``repartition(source, bin_id)`` + write.  All-integer output
    (ceil of an exact integer sum over an integral target), shared
    SQL text with the oracle."""
    ensure_utc(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_COMPACTION_SQL)
