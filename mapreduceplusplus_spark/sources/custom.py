"""Custom data source via Spark 4's Python DataSource API — the
extension point that mirrors the reference's pluggable input readers
(``/root/reference/src/worker.cc:127-143`` reads whole files handed out
by the master; a DataSource's ``partitions()`` + ``read(partition)`` is
the same split-then-read contract, formalized).

The demo source is a deterministic generator (no I/O) so the DuckDB
oracle can reproduce it closed-form — the point under test is the
PROTOCOL: schema declaration, planner-visible partitioning, per-partition
iteration on executors.  A real connector (an internal KV store, a
proprietary log format, an HTTP API) replaces only ``read()``.

Scale posture: one ``SeqPartition`` per parallel unit — the planner
schedules each to an executor core, identical to file splits; a real
source derives partitions from its native sharding (file ranges, topic
partitions, key ranges) so reads start balanced without a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from mapreduceplusplus_spark.registry import query
from mapreduceplusplus_spark.session import ensure_utc

#: generator extent — total rows and parallel splits
SEQ_ROWS = 10_000
SEQ_PARTS = 8


class SeqPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SeqReader(DataSourceReader):
    def partitions(self):
        step = SEQ_ROWS // SEQ_PARTS
        return [
            SeqPartition(i * step, SEQ_ROWS if i == SEQ_PARTS - 1 else (i + 1) * step)
            for i in range(SEQ_PARTS)
        ]

    def read(self, partition: SeqPartition):
        # runs ON THE EXECUTOR, one call per partition — the stand-in
        # for a real connector's range/shard scan
        for i in range(partition.start, partition.end):
            yield (i, i * i, i % 7)


class SeqDataSource(DataSource):
    """``spark.read.format("mrpp_seq")`` — deterministic integer
    sequence with squares and a bucket column."""

    @classmethod
    def name(cls) -> str:
        return "mrpp_seq"

    def schema(self) -> str:
        return "i bigint, sq bigint, bucket int"

    def reader(self, schema) -> SeqReader:
        return SeqReader()


def register_seq_source(spark: SparkSession) -> None:
    """Idempotent registration of the custom format."""
    spark.dataSource.register(SeqDataSource)


@query(
    "source_python_datasource",
    oracle=f"""
    SELECT CAST(i % 7 AS INT)            AS bucket,
           count(*)                      AS n,
           CAST(sum(i * i) AS BIGINT)    AS sum_sq
    FROM range(0, {SEQ_ROWS}) t(i)
    GROUP BY 1
    """,
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read through the registered custom source and aggregate per
    bucket; DuckDB reproduces the generator closed-form with
    ``range()`` — two engines, two generators, same relation.  The scan
    itself shows up in the plan as a ``BatchScan`` over 8 planner-known
    partitions (Arrow-batched executor-side Python)."""
    ensure_utc(spark)
    register_seq_source(spark)
    seq = spark.read.format("mrpp_seq").load()
    return seq.groupBy(F.col("bucket").cast("int").alias("bucket")).agg(
        F.count("*").alias("n"),
        F.sum("sq").cast("bigint").alias("sum_sq"),
    )


#: deterministic on-disk binary fixture for the ``binaryFile`` source —
#: content restricted to printable ASCII so DuckDB's ``decode(content)``
#: (valid-UTF-8 requirement) hashes the SAME raw bytes Spark's
#: ``md5(binary)`` does.  Lives UNDER THIS CHECKOUT (not a world-shared
#: /tmp path — ADVICE r6: on shared /tmp another user could squat the
#: directory or plant stale .bin files that BOTH engines would read,
#: keeping the differential green while results go environment-
#: dependent); per-checkout also means per-user on any sane layout.
import os as _os

_BINSRC_DIR = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))),
    ".binsrc",
)
_BINSRC_N = 8


def _ensure_binsrc_fixture() -> None:
    import os

    import time

    os.makedirs(_BINSRC_DIR, exist_ok=True)
    expected = {f"doc_{i}.bin" for i in range(_BINSRC_N)}
    for name in os.listdir(_BINSRC_DIR):
        # drop anything not in the expected doc_0..doc_7 set (stale
        # files from an older _BINSRC_N, abandoned .tmp writes) BEFORE
        # reading — both engines glob *.bin, so a stray file would
        # feed both sides identically and hide real drift.  A LIVE
        # concurrent writer's temp file must survive though (deleting
        # it between its write and os.replace would break the atomic
        # temp+rename protocol below), so ".tmp." files are only
        # reaped once clearly abandoned (>60 s old).
        if name in expected:
            continue
        path = os.path.join(_BINSRC_DIR, name)
        try:
            if ".tmp." in name and time.time() - os.path.getmtime(path) < 60:
                continue
            os.remove(path)
        except OSError:
            pass
    for i in range(_BINSRC_N):
        body = "".join(
            chr(32 + (i * 7 + j) % 95) for j in range(100 * (i + 1))
        )
        payload = f"BLOB {i}\n{body}".encode("ascii")
        path = os.path.join(_BINSRC_DIR, f"doc_{i}.bin")
        current = None
        if os.path.exists(path):
            with open(path, "rb") as f:
                current = f.read()
        if current != payload:
            # atomic temp+rename so a concurrent reader (parallel test
            # workers) never observes a half-written payload
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, path)


@query(
    "source_binary_files",
    oracle=f"""
    SELECT regexp_extract(filename, '([^/]+)$', 1) AS file,
           CAST(size AS BIGINT) AS n_bytes,
           md5(decode(content)) AS digest
    FROM read_blob('{_BINSRC_DIR}/*.bin')
    """,
)
def source_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``binaryFile`` source — Spark's ingestion path for opaque
    media payloads (the on-disk half of the multimodal contract:
    ``llm/multimodal.py`` processes binary COLUMNS; this reads binary
    FILES into such a column).  Emits (path, modificationTime, length,
    content) per file; the query projects basename, byte length, and
    the md5 of the raw bytes, differentially checked against DuckDB's
    ``read_blob`` over the same directory.

    The fixture is 8 deterministic printable-ASCII files written
    idempotently by the query itself (same bytes every run — ASCII
    because DuckDB's md5 hashes VARCHARs, so ``decode(content)`` must
    be valid UTF-8 to reproduce Spark's binary md5).

    Scale: binaryFile lists and assigns FILES to tasks (a file never
    splits — fine for media objects, which are processed whole);
    at 100 TB the listing itself is the bottleneck, so real pipelines
    shard the directory tree and let ``pathGlobFilter``/partition
    directories prune — the same partition-pruning machinery
    ``sink_partitioned_pruned`` pins for parquet."""
    ensure_utc(spark)
    _ensure_binsrc_fixture()
    df = spark.read.format("binaryFile").load(_BINSRC_DIR + "/*.bin")
    return df.select(
        F.regexp_extract(F.col("path"), r"([^/]+)$", 1).alias("file"),
        F.col("length").cast("bigint").alias("n_bytes"),
        F.md5(F.col("content")).alias("digest"),
    )
