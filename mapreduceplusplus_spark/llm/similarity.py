"""Similarity search over embedding columns (SURVEY.md §2.B row
``sim_search_topk`` + scale-path extension ``sim_search_lsh``).

North-star mandate: approximate-nearest-neighbor over an
``array<float>`` embedding column.  Two tiers:

- ``sim_search_topk`` — EXACT brute-force cosine top-k: one scan, a
  per-row dot product via higher-order ``zip_with``/``aggregate``
  (Catalyst expressions, whole-stage-codegen'd, no Python), then
  ``orderBy().limit(k)`` which Spark plans as TakeOrderedAndProject
  (per-task k-row heap + driver merge — no global sort, no shuffle of
  the full table).  At 100 TB this is the honest scan-bound baseline:
  cost = one pass over the vectors, perfectly parallel.
- ``sim_search_lsh`` — the ANN scale path: random-hyperplane LSH
  (Charikar) bucket index; the probe is compared only against vectors
  whose signature falls in the probe's bucket.  Bucketing is an
  equi-filter (at scale: an equi-JOIN on bucket id for batched probes,
  or a bucketed/partitioned table so Catalyst prunes partitions), so
  the quadratic never materializes and the scan shrinks by ~2^bits.

Deterministic throughout: hyperplanes are pseudo-random ±1 vectors
derived from fixed-seed ``xxhash64(bit_index, dim_index)`` — no RNG
state, bit-for-bit reproducible across runs and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduceplusplus_spark.registry import query
from mapreduceplusplus_spark.session import ensure_utc
from mapreduceplusplus_spark.sources.tables import load_table

#: probe = the embedding of this vec_id (deterministic, present at
#: every scale factor)
PROBE_ID = 0
TOP_K = 10
#: hyperplane count for the LSH variant → 2^4 = 16 buckets
LSH_BITS = 4


def _as_double(col: str | Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


@query(
    "sim_search_topk",
    oracle=f"""
    WITH probe AS (
      SELECT CAST(embedding AS DOUBLE[]) AS pv FROM embeddings WHERE vec_id = {PROBE_ID}
    ),
    scored AS (
      SELECT e.vec_id, e.label,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p.pv) AS c
      FROM embeddings e, probe p
      WHERE e.vec_id <> {PROBE_ID}
    )
    SELECT vec_id, label, round(c, 3) AS cosine,
           CAST(row_number() OVER (ORDER BY c DESC, vec_id) AS BIGINT) AS rnk
    FROM scored
    ORDER BY c DESC, vec_id
    LIMIT {TOP_K}
    """,
)
def sim_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k vs one probe vector.  The probe
    row is a 1-row broadcast (no shuffle of the big side); scoring is a
    map-side zip_with; ``orderBy.limit(k)`` → TakeOrderedAndProject.
    vec_id tiebreaker keeps ties deterministic; the achieved rank is
    materialized (``rnk``) so the order-insensitive hash still checks
    ordering."""
    ensure_utc(spark)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("v")
    )
    probe = (
        emb.where(F.col("vec_id") == PROBE_ID)
        .select(F.col("v").alias("pv"))
    )
    scored = (
        emb.where(F.col("vec_id") != PROBE_ID)
        .crossJoin(F.broadcast(probe))
        .withColumn("c", _dot(F.col("v"), F.col("pv")) / (_norm(F.col("v")) * _norm(F.col("pv"))))
    )
    topk = scored.orderBy(F.col("c").desc(), F.col("vec_id")).limit(TOP_K)
    w = Window.orderBy(F.col("c").desc(), F.col("vec_id"))
    return topk.select(
        "vec_id",
        "label",
        F.round("c", 3).alias("cosine"),
        F.row_number().over(w).cast("bigint").alias("rnk"),
    )


def lsh_signature(v: Column, bits: int = LSH_BITS) -> Column:
    """Random-hyperplane signature as an integer bucket id in
    [0, 2^bits).  Hyperplane ``i`` is the deterministic ±1 vector whose
    dimension-``d`` sign is a bit of ``xxhash64(i, d)``; the two-arg
    transform lambda receives (element, index) — the index IS the
    dimension, so no positional explode is needed."""
    def _signed(i: int):
        # factory keeps the lambda exactly TWO-argument — pyspark
        # dispatches on lambda arity, so a default-arg closure would
        # change the semantics (see dedup._minhash)
        return lambda x, d: F.when(
            F.xxhash64(F.lit(i), d).bitwiseAND(F.lit(1)) == 1, x
        ).otherwise(-x)

    bucket = F.lit(0).cast("long")
    for i in range(bits):
        proj = F.aggregate(
            F.transform(v, _signed(i)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket.bitwiseOR(
            F.shiftleft(F.when(proj > 0, 1).otherwise(0).cast("long"), i)
        )
    return bucket


@query("sim_search_lsh")  # no SQL oracle: LSH bucketing isn't
# SQL-expressible; pinned by tests/test_llm_ops.py (determinism +
# candidates verified against the exact scorer)
def sim_search_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via random-hyperplane LSH: score ONLY the vectors in
    the probe's bucket (~1/2^bits of the table), exact cosine within
    the bucket.  Recall is partial by design (ANN contract) and
    measured against ``sim_search_topk`` in tests; multi-probe (also
    visiting buckets at Hamming distance 1 from the probe's) is the
    standard recall knob and would add ``bits`` more bucket ids to the
    IN-filter — same plan shape."""
    ensure_utc(spark)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("v")
    ).withColumn("bucket", lsh_signature(F.col("v")))
    probe = (
        emb.where(F.col("vec_id") == PROBE_ID)
        .select(F.col("v").alias("pv"), F.col("bucket").alias("pbucket"))
    )
    cand = (
        emb.where(F.col("vec_id") != PROBE_ID)
        .crossJoin(F.broadcast(probe))
        .where(F.col("bucket") == F.col("pbucket"))
        .withColumn("c", _dot(F.col("v"), F.col("pv")) / (_norm(F.col("v")) * _norm(F.col("pv"))))
    )
    topk = cand.orderBy(F.col("c").desc(), F.col("vec_id")).limit(TOP_K)
    w = Window.orderBy(F.col("c").desc(), F.col("vec_id"))
    return topk.select(
        "vec_id",
        "label",
        F.round("c", 3).alias("cosine"),
        F.row_number().over(w).cast("bigint").alias("rnk"),
    )
