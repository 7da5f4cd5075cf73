"""Iterative ML on the engine: k-means (Lloyd) over the embeddings
table, expressed relationally and QUANTIZED so that every iteration is
integer-exact — the one formulation under which a distributed Lloyd
run is bit-identical to a sequential reference implementation
(floating-point centroid means are accumulation-order-dependent, so a
naive float Lloyd can legitimately diverge between engines/partitionings
at the second iteration; quantized arithmetic removes the ambiguity
and lets the DuckDB oracle unroll the SAME two iterations in SQL).

Scheme: each float dim is quantized to micro-units
(round(1e6·x) ∈ [−1e6, 1e6]) then shifted by +2²¹ so all values are
nonnegative (half-up integer means need a sign-free domain: Spark's
``div`` truncates toward zero while DuckDB's ``//`` floors, and the
two disagree on negatives — the shift is distance-invariant).
Distances are Σ(q−c)² in BIGINT (64 dims × (2²¹)² ≈ 2.8e14, far
inside the range); centroid updates are half-up integer means
((2·Σq + n) // (2n)); argmin ties break on the lower cluster id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduceplusplus_spark.registry import query
from mapreduceplusplus_spark.session import ensure_utc
from mapreduceplusplus_spark.sources.tables import load_table

_K = 4
_SHIFT = 1 << 21


@query(
    "ml_kmeans_lloyd",
    oracle=f"""
    WITH E AS (
      SELECT vec_id, ord AS dim,
             -- CAST to DOUBLE before scaling: DuckDB would otherwise
             -- multiply in FLOAT and quantize a different value than
             -- Spark's double-precision product
             CAST(round(1000000 * CAST(u AS DOUBLE)) AS BIGINT) + {_SHIFT} AS q
      FROM (SELECT vec_id,
                   unnest(embedding) AS u,
                   generate_subscripts(embedding, 1) AS ord
            FROM embeddings)
    ),
    C0 AS (SELECT vec_id AS cid, dim, q AS c FROM E WHERE vec_id < {_K}),
    D1 AS (
      SELECT e.vec_id, c.cid,
             CAST(sum((e.q - c.c) * (e.q - c.c)) AS BIGINT) AS dist
      FROM E e JOIN C0 c ON c.dim = e.dim
      GROUP BY e.vec_id, c.cid
    ),
    A1 AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cid) AS rn
        FROM D1) WHERE rn = 1
    ),
    C1 AS (
      SELECT a.cid, e.dim,
             CAST((2 * sum(e.q) + count(*)) // (2 * count(*)) AS BIGINT) AS c
      FROM E e JOIN A1 a ON a.vec_id = e.vec_id
      GROUP BY a.cid, e.dim
    ),
    D2 AS (
      SELECT e.vec_id, c.cid,
             CAST(sum((e.q - c.c) * (e.q - c.c)) AS BIGINT) AS dist
      FROM E e JOIN C1 c ON c.dim = e.dim
      GROUP BY e.vec_id, c.cid
    ),
    A2 AS (
      SELECT vec_id, cid, dist FROM (
        SELECT vec_id, cid, dist,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cid) AS rn
        FROM D2) WHERE rn = 1
    )
    SELECT CAST(cid AS BIGINT) AS cid,
           count(*) AS n_members,
           CAST(sum(dist) AS BIGINT) AS sum_sqdist
    FROM A2 GROUP BY cid
    """,
)
def ml_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means (Lloyd's algorithm), k=4, TWO unrolled iterations with
    deterministic init (the first k vectors by ``vec_id``), run
    entirely as DataFrame algebra over the exploded (vec, dim, value)
    relation — the iterative-ML capability demonstration, with the
    DuckDB oracle executing the IDENTICAL two quantized iterations in
    SQL (see module docstring for why quantization is what makes a
    distributed Lloyd oracle-checkable at all).

    Dataflow per iteration: distances = exploded-vectors ⋈ broadcast
    centroid rows (k·d = 256 rows) grouped by (vec, cluster); argmin =
    per-vector window (hash-partitioned on vec_id, WindowGroupLimit-
    pruned); update = one hash agg per (cluster, dim).  The exploded
    relation is localCheckpointed once and reused by all four
    consumers.  At 100 TB: centroids stay k·d rows (broadcast side),
    vectors shuffle once per iteration on vec_id — the same shape
    MLlib's k-means uses, minus its driver-side centroid state.  A
    production run would loop until convergence via the
    ``dedup_cluster_canonical`` iterate-and-checkpoint pattern; two
    fixed iterations keep the oracle finite.

    Output: per-cluster membership count and total squared distance
    (the inertia decomposition), all BIGINT."""
    ensure_utc(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    e = (
        emb.select(
            "vec_id", F.posexplode("embedding").alias("dim", "u")
        )
        .select(
            "vec_id",
            "dim",
            (
                F.round(F.lit(1000000) * F.col("u").cast("double")).cast(
                    "bigint"
                )
                + _SHIFT
            ).alias("q"),
        )
        .localCheckpoint(eager=True)
    )

    def assign(centroids: DataFrame, with_dist: bool) -> DataFrame:
        d = (
            # broadcast-safe: centroids is k*d rows (constant,
            # config-bounded)
            e.join(F.broadcast(centroids), "dim")
            .groupBy("vec_id", "cid")
            .agg(
                F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c")))
                .cast("bigint")
                .alias("dist")
            )
        )
        w = Window.partitionBy("vec_id").orderBy("dist", "cid")
        a = d.select(
            "vec_id", "cid", "dist", F.row_number().over(w).alias("rn")
        ).where(F.col("rn") == 1)
        return a.select("vec_id", "cid", "dist") if with_dist else a.select(
            "vec_id", "cid"
        )

    c0 = e.where(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("cid"), "dim", F.col("q").alias("c")
    )
    a1 = assign(c0, with_dist=False)
    c1 = (
        e.join(a1, "vec_id")
        .groupBy("cid", "dim")
        .agg(F.expr("CAST((2 * sum(q) + count(*)) div (2 * count(*)) AS BIGINT)").alias("c"))
    )
    a2 = assign(c1, with_dist=True)
    return a2.groupBy(F.col("cid").cast("bigint").alias("cid")).agg(
        F.count("*").alias("n_members"),
        F.sum("dist").cast("bigint").alias("sum_sqdist"),
    )
