"""Invariant pins for the training-batch assembly operators
(``llm/packing.py``) beyond their DuckDB differentials: packing is
only useful if its outputs satisfy the dataloader's contracts
(capacity never exceeded, stream contiguous, shuffle a permutation).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduceplusplus_spark.llm.packing import (
    BIN_BUDGET,
    PACK_CTX,
    N_SHARDS,
    corpus_shard_shuffle,
    mixture_lang_weights,
    pack_bins_nextfit,
    pack_concat_chunks,
)
from tests.conftest import SF_DIR_ORACLE


def test_concat_chunks_stream_contiguous(spark):
    rows = sorted(
        pack_concat_chunks(spark, SF_DIR_ORACLE).collect(),
        key=lambda r: r.doc_id,
    )
    # offsets tile the token stream exactly: each doc starts where the
    # previous one ended, first doc at 0
    assert rows[0].tok_start == 0
    for prev, cur in zip(rows, rows[1:]):
        assert cur.tok_start == prev.tok_start + prev.n_tokens
    # chunk span arithmetic: first/last consistent with offsets
    for r in rows:
        assert r.first_chunk == r.tok_start // PACK_CTX
        end = r.tok_start + max(r.n_tokens, 1) - 1
        assert r.last_chunk == end // PACK_CTX
        assert r.n_chunks == r.last_chunk - r.first_chunk + 1
        # a doc shorter than the context window spans at most 2 chunks
        if r.n_tokens <= PACK_CTX:
            assert r.n_chunks <= 2


def test_nextfit_bins_respect_budget(spark):
    df = pack_bins_nextfit(spark, SF_DIR_ORACLE)
    # no bin overflows, ever — the operator's core contract
    over = (
        df.groupBy("shard", "bin_id")
        .agg(F.sum("n_tokens").alias("fill"))
        .where(F.col("fill") > BIN_BUDGET)
        .count()
    )
    assert over == 0
    # bin ids are contiguous from 0 within every shard
    per_shard = (
        df.groupBy("shard")
        .agg(
            F.min("bin_id").alias("lo"),
            F.max("bin_id").alias("hi"),
            F.count_distinct("bin_id").alias("n"),
        )
        .collect()
    )
    for r in per_shard:
        assert r.lo == 0
        assert r.n == r.hi + 1
    # greedy tightness: consecutive bins could not have been merged
    # (next-fit only opens a bin on overflow), checked via the fold's
    # definition on one shard
    rows = sorted(
        df.where(F.col("shard") == 0).collect(), key=lambda r: r.doc_id
    )
    fill = 0
    prev_bin = 0
    for r in rows:
        if r.bin_id != prev_bin:
            assert fill + r.n_tokens > BIN_BUDGET  # overflow forced it
            fill = r.n_tokens
            prev_bin = r.bin_id
        else:
            fill += r.n_tokens


def test_shard_shuffle_is_permutation(spark):
    df = corpus_shard_shuffle(spark, SF_DIR_ORACLE)
    n = df.count()
    assert df.select("doc_id").distinct().count() == n
    assert df.select("shard", "pos").distinct().count() == n
    stats = df.groupBy("shard").agg(
        F.min("pos").alias("lo"), F.max("pos").alias("hi"),
        F.count("*").alias("c"),
    )
    for r in stats.collect():
        assert r.lo == 1 and r.hi == r.c  # dense ranks per shard
        assert 0 <= r.shard < N_SHARDS


def test_mixture_weights_direction(spark):
    rows = {r.lang: r for r in mixture_lang_weights(spark, SF_DIR_ORACLE).collect()}
    # en dominates the synthetic corpus -> downsampled; minority langs
    # upsampled; floor-division keeps everything within ppm bounds
    assert rows["en"].weight_ppm < 1_000_000
    for lang, r in rows.items():
        if lang != "en":
            assert r.weight_ppm > 1_000_000
        assert r.obs_ppm <= 1_000_000


def test_curriculum_stage_boundaries_exact(spark):
    """Pin the z-band boundary semantics of curriculum_stage_of on a
    constructed score set where the boundaries land EXACTLY: scores
    {0, 10, 10, 20} have mean 10 and population sigma = sqrt(50);
    {0, 20} sit at z = +-sqrt(2) (outer bands), the 10s at z = 0
    (stage 2 by the <= tie rule).  Then {5, 15}: mean 10, sigma 5,
    z exactly -1 -> stage 1 (D < 0, D^2 == V) and z exactly +1 ->
    stage 4 (D^2 >= V)."""
    from mapreduceplusplus_spark.llm.packing import curriculum_stage_of

    x1 = spark.createDataFrame(
        [(1, 1, 0), (2, 1, 10), (3, 1, 10), (4, 1, 20)],
        "doc_id bigint, n_bigrams bigint, x bigint",
    )
    s1 = {r["doc_id"]: r["stage"] for r in curriculum_stage_of(x1).collect()}
    assert s1 == {1: 1, 2: 2, 3: 2, 4: 4}

    x2 = spark.createDataFrame(
        [(1, 1, 5), (2, 1, 15)], "doc_id bigint, n_bigrams bigint, x bigint"
    )
    s2 = {r["doc_id"]: r["stage"] for r in curriculum_stage_of(x2).collect()}
    assert s2 == {1: 1, 2: 4}

    # single doc: D = 0, V = 0 -> stage 2 (z = 0 tie rule)
    x3 = spark.createDataFrame(
        [(1, 1, 7)], "doc_id bigint, n_bigrams bigint, x bigint"
    )
    assert curriculum_stage_of(x3).collect()[0]["stage"] == 2


def test_threshold_curve_monotone_and_consistent_with_jaccard(spark):
    """The sweep must be non-increasing in the threshold, and its
    J >= 80% grid point must agree exactly with dedup_ngram_jaccard's
    pair count (same corpus, same trigram definition)."""
    from mapreduceplusplus_spark import registry
    from tests.conftest import SF_DIR_ORACLE

    registry.load_all()
    curve = {
        r["threshold_pct"]: (r["n_dup_pairs"], r["n_docs_flagged"])
        for r in registry.queries()["dedup_threshold_curve"](
            spark, SF_DIR_ORACLE
        ).collect()
    }
    assert sorted(curve) == [50, 60, 70, 80, 90]
    pcts = sorted(curve)
    for lo, hi in zip(pcts, pcts[1:]):
        assert curve[hi][0] <= curve[lo][0]
        assert curve[hi][1] <= curve[lo][1]
    n80 = registry.queries()["dedup_ngram_jaccard"](
        spark, SF_DIR_ORACLE
    ).count()
    assert curve[80][0] == n80


def test_matryoshka_eval_bounds_and_identity(spark):
    """recall_ppm in [0, 1e6], n_overlap <= K; and the truncated
    ranking equals ground truth when the 'truncation' keeps every
    dimension (identity sanity of the two-ranking machinery)."""
    from mapreduceplusplus_spark import registry
    from mapreduceplusplus_spark.llm.embeddings import _MRL_K
    from tests.conftest import SF_DIR_ORACLE

    registry.load_all()
    rows = registry.queries()["embedding_matryoshka_eval"](
        spark, SF_DIR_ORACLE
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_overlap"] <= _MRL_K
        assert r["recall_ppm"] == r["n_overlap"] * 1_000_000 // _MRL_K
