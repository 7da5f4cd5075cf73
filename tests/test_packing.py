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
