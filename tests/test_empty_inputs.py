"""Empty-input differential sweep: every oracle query runs against
ZERO-ROW copies of all tables, Spark vs DuckDB — the edge case the
sf0.01 differential can never exercise (first empty daily partition,
a filter that matches nothing upstream, a brand-new tenant).

The full sweep is the opt-in ``-m empty`` marker (run once per round,
like ``-m hostile``); the every-run portion re-checks the queries the
first sweep actually caught bugs in.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from mapreduceplusplus_spark import registry
from mapreduceplusplus_spark.sources.tables import TABLES, load_table
from tests.conftest import SF_DIR
from tests.oracle_harness import run_compare

registry.load_all()

#: documented engine divergence, NOT a bug: over an EMPTY relation,
#: Spark returns 0 rows for CUBE / ROLLUP / GROUPING SETS (the Expand
#: operator emits nothing and the aggregate is keyed on the synthetic
#: grouping-id column), while DuckDB follows the ANSI global-aggregate
#: reading and emits the ``()`` grouping-set row.  Both behaviors are
#: self-consistent; the divergence only exists at exactly zero rows.
EMPTY_DIVERGENT = {
    "agg_cube",
    "agg_rollup",
    "agg_grouping_sets",
    "agg_grouping_id",  # ROLLUP — same divergence class
}

#: queries whose documented empty-corpus contract is a LOUD raise, not
#: a zero-row result (ADVICE r9: an IVF index cannot be quantized over
#: zero seed vectors; the raise-with-message beats an opaque crash or
#: a silently-empty index).  They gained SQL oracles in r14, which put
#: them in this sweep's parametrization — the raise behavior itself is
#: pinned by tests/test_llm_ops.py's loud-empty tests.
EMPTY_RAISES = {
    "sim_search_ivf",
    "sim_search_ivf_partitioned",
    "sim_search_ivf_kmeans",  # oracle since r15 (integer Lloyd replay)
    # oracle since r15 (integer PQ replay); _ivf_seed_lists raises first
    "sim_search_ivfpq",
    "sim_search_ivfpq_dot",
    "sim_search_ivfpq_l2",
    # r16 cross-ladder curve — calls _ivf_seed_lists first, by design
    "sim_search_recall_curve",
    "sim_search_ivf_sq8",  # r16 composite — same _ivf_seed_lists gate
    "sim_search_ivf_sq8_partitioned",  # its on-disk twin — same gate
}

#: queries the first empty-input sweep caught real bugs in (fixed) —
#: re-checked on every pytest run
FIXED_REGRESSIONS = [
    "window_funnel",            # scaffold rows derived from data rows
    "dq_observe_metrics",       # int(None) on NULL sum/max metrics
    "sink_partitioned_pruned",  # schema inference over zero-file layout
    "join_dpp_partition_pruned",  # same
    "sql_recursive_cte",        # guard returned 0 rows vs oracle's 1
]


@pytest.fixture(scope="session")
def empty_sf_dir(spark):
    out = tempfile.mkdtemp(prefix="sf_empty_")
    # load_table (not raw spark.read): it owns the TIMESTAMP(NANOS)
    # normalization for events.ts, and SF_DIR honors the env override
    for t in TABLES:
        df = load_table(spark, SF_DIR, t).limit(0)
        tmp = os.path.join(out, f"_tmp_{t}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        shutil.move(os.path.join(tmp, part), os.path.join(out, f"{t}.parquet"))
        shutil.rmtree(tmp)
    yield out
    shutil.rmtree(out, ignore_errors=True)


@pytest.mark.parametrize("name", FIXED_REGRESSIONS)
def test_empty_input_fixed_regressions(spark, empty_sf_dir, name):
    ok, msg = run_compare(
        spark, empty_sf_dir, registry.queries()[name], registry.oracles()[name]
    )
    assert ok, f"{name} on empty input: {msg}"


@pytest.mark.empty
@pytest.mark.parametrize(
    "name", sorted(set(registry.oracles()) - EMPTY_DIVERGENT - EMPTY_RAISES)
)
def test_empty_input_sweep(spark, empty_sf_dir, name):
    ok, msg = run_compare(
        spark, empty_sf_dir, registry.queries()[name], registry.oracles()[name]
    )
    assert ok, f"{name} on empty input: {msg}"


@pytest.mark.empty
@pytest.mark.parametrize("name", sorted(EMPTY_RAISES))
def test_empty_input_loud_raisers(spark, empty_sf_dir, name):
    """The EMPTY_RAISES queries' documented empty-corpus contract is a
    LOUD ValueError (an IVF index cannot be quantized over zero seed
    vectors) — pin the raise and its message here, next to the sweep
    exemption that depends on it."""
    with pytest.raises(ValueError, match="no centroid seed vectors"):
        registry.queries()[name](spark, empty_sf_dir).collect()
