"""Primary correctness gate (SURVEY.md §5.2-1): every registered query
with a SQL oracle is differential-tested against DuckDB at sf0.01 —
the same comparison shape the driver runs.
"""

from __future__ import annotations

import pytest

from mapreduceplusplus_spark import registry
from tests.conftest import SF_DIR_ORACLE
from tests.oracle_harness import run_compare

registry.load_all()
CASES = sorted(registry.oracles().keys())


@pytest.mark.parametrize("name", CASES)
def test_oracle_match(spark, name):
    ok, msg = run_compare(
        spark, SF_DIR_ORACLE, registry.queries()[name], registry.oracles()[name]
    )
    assert ok, f"{name}: {msg}"


def test_all_queries_return_rows(spark):
    """Rows-only smoke for every registered query (incl. oracle-less) —
    the driver's entry() contract is rows > 0, so empty results fail."""
    for name, fn in registry.queries().items():
        df = fn(spark, SF_DIR_ORACLE)
        assert df.count() > 0, f"{name} returned no rows"
