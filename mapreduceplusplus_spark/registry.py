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
- top-k queries always carry a unique tiebreaker in the ORDER BY.
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
]

_loaded = False


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
    return dict(QUERIES)


def oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)
