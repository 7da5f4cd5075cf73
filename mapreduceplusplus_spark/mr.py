"""The MapReduce UDF contract — the reference's defining feature, on Spark.

The reference's entire programming model (``/root/reference/mr/word_count.h:16-38``)
is two user functions compiled into the worker:

- ``Generator<KV> map(path, contents)`` — a coroutine that lazily yields
  key/value pairs from one input split (driver loop
  ``/root/reference/src/worker.cc:135,173-182``);
- ``V reduce(K key, IT first, IT last)`` — a fold over all values of one
  key (driver loop ``/root/reference/src/worker.cc:237-243``), fed from
  the sorted grouped map built at ``src/worker.cc:208-229``.

Here the same contract is expressed Spark-first:

- the map phase is ``mapInPandas`` (Arrow-batched; the lazy-yield
  semantics of the reference's coroutine map directly onto the
  generator-of-batches protocol — no full materialization);
- the R-way hash shuffle (``std::hash(key) % R + 1``,
  ``src/worker.cc:176-179``) is ``repartition(R, key)`` — Catalyst
  recognizes the resulting ``HashPartitioning(key, R)`` as satisfying
  the grouped distribution required by the reduce, so exactly ONE
  shuffle runs, same as the reference;
- the reduce phase is ``applyInPandas`` over ``groupBy(key)``: one
  user fold per key, Arrow-batched, many keys per task;
- unlike the reference (which has NO combiner — every (k,v) pair
  crosses the shuffle, ``src/worker.cc:173-182``), an optional
  associative ``combine_fn`` runs map-side per Arrow batch, collapsing
  duplicate keys before the exchange.  At 100 TB this is the difference
  between shuffling ~token-count rows and ~distinct-key rows per batch.

Scale posture: Python UDFs are the slow path by design — this module is
the *arbitrary-logic escape hatch*, mirroring the reference's "any C++
in map/reduce" capability.  Everything SQL-expressible should use the
declarative operators instead (they stay in whole-stage codegen).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

MapFn = Callable[[dict[str, Any]], Iterable[tuple[Any, Any]]]
ReduceFn = Callable[[Any, list[Any]], Any]
CombineFn = Callable[[Any, list[Any]], Any]


def _ddl_field_names(schema: str) -> list[str]:
    """Top-level field names of a DDL schema string, via the real DDL
    parser — a naive ``schema.split(',')`` breaks on nested types like
    ``array<struct<a:int,b:int>>``."""
    return StructType.fromDDL(schema).fieldNames()


def flat_map(
    df: DataFrame,
    gen_fn: MapFn,
    schema: str = "key string, value bigint",
) -> DataFrame:
    """UDTF stage: run a Python generator over every row, distributed.

    ``gen_fn(row_dict)`` yields output tuples matching ``schema`` — the
    exact shape of the reference map coroutine
    (``mr/word_count.h:16-32``), with the input row standing in for the
    (path, contents) pair.  Arrow-batched via ``mapInPandas``; the
    generator is consumed lazily per batch, never fully materialized.
    """
    col_names = _ddl_field_names(schema)
    n_cols = len(col_names)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[list[Any]] = [[] for _ in range(n_cols)]
            for rec in pdf.to_dict("records"):
                for tup in gen_fn(rec):
                    for i in range(n_cols):
                        out[i].append(tup[i])
            yield pd.DataFrame(dict(zip(col_names, out)))

    return df.mapInPandas(run, schema=schema)


def fold_by_key(
    df: DataFrame,
    key_col: str,
    value_col: str,
    reduce_fn: ReduceFn,
    schema: str | None = None,
) -> DataFrame:
    """UDAF stage: the reference reduce contract ``V reduce(K, values)``.

    One Python fold per key (``mr/word_count.h:34-38`` is
    ``std::accumulate``), executed via ``applyInPandas`` — Arrow moves
    each key group as a columnar batch; Spark packs many key groups per
    task, so per-group overhead amortizes.
    """
    if schema is None:
        ktype = dict(df.dtypes)[key_col]
        vtype = dict(df.dtypes)[value_col]
        schema = f"{key_col} {ktype}, {value_col} {vtype}"

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        k = pdf[key_col].iloc[0]
        v = reduce_fn(k, pdf[value_col].tolist())
        return pd.DataFrame({key_col: [k], value_col: [v]})

    return df.groupBy(key_col).applyInPandas(fold, schema=schema)


def map_reduce(
    df: DataFrame,
    map_fn: MapFn,
    reduce_fn: ReduceFn,
    num_partitions: int,
    kv_schema: str = "key string, value bigint",
    combine_fn: CombineFn | None = None,
) -> DataFrame:
    """End-to-end reference job semantics: map → R-way shuffle → reduce.

    Reproduces the full pipeline of ``run_demo.sh`` with
    ``MR_REDUCE_NUM_TASKS = num_partitions``: user map generator over
    every input row, hash partitioning on the key into exactly R
    partitions, user fold per key.  ``combine_fn`` (optional, must be
    associative w.r.t. ``reduce_fn``) collapses duplicate keys map-side
    per Arrow batch — the combiner the reference lacks.
    """
    key_col, value_col = _ddl_field_names(kv_schema)
    mapped = flat_map(df, map_fn, schema=kv_schema)

    if combine_fn is not None:

        def combine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf):
                    pdf = (
                        pdf.groupby(key_col, sort=False)[value_col]
                        .apply(lambda s: combine_fn(s.name, s.tolist()))
                        .reset_index()
                    )
                yield pdf

        mapped = mapped.mapInPandas(combine, schema=kv_schema)

    shuffled = mapped.repartition(num_partitions, F.col(key_col))
    return fold_by_key(shuffled, key_col, value_col, reduce_fn, schema=kv_schema)
