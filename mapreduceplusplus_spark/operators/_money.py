"""Shared exact-money expression helpers.

Lives in a leaf module with no query registrations so that BOTH
``operators.tpch`` and ``operators.advanced`` can import it at module
top-level without one triggering the other's query registration
mid-import (ADVICE r6: the previous ``advanced → tpch`` top-level
import made tpch register its 16 queries in the middle of
``registry._QUERY_MODULES``'s documented append-at-the-END order).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def bp_ratio_halfup(num: str, den: str):
    """Half-up basis points of ``num/den`` as an exact integer —
    ``(20000·num + den) div (2·den)`` — computed in DECIMAL(38,0) so
    the 20000× blow-up cannot overflow BIGINT.  The 5× split-
    replication harness caught exactly this: 1e-4-unit revenue sums
    reach ~2.3e16 at 5× sf0.1 (1e9 per line × tens of millions of
    lines), and 20000× that is past 2^63 — ANSI Spark threw
    ARITHMETIC_OVERFLOW while DuckDB's HUGEINT sum sailed through.
    DECIMAL(38,0) holds ~1e38: safe past 1e33 in the denominator,
    i.e. any conceivable money sum.  ``div`` on decimals returns
    BIGINT, which the ≤10000 result always fits."""
    d38 = "DECIMAL(38,0)"
    return F.expr(
        f"(20000 * CAST({num} AS {d38}) + {den})"
        f" div (2 * CAST({den} AS {d38}))"
    ).cast("bigint")
