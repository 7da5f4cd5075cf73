#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to plans/r16/<q>_<tag>.txt.

Usage: python plans/r16/dump_plans.py <tag> <query> [<query> ...]
  SPARK_GRAFT_SF_DIR selects the dataset (default /root/testdata/sf0.1).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
sys.path.insert(0, "/root/repo")

from mapreduceplusplus_spark import registry  # noqa: E402
from mapreduceplusplus_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"plans_{tag}")
    qs = registry.queries()
    out_dir = os.path.dirname(os.path.abspath(__file__))
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
