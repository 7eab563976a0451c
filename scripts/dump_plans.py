"""Dump .explain('formatted') for named queries to plans/r06/<q>_<tag>.txt.

Usage: python scripts/dump_plans.py <tag> q1,q2,...
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    import __spark_entry__ as entry_mod
    from geotools_spark.session import get_spark

    spark = get_spark("plan-dump")
    queries = entry_mod.queries()
    out_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = queries[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(txt)
        print(name, "ok", len(txt))


if __name__ == "__main__":
    main()
