#!/usr/bin/env python
"""Dump `.explain("formatted")` for named queries into plans/r14/
as <query>_<tag>.txt — the before/after plan evidence for the
round-14 optimization work.

Usage: python scripts/dump_plan_r14.py <tag> <query> [<query> ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flight_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark(app_name="plan-dump-r14")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e
    qs = e.queries()
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan.strip() + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
