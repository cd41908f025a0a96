#!/usr/bin/env python
"""Dump `.explain("formatted")` for a list of catalog entries into
plans/r11/<entry>_<tag>.txt (the optimization round's before/after
evidence). Usage:

    python tools/dump_plans_r11.py <tag> <outdir> <entry> [<entry> ...]

Run from a HEAD worktree with tag=before, from the working tree with
tag=after. Entries whose builder is eager (index writes, training
loops) dump the plan of the RETURNED DataFrame; the eager phases are
narrated in OPTIMIZATION_r11.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aliyun_emapreduce_datasources_spark.operators.catalog import QUERIES
from aliyun_emapreduce_datasources_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag, outdir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_session("dump-plans-r11")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = QUERIES[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — record the failure, keep going
            txt = f"PLAN DUMP FAILED: {e}\n"
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(txt)
        print(f"dumped {name}_{tag}", flush=True)


if __name__ == "__main__":
    main()
