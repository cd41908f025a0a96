#!/usr/bin/env python
"""Same-session interleaved config A/B for RUNTIME SQL confs: each rep
runs every entry twice — arm A (conf unset/default) and arm B (conf
set) — alternating arm order per rep so heap-debt/band drift cancels.
This is the only A/B shape that survives this host's 0.85-4x ambient
band (see bench_history/NOTES_r11opt.md).

Usage:
    python tools/probe_conf_inline_ab.py <sf_dir> <out.json> <reps> \
        <conf_key=conf_value> <entry> [<entry> ...]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir, out_p, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    key, val = sys.argv[4].split("=", 1)
    names = sys.argv[5:]

    from aliyun_emapreduce_datasources_spark.operators.catalog import QUERIES
    from aliyun_emapreduce_datasources_spark.session import get_session

    spark = get_session("probe-inline-ab")
    spark.sparkContext.setLogLevel("ERROR")
    default = spark.conf.get(key, None)

    def run(name: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        return round(dt, 4)

    # warmup both arms once
    QUERIES["lr_scoring"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for name in names:
        run(name)
        spark.conf.set(key, val)
        run(name)
        spark.conf.unset(key) if default is None else spark.conf.set(key, default)

    a: dict[str, list[float]] = {n: [] for n in names}
    b: dict[str, list[float]] = {n: [] for n in names}
    for r in range(reps):
        for name in names:
            order = ["a", "b"] if r % 2 == 0 else ["b", "a"]
            for arm in order:
                if arm == "a":
                    if default is None:
                        spark.conf.unset(key)
                    else:
                        spark.conf.set(key, default)
                    a[name].append(run(name))
                else:
                    spark.conf.set(key, val)
                    b[name].append(run(name))
    out = {
        "metric": "probe_conf_inline_ab",
        "conf": {key: val},
        "a_runs": a,
        "b_runs": b,
        "a_min": {n: min(v) for n, v in a.items()},
        "b_min": {n: min(v) for n, v in b.items()},
        "sf_dir": sf_dir,
    }
    with open(out_p, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({n: (out["a_min"][n], out["b_min"][n]) for n in names}))


if __name__ == "__main__":
    main()
