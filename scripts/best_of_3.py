#!/usr/bin/env python
"""Quiet-window best-of-3 re-measure for specific registry queries.

Protocol (matches BASELINE.md's re-measure discipline): fresh process,
sf0.001 compile pass per query (codegen/broadcast/Arrow warm), then
THREE timed sf0.1 runs with clearCache between, recording every run and
the minimum.  The min of three standalone runs is the steady-state cost
a long-lived session pays; single-shot numbers on a shared VM carry
multi-second interference spikes.

Usage: python scripts/best_of_3.py [SF_DIR] name [name ...]
Writes /tmp/best_of_3.json with {"name": {"runs": [...], "min": x}}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from aws_genaric_datapipeline_spark.queries import QUERIES  # noqa: E402
from aws_genaric_datapipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    if args and "/" in args[0]:
        sf, names = args[0], args[1:]
    else:
        sf, names = "/root/testdata/sf0.1", args
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown query name(s): {', '.join(unknown)}")
    if not names:
        sys.exit("usage: best_of_3.py [SF_DIR] name [name ...]")
    spark = get_spark(app_name="best-of-3", master="local[32]")
    QUERIES["q1_pricing_summary"].fn(spark, sf).count()
    import pyspark.sql.functions as F  # noqa: E402

    spark.range(64, numPartitions=4).select(
        F.pandas_udf(lambda s: s, "long")(F.col("id"))
    ).count()
    from aws_genaric_datapipeline_spark.tables import compile_sf_dir

    compile_dir = compile_sf_dir(sf)
    out: dict[str, dict] = {}
    for name in names:
        try:
            QUERIES[name].fn(spark, compile_dir).write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception as exc:
            print(name, "COMPILE-FAIL", repr(exc)[:120], flush=True)
        spark.catalog.clearCache()
        runs: list[float] = []
        for _ in range(3):
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {"runs": runs, "min": min(runs)}
        print(name, runs, "min", min(runs), flush=True)
    Path("/tmp/best_of_3.json").write_text(
        json.dumps({"sf": sf, "results": out}, indent=1)
    )


if __name__ == "__main__":
    main()
