#!/usr/bin/env python
"""One-shot full-registry timing sweep at sf0.1 (round-10 VERDICT item 4).

Every registered query gets ONE recorded sf0.1 wall time after a sf0.001
compile pass, so no >2x surprise hides outside the bench gate's headline
set.  Queries that measure above ~1.5 s should then be re-measured
best-of-3 in a quiet window and promoted into BASELINE_GATES.json; the
whole table lands in BASELINE.md's tier-2 section.

Usage: python scripts/full_sweep.py [SF_DIR] [name ...]
Writes /tmp/full_sweep.json and prints one line per query.
One-shot numbers on this VM carry interference spikes — treat anything
surprising as a candidate for best-of-3 re-measurement, not a verdict.
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
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or sorted(QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown query name(s): {', '.join(unknown)}")
    spark = get_spark(app_name="full-sweep", master="local[32]")
    QUERIES["q1_pricing_summary"].fn(spark, sf).count()
    import pyspark.sql.functions as F  # noqa: E402

    spark.range(64, numPartitions=4).select(
        F.pandas_udf(lambda s: s, "long")(F.col("id"))
    ).count()
    from aws_genaric_datapipeline_spark.tables import compile_sf_dir

    compile_dir = compile_sf_dir(sf)
    out: dict[str, float | None] = {}
    compile_failed: list[str] = []
    for name in names:
        try:
            QUERIES[name].fn(spark, compile_dir).write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception as exc:
            # the timed run below then includes codegen cost — tag it so
            # the number is never promoted into BASELINE_GATES.json
            compile_failed.append(name)
            print(name, "COMPILE-FAIL", repr(exc)[:120], flush=True)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            QUERIES[name].fn(spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()
            out[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:
            out[name] = None
            print(name, "FAIL", repr(exc)[:200], flush=True)
        spark.catalog.clearCache()
        tag = " (compile-fail, includes codegen)" if name in compile_failed else ""
        print(name, out[name], tag, flush=True)
    Path("/tmp/full_sweep.json").write_text(
        json.dumps({"sf": sf, "sec": out, "compile_failed": compile_failed}, indent=1)
    )
    print(json.dumps({"n": len(out), "sf": sf}))


if __name__ == "__main__":
    main()
