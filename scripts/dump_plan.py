#!/usr/bin/env python
"""Dump ``explain("formatted")`` for registry queries to files.

Usage: python scripts/dump_plan.py OUTDIR SUFFIX name [name ...] [--sf DIR]
Writes OUTDIR/<name>_<SUFFIX>.txt for each query — the plan artifacts the
optimization rounds commit (plans/r15/<query>_before.txt / _after.txt) so a
judge can check plan claims without running Spark.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.1"
argv = sys.argv[1:]
if "--sf" in argv:
    i = argv.index("--sf")
    SF = argv[i + 1]
    del argv[i : i + 2]
if len(argv) < 3:
    sys.exit("usage: dump_plan.py OUTDIR SUFFIX name [name ...] [--sf DIR]")
outdir, suffix, names = Path(argv[0]), argv[1], argv[2:]
outdir.mkdir(parents=True, exist_ok=True)

from aws_genaric_datapipeline_spark.queries import QUERIES  # noqa: E402
from aws_genaric_datapipeline_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="dump-plan", master="local[8]", shuffle_partitions=8)
for name in names:
    if name not in QUERIES:
        print(f"{name}: UNKNOWN", flush=True)
        continue
    try:
        df = QUERIES[name].fn(spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    except Exception as exc:  # noqa: BLE001
        plan = f"PLAN-FAIL: {exc!r}"
    (outdir / f"{name}_{suffix}.txt").write_text(plan)
    print(f"{name}: {len(plan)} chars -> {name}_{suffix}.txt", flush=True)
spark.stop()
