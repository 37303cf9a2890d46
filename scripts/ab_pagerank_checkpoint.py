#!/usr/bin/env python
"""Interleaved A/B: pagerank static-frame checkpoints lazy (r15, current)
vs eager (r14 shape) — settles VERDICT r15 item 2.

Monkeypatches DataFrame.localCheckpoint so variant "eager" forces
eager=True on every call inside the pagerank build (the r14 behavior);
variant "lazy" runs the code as committed.  Interleaved L,E,L,E,L,E in ONE
session (same JIT/cache state for both arms), sf0.001 warmup first,
clearCache between runs.  Prints per-run seconds and min/median per arm.

Usage: python scripts/ab_pagerank_checkpoint.py [query] [rounds]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame  # noqa: E402

from aws_genaric_datapipeline_spark.queries import QUERIES  # noqa: E402
from aws_genaric_datapipeline_spark.session import get_spark  # noqa: E402

QUERY = sys.argv[1] if len(sys.argv) > 1 else "graph_pagerank_centrality"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
SF_WARM = "/root/testdata/sf0.001"
SF = "/root/testdata/sf0.1"

spark = get_spark()
fn = QUERIES[QUERY].fn

_orig = DataFrame.localCheckpoint
_force_eager = False


def _patched(self, eager=True):
    if _force_eager:
        eager = True
    return _orig(self, eager=eager)


DataFrame.localCheckpoint = _patched


def run(sf_dir: str) -> float:
    spark.catalog.clearCache()
    t0 = time.monotonic()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


# warmup: compile/broadcast paths for both arms
for _force_eager in (False, True):
    run(SF_WARM)

results = {"lazy": [], "eager": []}
for _ in range(ROUNDS):
    for arm, flag in (("lazy", False), ("eager", True)):
        _force_eager = flag
        spark.sparkContext.setJobDescription(f"{QUERY} ab:{arm}")
        results[arm].append(round(run(SF), 3))

out = {
    arm: {"runs": rs, "min": min(rs), "med": sorted(rs)[len(rs) // 2]}
    for arm, rs in results.items()
}
print(json.dumps({"query": QUERY, "sf": SF, **out}, indent=2))
Path("/tmp/ab_pagerank.json").write_text(json.dumps(out))
