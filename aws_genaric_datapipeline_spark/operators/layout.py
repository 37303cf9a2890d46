"""Physical data-layout operators: range-sorted writes and small-file
compaction.

At 100 TB the dominant scan costs are (a) reading row groups the filter
could have skipped and (b) opening millions of tiny files.  Both are layout
problems, fixed at WRITE time:

- ``write_range_sorted`` — global range partition + in-partition sort on
  the hot filter columns.  Each output file then covers a narrow min/max
  band, so parquet row-group statistics (and file-level pruning in formats
  that index them) skip everything outside the predicate.  This is the
  practical form of clustering/Z-ordering for single-column and prefix
  predicates.
- ``compact_parquet`` — rewrite a directory of small files into
  ~``target_rows`` files (streaming ingest and per-batch writes accumulate
  small files; the fix is a periodic coalescing rewrite, same data, fewer
  footers).

Reference parity: the reference writes one parquet dump per batch with no
layout control (raw_layer_job.py:164-167) — at scale that is exactly how
the small-file problem starts.
"""

from __future__ import annotations

import math
import shutil
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def write_range_sorted(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on ``cols``: range-partitioned
    across files, sorted within each file.

    repartitionByRange samples the keys to build balanced range bounds
    (handles skew better than hash for ordered scans); sortWithinPartitions
    makes every row group's min/max stats tight.  One shuffle, paid once at
    write — every later filtered scan wins.
    """
    (
        df.repartitionByRange(num_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark: SparkSession, path: str, target_rows: int = 1_000_000
) -> int:
    """Rewrite a parquet directory into ``ceil(rows / target_rows)`` files.

    Returns the new file count.  The rewrite goes to a temp directory first
    and swaps in atomically-enough for a single writer (a real multi-writer
    deployment would do this under a table format's commit protocol).
    Row order is not preserved — parquet directories are unordered sets.
    """
    df = spark.read.parquet(path)
    n_rows = df.count()
    n_files = max(1, math.ceil(n_rows / target_rows))
    tmp = tempfile.mkdtemp(prefix="compact_", dir=str(Path(path).parent))
    try:
        df.repartition(n_files).write.mode("overwrite").parquet(tmp)
        out = spark.read.parquet(tmp)
        assert out.count() == n_rows, "compaction must preserve row count"
        shutil.rmtree(path)
        shutil.move(tmp, path)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return n_files
