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

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window


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


def range_partition_bounds(
    df: DataFrame,
    key_col: str,
    id_col: str,
    num_ranges: int = 8,
    sample_bp: int = 500,
) -> DataFrame:
    """Balanced range-partition bounds from a DETERMINISTIC sample, plus
    the full-scan balance report — the planning step behind
    write_range_sorted at scale.  Spark's own repartitionByRange samples
    with an RNG, so its bounds change run to run; a layout job that must
    be reproducible (and replayable by an oracle) derives bounds from a
    content-hash sample instead.

    Bounds are DISCRETE sample quantiles — actual sample values at ranks
    ceil(i·n/R) — never interpolated: an interpolated bound is new float
    arithmetic that can differ by an ulp across engines and reassign rows
    near the boundary, while a data value is bit-exact everywhere.  Rows
    with key > bound_i fall right of range i (strict: ties stay left).

    Scale shape: the sample (sample_bp basis points of rows, size-bounded
    the same way RangePartitioner's driver-side sample is) goes through
    one global-order window; the FULL table is then assigned by a
    broadcast bounds array in a single scan — range_id per row costs
    num_ranges comparisons, no shuffle before the final R-row aggregate.
    Returns (range_id, n_rows, min_key, max_key): a balanced layout shows
    n_rows within ~±2·R/sqrt(sample size) of uniform."""
    from aws_genaric_datapipeline_spark.operators.sampling import (
        deterministic_sample,
    )

    sample = deterministic_sample(df, id_col, sample_bp).select(
        F.col(key_col).alias("k"), F.col(id_col).alias("id")
    )
    w_rank = Window.orderBy("k", "id")
    ranked = sample.select(
        "k",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("c"),
    )
    positions = F.array(
        *[
            F.ceil(F.lit(float(i)) * F.col("c") / F.lit(float(num_ranges)))
            for i in range(1, num_ranges)
        ]
    )
    bounds = ranked.where(F.array_contains(positions, F.col("rn"))).agg(
        F.sort_array(F.collect_list("k")).alias("bounds")
    )
    assigned = df.crossJoin(F.broadcast(bounds)).select(
        F.aggregate(
            F.col("bounds"),
            F.lit(0),
            lambda acc, b: acc
            + F.when(F.col(key_col) > b, F.lit(1)).otherwise(F.lit(0)),
        )
        .cast("bigint")
        .alias("range_id"),
        F.col(key_col).alias("k"),
    )
    return assigned.groupBy("range_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("k").alias("min_key"),
        F.max("k").alias("max_key"),
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


def zorder_value(col_a, col_b, bits: int = 16):
    """Z-order (Morton) value from two numeric columns: interleave the top
    ``bits`` bits of each column's rank-scaled value.  Clustering files by
    this value keeps BOTH columns' per-file min/max bands narrow, so
    row-group statistics prune scans filtered on either column — the
    standard multi-dimensional clustering trick, as a pure JVM expression
    (shift/mask arithmetic, whole-stage codegen).

    Inputs must already be non-negative integers in [0, 2^bits) — use
    ``ntile`` or rank-scaling upstream for arbitrary distributions.
    """
    import pyspark.sql.functions as F

    a = col_a.cast("bigint")
    b = col_b.cast("bigint")
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        abit = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b, i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(abit, 2 * i)).bitwiseOR(
            F.shiftleft(bbit, 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    num_files: int = 8,
    bits: int = 12,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on the Z-order curve of two columns.

    Ranks each column to a uniform [0, 2^bits) grid first (ntile windows —
    distribution-free), computes the Morton value, then range-partitions
    and sorts by it.  Per-file min/max bands stay narrow on BOTH columns,
    unlike single-column sorting which only helps its leading column.
    """
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    n = 1 << bits
    ranked = df.withColumn(
        "__ra", F.ntile(n).over(Window.orderBy(col_a)) - 1
    ).withColumn("__rb", F.ntile(n).over(Window.orderBy(col_b)) - 1)
    z = ranked.withColumn("__z", zorder_value(F.col("__ra"), F.col("__rb"), bits))
    (
        z.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__ra", "__rb", "__z")
        .write.mode(mode)
        .parquet(path)
    )


def hilbert_value(col_a, col_b, bits: int = 8):
    """Hilbert-curve index of two grid coordinates — the
    locality-stronger alternative to the Z-order (Morton) interleave:
    the Hilbert curve has no long diagonal jumps, so consecutive curve
    positions are always grid-adjacent and a clustered file covers a
    tighter 2-D region for the same row count (why Databricks' liquid
    clustering moved past Z-order).

    Pure JVM expression: the classic per-level rotate/reflect walk
    (Hamilton's d2xy inverse) unrolled over ``bits`` levels —
    comparisons, arithmetic, and F.when chains only, so the whole thing
    whole-stage-codegens; no UDF.  Inputs must be non-negative integers
    in [0, 2^bits) — same contract as zorder_value.
    """
    import pyspark.sql.functions as F

    x = col_a.cast("bigint")
    y = col_b.cast("bigint")
    d = F.lit(0).cast("bigint")
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        rx = F.when(x.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(y.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        d = d + F.lit(s).cast("bigint") * F.lit(s) * (
            (F.lit(3) * rx).bitwiseXOR(ry)
        )
        # rotate/reflect the quadrant so the next level walks the curve
        # in canonical orientation
        nx = F.when(
            ry == 0,
            F.when(rx == 1, F.lit(s - 1) - y).otherwise(y),
        ).otherwise(x)
        ny = F.when(
            ry == 0,
            F.when(rx == 1, F.lit(s - 1) - x).otherwise(x),
        ).otherwise(y)
        x, y = nx, ny
    return d


def zorder_value_multi(cols: list, bits: int = 8):
    """Z-order (Morton) value over K columns: bit i of column j lands at
    output position i·K + j (round-robin interleave — the 2-column
    zorder_value generalized; K·bits must stay ≤ 62 to fit a bigint).
    Clustering by this keeps EVERY column's per-file band narrow, so a
    box predicate on any subset of the K dimensions prunes files.
    Pure shift/mask arithmetic — whole-stage codegen, no UDF."""
    import pyspark.sql.functions as F

    k = len(cols)
    if k < 2:
        raise ValueError("zorder_value_multi needs at least 2 columns")
    if k * bits > 62:
        raise ValueError(f"{k} cols x {bits} bits overflows a bigint")
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("bigint"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + j))
    return z
