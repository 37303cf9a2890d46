"""Mini transaction-log table format: ACID tables over parquet + a
JSON commit log — the correct-by-construction completion of the
reference's broken batch lifecycle (prepared_layer_job.py:176-208 tried
to coordinate raw→prepared promotion through DynamoDB writes and
crashed; here coordination IS the table format).

Delta-Lake-shaped, deliberately small:

- A table is a directory:  ``data/`` parquet files + ``_txn_log/``
  holding one JSON commit per version (``00000000000000000001.json``).
- A commit lists ACTIONS: files added, files removed, the operation
  name, and an optional ``app_txn_id`` for idempotent re-commit.
- The LIVE snapshot at version V = replay of adds minus removes up to V.
  Readers pin a version => SNAPSHOT ISOLATION (a concurrent overwrite
  cannot change what a pinned reader sees; data files are immutable and
  never edited in place).
- Commit publication is ``os.open(..., O_CREAT | O_EXCL)`` of the next
  version file: exactly one of two racing writers wins the version; the
  loser re-reads the log and either RETRIES (disjoint files) or raises
  ``TxnConflict`` (overlapping reads — the optimistic concurrency rule).
- Orphan data files (a writer that crashed after writing parquet but
  before committing) are INVISIBLE: readers load only files the log
  names.  ``vacuum()`` deletes them.

Scale notes: the log is one tiny JSON per commit and the snapshot
computation is a driver-side fold over file names — same cost class as
Delta's log replay.  Data-file IO is all DataFrame parquet; at 100 TB
the data path is unchanged parquet scan/write, and the only global
coordination is the single version-file create, which object stores
expose as put-if-absent.

This module is filesystem-backed (tests/local mode).  The commit
protocol (read version, write files, create-exclusive next version,
conflict check on loss) is the portable part.
"""

from __future__ import annotations

import datetime
import hashlib
import json
import os
import shutil
import time
import uuid
from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


class TxnConflict(RuntimeError):
    """A concurrent commit invalidated this transaction's snapshot."""


def _stat_bound(stat_val, bound):
    """Make a committed footer stat and a user/query literal comparable:
    _footer_stats STRINGIFIES non-primitive scalars (dates, timestamps),
    so a date/datetime literal must compare as its str() form — Python's
    str() produced both sides, and ISO formatting is order-preserving
    under lexicographic comparison.  Without this, every stats
    comparison on a date/timestamp column raises TypeError ('<' between
    str and datetime.date)."""
    if isinstance(stat_val, str) and not isinstance(bound, str):
        return str(bound)
    return bound


class ConstraintViolation(ValueError):
    """A write batch violated a table CHECK constraint — nothing committed."""


def _footer_stats(path: Path) -> dict:
    """Per-column [min, max] plus per-column NULL COUNTS from a parquet
    file's footer (pyarrow) — JSON-safe scalars only; columns without
    statistics are omitted, and a reader treats a missing column as
    'cannot prune'."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    # Row count under a reserved key: provably-empty files ("__rows__": 0)
    # can be skipped by pruned merges, and metadata-only COUNT(*) reads
    # fold these instead of opening files.  Null counts under "__nulls__"
    # (column -> count summed over row groups; a column any of whose row
    # groups lacks the statistic is omitted = unknown): `IS NULL`
    # predicates skip files with 0 nulls and `IS NOT NULL` skips all-null
    # files, the way min/max skips ranges (Delta collects nullCount in
    # exactly this role).  Neither is ever a legal column name in the
    # min/max map (columns are parquet paths; dunder keys are reserved).
    out: dict[str, list | int | dict] = {"__rows__": md.num_rows}
    nulls: dict[str, int] = {}
    null_unknown: set[str] = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            st = col.statistics
            name = col.path_in_schema
            if st is not None and st.has_null_count:
                nulls[name] = nulls.get(name, 0) + int(st.null_count)
            else:
                null_unknown.add(name)
            if st is None or not st.has_min_max:
                continue
            mn, mx = st.min, st.max
            if isinstance(mn, bytes) or isinstance(mx, bytes):
                continue
            if not isinstance(mn, (int, float, str, bool)):
                mn, mx = str(mn), str(mx)
            if name in out:
                out[name] = [min(out[name][0], mn), max(out[name][1], mx)]
            else:
                out[name] = [mn, mx]
    known_nulls = {
        c: n for c, n in nulls.items() if c not in null_unknown
    }
    if known_nulls:
        out["__nulls__"] = known_nulls
    return out


def _struct_from_rec(rec: list) -> "StructType":
    """StructType from a committed ``__schema__`` record
    ([[name, spark_type_json], ...]) — every field nullable, matching how
    file-based scans surface columns."""
    from pyspark.sql.types import StructType

    return StructType.fromJson(
        {
            "type": "struct",
            "fields": [
                {
                    "name": cname,
                    "type": json.loads(tj),
                    "nullable": True,
                    "metadata": {},
                }
                for cname, tj in rec
            ],
        }
    )


def _bloom_key(v) -> str | None:
    """Normalize a value for bloom hashing, or None if the type has no
    stable cross-engine spelling.  str() is the shared spelling on BOTH
    sides (pyarrow ``to_pylist`` objects at write, user literals at
    probe), so int32-vs-int64 or probe-literal-type mismatches can never
    split the hash the way a raw-bytes hash would (the xxhash64
    type-sensitivity class `_transform_literals` had to fix).  Floats,
    decimals and timestamps are UNSUPPORTED by design: float point
    lookups are ill-posed, and timestamp str() spellings differ between
    tz-aware and naive objects — a mismatch there would silently skip a
    matching file, so those types contribute no bloom (reads stay
    conservative) rather than a wrong one."""
    if isinstance(v, (bool, int, str)):
        return str(v)
    if type(v) is datetime.date:
        return str(v)
    return None


def _bloom_positions(key: str, m: int, k: int) -> list[int]:
    """k bit positions for ``key`` via md5 double hashing (h1 + i*h2) —
    deterministic across processes and runs (never Python's seeded
    hash())."""
    d = hashlib.md5(key.encode("utf-8")).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:16], "big") | 1
    return [(h1 + i * h2) % m for i in range(k)]


def _bloom_maybe(bits: set[int], m: int, k: int, value) -> bool:
    """Membership test against a committed per-file bloom (``bits`` is
    the file's position set, built ONCE per file — multi-value IN-set
    probes reuse it): True = cannot rule the value out (unsupported
    probe types always True — pruning is an optimization, never a
    correctness gate)."""
    key = _bloom_key(value)
    if key is None:
        return True
    return all(p in bits for p in _bloom_positions(key, m, k))


def _file_bloom(path: Path, spec: dict[str, dict]) -> dict[str, dict]:
    """Per-column sparse bloom bitsets for a just-written parquet file
    (declared columns only): the write-side half of point-lookup file
    skipping.  Metadata size is bounded by ``m`` bit positions per
    column per file regardless of row count — the Delta bloom-index
    role, kept in the commit log so probe planning never opens data
    files.  A column whose type has no stable spelling (see _bloom_key)
    is omitted — readers treat a missing bloom as 'cannot prune'."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    present = [c for c in spec if c in pf.schema_arrow.names]
    if not present:
        return {}
    tbl = pf.read(columns=present)
    out: dict[str, dict] = {}
    for c in present:
        mk = spec[c]
        vals = set(tbl.column(c).to_pylist()) - {None}
        if not vals:
            continue
        keys = [_bloom_key(v) for v in vals]
        if any(key is None for key in keys):
            continue  # unsupported column type: no bloom, never a wrong one
        bits: set[int] = set()
        for key in keys:
            bits.update(_bloom_positions(key, mk["m"], mk["k"]))
        out[c] = {"m": mk["m"], "k": mk["k"], "bits": sorted(bits)}
    return out


class TxnTable:
    """ACID parquet table at ``path`` with a JSON commit log."""

    LOG_DIR = "_txn_log"
    DATA_DIR = "data"

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = Path(path)
        (self.path / self.LOG_DIR).mkdir(parents=True, exist_ok=True)
        (self.path / self.DATA_DIR).mkdir(parents=True, exist_ok=True)

    # ------------------------------------------------------------------ log
    def _log_path(self, version: int) -> Path:
        return self.path / self.LOG_DIR / f"{version:020d}.json"

    def _commits(self) -> list[dict]:
        out = list(self.commits_iter())
        out.reverse()
        return out

    def commits_iter(self, newest_first: bool = True):
        """Lazily parse commit JSONs (numeric-stem files only — the log
        dir also holds refs.json/tags), newest-first by default.  The ONE
        place commit-log listing/filtering/parsing lives: early-stopping
        consumers (cdf_applied_high_water) and the full-history reader
        (_commits) both draw from it, so a log-layout change cannot
        silently diverge the two."""
        paths = sorted(
            (self.path / self.LOG_DIR).glob("*.json"), reverse=newest_first
        )
        for p in paths:
            if p.stem.isdigit():
                with open(p) as fh:
                    yield json.load(fh)

    def latest_version(self) -> int:
        """Highest committed version; 0 = empty table (no commits)."""
        versions = [
            int(p.stem)
            for p in (self.path / self.LOG_DIR).glob("*.json")
            if p.stem.isdigit()
        ]
        return max(versions, default=0)

    def live_files(
        self, version: int | None = None, commits: list[dict] | None = None
    ) -> list[str]:
        """File names live at ``version`` (default: latest).  ``commits``
        lets callers reuse an already-parsed log."""
        v = self.latest_version() if version is None else version
        commits = self._commits() if commits is None else commits
        if commits and commits[0].get("base") and v < commits[0]["version"]:
            # expire_snapshots collapsed history below this point; an
            # expired version must FAIL loudly, not read back empty.
            raise ValueError(
                f"version {v} has been expired (earliest retained: "
                f"{commits[0]['version']})"
            )
        live: set[str] = set()
        for c in commits:
            if c["version"] > v:
                break
            if c.get("base"):
                # A checkpoint commit is AUTHORITATIVE: its adds are the
                # complete live set at that version.  Resetting here makes
                # expire_snapshots crash-safe — if a crash (or a concurrent
                # reader) catches the log between the checkpoint swap and
                # the unlink of the old commit files, replaying commits
                # 1..cutoff-1 *and* the checkpoint still yields exactly the
                # checkpoint's file set, never resurrected pre-cutoff files.
                live = set()
            live -= set(c["removes"])
            live |= set(c["adds"])
        return sorted(live)

    def dv_map(
        self, version: int | None = None, commits: list[dict] | None = None
    ) -> dict[str, str]:
        """data-file name -> deletion-vector file name live at ``version``
        (default latest) — the merge-on-read state.  Folds the same commit
        replay as live_files: a checkpoint commit resets the mapping to
        what it carries, a commit that REMOVES a data file drops its DV
        entry (the rewrite already applied it), and ``dv_updates`` install
        or replace per-file vectors.  Empty dict = no DVs anywhere, and
        every read path stays on the untouched fast path."""
        v = self.latest_version() if version is None else version
        commits = self._commits() if commits is None else commits
        dvs: dict[str, str] = {}
        for c in commits:
            if c["version"] > v:
                break
            if c.get("base"):
                dvs = {}
            for f in c["removes"]:
                dvs.pop(f, None)
            for f, d in (c.get("dv_updates") or {}).items():
                if d is None:
                    # explicit clear marker (restore_version un-doing a
                    # vector added after the restore point)
                    dvs.pop(f, None)
                else:
                    dvs[f] = d
        return dvs

    def _dv_rows(self, dv_files: list[str]) -> DataFrame:
        """(file, pos) rows of the given deletion-vector parquet files."""
        return self.spark.read.parquet(
            *[str(self.path / self.DATA_DIR / f) for f in sorted(set(dv_files))]
        )

    def history(self) -> list[dict]:
        """Commit metadata (version, op, n_adds, n_removes, app_txn_id)."""
        return [
            {
                "version": c["version"],
                "op": c["op"],
                "n_adds": len(c["adds"]),
                "n_removes": len(c["removes"]),
                "app_txn_id": c.get("app_txn_id"),
            }
            for c in self._commits()
        ]

    # ------------------------------------------------- schema evolution
    def _schema_commits(
        self, upto: int | None = None, commits: list[dict] | None = None
    ) -> list[dict]:
        """Schema snapshots [{version, fields}] ascending, where fields is
        [{"id": int, "name": str}, ...] — one entry per rename/drop commit
        plus any history carried forward by an expire_snapshots
        checkpoint.  Empty list = never evolved (identity mapping).
        ``commits`` lets callers reuse an already-parsed log."""
        snaps: dict[int, dict] = {}
        for c in self._commits() if commits is None else commits:
            for h in c.get("schema_history") or []:
                snaps.setdefault(h["version"], h)
            if c.get("schema"):
                snaps[c["version"]] = {
                    "version": c["version"],
                    "fields": c["schema"]["fields"],
                    "pre_fields": c["schema"].get(
                        "pre_fields", c["schema"]["fields"]
                    ),
                }
        out = [snaps[v] for v in sorted(snaps)]
        if upto is not None:
            out = [s for s in out if s["version"] <= upto]
        return out

    def _file_add_versions(
        self, commits: list[dict] | None = None
    ) -> dict[str, int]:
        """File name -> version whose commit FIRST added it (the write
        era deciding which physical column names the file carries).
        Checkpoint commits carry the original versions forward in
        ``add_versions``; their own re-adds only backstop files with no
        recorded origin."""
        out: dict[str, int] = {}
        for c in self._commits() if commits is None else commits:
            for f, v in (c.get("add_versions") or {}).items():
                out.setdefault(f, int(v))
            for f in c["adds"]:
                out.setdefault(f, c["version"])
        return out

    def _file_write_schemas(
        self, commits: list[dict]
    ) -> dict[str, list]:
        """File name -> the [[name, spark_type_json], ...] schema recorded
        by the commit that wrote it (``__schema__`` in the per-file stats;
        carried through expire_snapshots with the rest of the stats fold).
        Files from commits that predate schema recording are absent —
        readers fall back to footer-based resolution for those."""
        out: dict[str, list] = {}
        for c in self._commits() if commits is None else commits:
            for n, s in (c.get("stats") or {}).items():
                rec = s.get("__schema__")
                if rec is not None:
                    out.setdefault(n, rec)
        return out

    def _era_groups(
        self,
        files: list[str],
        schemas: list[dict],
        commits: list[dict],
    ) -> dict[tuple, list[str]]:
        """Group ``files`` by their write era's physical-name mapping —
        the key is ((field_id, physical_name_or_None), ...) over the full
        field-id universe.  The single source of the era-resolution rule
        shared by _read_resolved and _snapshot_column_names (they MUST
        agree, or schema commits would register different columns than
        reads surface)."""
        universe = sorted(
            {
                f["id"]
                for s in schemas
                for f in (s["fields"] + s["pre_fields"])
            }
        )
        addv = self._file_add_versions(commits)
        groups: dict[tuple, list[str]] = {}
        for f in files:
            wv = addv.get(f, 0)
            key = tuple(
                (fid, self._physical_name(fid, wv, schemas))
                for fid in universe
            )
            groups.setdefault(key, []).append(f)
        return groups

    @staticmethod
    def _physical_name(
        fid: int, write_version: int, schemas: list[dict]
    ) -> str | None:
        """Physical column name field ``fid`` had in files written at
        ``write_version``: its name in the latest schema snapshot at or
        before the write, else (field registered only at a later schema
        commit — every pre-bootstrap column, and any column appended
        mid-era) its name in the earliest LATER snapshot's PRE-change
        field list.  The pre list is sound because a column's name cannot
        change between the write and its first registration — renames
        only happen via schema commits, and each one registers all
        then-current columns in its pre list before mutating."""
        latest: str | None = None
        for s in schemas:
            if s["version"] <= write_version:
                names = {f["id"]: f["name"] for f in s["fields"]}
                # .get, NOT keep-if-present: a field id absent from a
                # snapshot at/before the write was DROPPED before the
                # write, so it has no physical name in this era — a
                # stale mapping would claim (and hide) a fresh column
                # that re-uses the dropped name in a later append
                latest = names.get(fid)
            else:
                if latest is not None:
                    break
                pre = {f["id"]: f["name"] for f in s["pre_fields"]}
                if fid in pre:
                    return pre[fid]
        return latest

    def _current_fields(self) -> list[dict]:
        """Registered fields at the latest version, refreshed with ids
        for any columns present in the current snapshot but not yet
        registered (bootstraps identity ids on the first schema change;
        later, folds additively-evolved columns into the registry)."""
        commits = self._commits()
        schemas = self._schema_commits(commits=commits)
        fields = (
            [dict(f) for f in schemas[-1]["fields"]] if schemas else []
        )
        max_id = max(
            (
                f["id"]
                for s in schemas
                for f in (s["fields"] + s["pre_fields"])
            ),
            default=0,
        )
        if schemas:
            # evolved table: snapshot column names come from the commit-
            # recorded write schemas (log-only, zero I/O; footer fallback
            # for pre-recording files), mapped through the same era
            # resolution _read_resolved uses — planning a full evolved
            # read just to ask .columns cost a mergeSchema footer job per
            # era group on every schema commit
            snapshot_cols = self._snapshot_column_names(commits, schemas)
        else:
            try:
                snapshot_cols = self.read().columns
            except ValueError:  # empty table
                snapshot_cols = []
        known = {f["name"] for f in fields}
        for c in snapshot_cols:
            if c not in known:
                max_id += 1
                fields.append({"id": max_id, "name": c})
        return fields

    def _snapshot_column_names(
        self, commits: list[dict], schemas: list[dict]
    ) -> list[str]:
        """Logical column names of the latest snapshot, computed from the
        commit-recorded write schemas (zero I/O; pyarrow footer fallback
        only for files predating schema recording) with the SAME era
        resolution (``_era_groups``) and ordering as ``read().columns``:
        per era group, current registered names whose era-physical name
        the group's files carry (registry order), then unregistered
        additive columns in first-appearance order over the path-sorted
        group; groups union in discovery order.  Membership is identical
        to the old read().columns behavior; additive-column ORDER is
        equivalent up to the discovery order of the scan (path-sorted
        here, matching mergeSchema's fold and live_files' sort)."""
        try:
            files = self.live_files(commits=commits)
        except ValueError:
            return []
        if not files:
            return []
        current = schemas[-1]["fields"]
        cur_names = {f["name"] for f in current}
        fsch = self._file_write_schemas(commits)

        def _file_cols(f: str) -> list[str]:
            rec = fsch.get(f)
            if rec is not None:
                return [cname for cname, _ in rec]
            import pyarrow.parquet as pq

            return pq.ParquetFile(
                self.path / self.DATA_DIR / f
            ).schema_arrow.names

        out: list[str] = []
        seen: set[str] = set()
        for key, fs in self._era_groups(files, schemas, commits).items():
            mapping = dict(key)
            cols: list[str] = []
            have: set[str] = set()
            for f in sorted(fs):
                for c in _file_cols(f):
                    if c not in have:
                        have.add(c)
                        cols.append(c)
            claimed = {pn for pn in mapping.values() if pn}
            part = [
                f2["name"]
                for f2 in current
                if mapping.get(f2["id"]) and mapping[f2["id"]] in have
            ]
            part += [
                c
                for c in cols
                if c not in claimed
                and c not in cur_names
                and c not in ("__file", "__pos")
                and not c.startswith("__p_")
            ]
            for c in part:
                if c not in seen:
                    seen.add(c)
                    out.append(c)
        return out

    def _commit_schema(
        self, op: str, mutate, max_retries: int = 10
    ) -> int:
        """Commit a schema change: ``mutate(fields)`` edits the refreshed
        field list in place (rename/drop).  Fields are recomputed per
        retry so a lost version race re-validates against the winner."""
        for _ in range(max_retries):
            pre = self._current_fields()
            fields = [dict(f) for f in pre]
            mutate(fields)
            v = self.latest_version() + 1
            if self._try_commit(
                v,
                op,
                [],
                [],
                None,
                extra={"schema": {"fields": fields, "pre_fields": pre}},
            ):
                return v
        raise TxnConflict(f"{op} lost {max_retries} version races")

    def rename_column(self, old: str, new: str, max_retries: int = 10) -> int:
        """Rename a column by FIELD ID (Iceberg semantics): a metadata-only
        commit — no data files rewritten.  Reads map each file's physical
        column names to the logical names of the schema in force at the
        requested version, so old files surface the renamed column under
        its new name, time travel to pre-rename versions shows the old
        name, and table_changes across the rename boundary diffs the
        column as ITSELF (a pure-rename version yields an empty feed)."""

        def _mut(fields: list[dict]) -> None:
            names = {f["name"] for f in fields}
            if old not in names:
                raise ValueError(f"no such column: {old!r}")
            if new in names:
                raise ValueError(f"column already exists: {new!r}")
            for f in fields:
                if f["name"] == old:
                    f["name"] = new
                    return

        return self._commit_schema("rename_column", _mut, max_retries)

    def drop_column(self, name: str, max_retries: int = 10) -> int:
        """Drop a column by FIELD ID: metadata-only — old files keep the
        physical column, but reads at or after the drop never surface it
        (and a later new column reusing the name gets a FRESH id, never
        resurrecting dropped data).  Time travel before the drop still
        shows it."""

        def _mut(fields: list[dict]) -> None:
            if name not in {f["name"] for f in fields}:
                raise ValueError(f"no such column: {name!r}")
            fields[:] = [f for f in fields if f["name"] != name]

        return self._commit_schema("drop_column", _mut, max_retries)

    # ----------------------------------------------------------------- read
    def read(
        self, version: int | None = None, schema_version: int | None = None
    ) -> DataFrame:
        """Snapshot read (time travel with ``version``).

        ``mergeSchema`` gives ADDITIVE schema evolution for free: a
        commit may add columns, and older files surface them as null —
        the Delta/Iceberg add-column semantics.  Time travel to a
        pre-evolution version reads only pre-evolution files and so
        shows the old schema.

        Renames/drops resolve through FIELD IDS (rename_column /
        drop_column): live files group by the physical-name mapping of
        their write era, each group's physical columns alias to the
        logical names of the schema in force at the target version, and
        the groups union by name (missing columns null-fill).  A table
        that never evolved takes the single mergeSchema read — zero
        overhead.  ``schema_version`` reads ``version``'s DATA under a
        different version's NAMES (table_changes uses it to diff across
        a rename boundary).

        The commit log is parsed ONCE per read and shared by the three
        log-derived views (live set, schema chain, add versions) — a
        CDF consumer replaying k versions over an n-commit log pays
        O(k·n) parses, not O(3·k·n)."""
        commits = self._commits()
        files = self.live_files(version, commits=commits)
        if not files:
            raise ValueError(
                f"table {self.path} has no data at version "
                f"{self.latest_version() if version is None else version}"
            )
        target = (
            schema_version
            if schema_version is not None
            else (version if version is not None else self.latest_version())
        )
        schemas = self._schema_commits(target, commits=commits)
        v = version if version is not None else self.latest_version()
        return self._read_resolved(
            files, schemas, commits, dvs=self.dv_map(v, commits)
        )

    @staticmethod
    def _apply_dvs(
        df: DataFrame, dv_rows: DataFrame | None, keep_positions: bool
    ) -> DataFrame:
        """Attach per-row (file, position) identity from the parquet scan
        metadata and anti-join the deletion-vector rows — the merge-on-read
        application.  ``df`` must be a RAW parquet scan (the `_metadata`
        struct is only resolvable directly on a file source).  No broadcast
        hint: a DV can be large after a bulk delete, and AQE picks
        broadcast from the runtime size when it is small."""
        out = df.withColumn(
            "__file",
            F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1),
        ).withColumn("__pos", F.col("_metadata.row_index"))
        if dv_rows is not None:
            out = out.join(
                dv_rows.select(
                    F.col("file").alias("__file"), F.col("pos").alias("__pos")
                ),
                ["__file", "__pos"],
                "left_anti",
            )
        if not keep_positions:
            out = out.drop("__file", "__pos")
        return out

    def _read_resolved(
        self,
        files: list[str],
        schemas: list[dict],
        commits: list[dict],
        dvs: dict[str, str] | None = None,
        with_positions: bool = False,
    ) -> DataFrame:
        """Era-grouped read of ``files`` under the LAST snapshot in
        ``schemas`` (the field-id resolution engine behind read(),
        read_pruned() and the pruned merge); identity mergeSchema read
        when the table never evolved.  ``dvs`` (data file -> DV file) is
        the merge-on-read state to apply: rows whose (file, row_index)
        appear in a deletion vector are filtered out of the scan.
        ``with_positions`` keeps the per-row ``__file``/``__pos`` identity
        columns (the DV writer's input)."""
        dvs = {f: d for f, d in (dvs or {}).items() if f in set(files)}

        def _hide(df: DataFrame) -> DataFrame:
            # hidden partition-transform columns (__p_*) are physical
            # layout metadata, never part of the logical schema — every
            # read path strips them (Iceberg's hidden partitioning)
            hidden = [c for c in df.columns if c.startswith("__p_")]
            return df.drop(*hidden) if hidden else df

        def _finish(raw: DataFrame) -> DataFrame:
            if not dvs and not with_positions:
                return _hide(raw)
            dv_rows = self._dv_rows(list(dvs.values())) if dvs else None
            return _hide(self._apply_dvs(raw, dv_rows, with_positions))

        fsch = self._file_write_schemas(commits)

        def _union_schema(fs: list[str]):
            """Merged Spark schema of ``fs`` from the commit-recorded
            write schemas — the same fold mergeSchema computes (new
            fields append in first-appearance order over the path-sorted
            file list), but from the log, with ZERO footer reads.  None
            (-> footer fallback) if any file predates schema recording or
            two files disagree on a column's type (mergeSchema would
            widen; rare, and correctness beats the saved job)."""
            names: list[str] = []
            types: dict[str, str] = {}
            for f in sorted(fs):
                rec = fsch.get(f)
                if rec is None:
                    return None
                for cname, tj in rec:
                    prev = types.get(cname)
                    if prev is None:
                        types[cname] = tj
                        names.append(cname)
                    elif prev != tj:
                        return None
            return _struct_from_rec([[c, types[c]] for c in names])

        def _scan(fs: list[str]) -> DataFrame:
            # Schema from commit metadata when every file's write schema
            # was recorded: no mergeSchema footer-merge JOB for multi-file
            # groups and no driver-side footer read for single files —
            # at 100 TB file counts, scan planning cost becomes O(log),
            # not O(live files) (the Iceberg schema-in-metadata shape).
            # Fallback (pre-recording files, type disagreement): the old
            # behavior — mergeSchema for multi-file groups, single-file
            # footer otherwise.
            reader = self.spark.read
            sch = _union_schema(fs)
            if sch is not None:
                reader = reader.schema(sch)
            elif len(fs) > 1:
                reader = reader.option("mergeSchema", "true")
            return reader.parquet(
                *[str(self.path / self.DATA_DIR / f) for f in fs]
            )

        if not schemas:
            return _finish(_scan(files))
        current = schemas[-1]["fields"]
        cur_names = {f["name"] for f in current}
        parts = []
        for key, fs in self._era_groups(files, schemas, commits).items():
            mapping = dict(key)
            df = _scan(fs)
            group_dvs = {f: dvs[f] for f in fs if f in dvs}
            if group_dvs or with_positions:
                # DV application must touch the RAW scan (the _metadata
                # struct resolves only there), before the era projection
                df = self._apply_dvs(
                    df,
                    self._dv_rows(list(group_dvs.values()))
                    if group_dvs
                    else None,
                    True,
                )
            claimed = {pn for pn in mapping.values() if pn}
            cols = [
                F.col(mapping[f["id"]]).alias(f["name"])
                for f in current
                if mapping.get(f["id"]) and mapping[f["id"]] in df.columns
            ]
            # unregistered additive columns pass through under their own
            # (physical == logical) name — except hidden partition-
            # transform columns (__p_*), which are layout metadata only
            cols += [
                F.col(c)
                for c in df.columns
                if c not in claimed
                and c not in cur_names
                and c not in ("__file", "__pos")
                and not c.startswith("__p_")
            ]
            if with_positions:
                cols += [F.col("__file"), F.col("__pos")]
            parts.append(df.select(*cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out

    def _stats_physical_name(
        self,
        column: str,
        file: str,
        schemas: list[dict],
        addv: dict[str, int],
    ) -> str | None:
        """The PHYSICAL name logical ``column`` had when ``file`` was
        written — the key its committed stats live under.  None means
        the column did not exist for that file (callers must treat the
        file as unprunable... it trivially contains no such values, but
        evolution-added columns surface as null there, and null never
        passes a range filter — so skipping is also sound; we return
        None and let callers read conservatively)."""
        if not schemas:
            return column
        current = schemas[-1]["fields"]
        fid = next(
            (f["id"] for f in current if f["name"] == column), None
        )
        if fid is None:
            # unregistered additive column: physical == logical everywhere
            return column
        return self._physical_name(fid, addv.get(file, 0), schemas)

    def file_stats(self, commits: list[dict] | None = None) -> dict[str, dict]:
        """name -> {column: [min, max]} harvested at commit time.  Keys
        are PHYSICAL write-era column names; resolve logical names
        through _stats_physical_name on evolved tables."""
        out: dict[str, dict] = {}
        for c in self._commits() if commits is None else commits:
            out.update(c.get("stats", {}))
        return out

    def read_pruned(
        self,
        column: str,
        lower=None,
        upper=None,
        version: int | None = None,
    ) -> DataFrame:
        """Data-skipping read: open only the live files whose committed
        [min, max] for ``column`` can intersect [lower, upper], then
        apply the exact filter on top (stats prune files, the filter
        prunes rows).  Files without stats for the column are always
        read — pruning is an OPTIMIZATION, never a correctness gate.
        This is the Delta-style skip that turns a key-range query on a
        range-laid-out table into a handful of file opens.

        Rename/drop history is transparent: stats keys are PHYSICAL
        write-era names, so the skip resolves logical → field id →
        per-file physical name before the lookup (the Iceberg stats-by-
        field-id shape), and the chosen files read through the same
        era-mapped resolution as read()."""
        return self.read_pruned_multi([(column, lower, upper)], version)

    def prune_files(
        self,
        preds: list[tuple],
        version: int | None = None,
        commits: list[dict] | None = None,
    ) -> list[str]:
        """Files of the ``version`` snapshot whose committed [min, max]
        stats can intersect EVERY ``(column, lower, upper)`` predicate —
        the planning half of multi-dimensional data skipping (a z-order
        clustered layout keeps BOTH columns' per-file bands narrow, so a
        2-D box predicate prunes on each dimension independently).  Files
        without stats for a column are kept — pruning is an optimization,
        never a correctness gate."""
        commits = self._commits() if commits is None else commits
        files = self.live_files(version, commits=commits)
        target = version if version is not None else self.latest_version()
        schemas = self._schema_commits(target, commits=commits)
        addv = self._file_add_versions(commits) if schemas else {}
        stats = self.file_stats(commits)
        chosen = []
        for f in files:
            keep = True
            for column, lower, upper in preds:
                pname = self._stats_physical_name(column, f, schemas, addv)
                s = stats.get(f, {}).get(pname) if pname else None
                if s is None:
                    continue
                mn, mx = s
                lo = _stat_bound(mx, lower) if lower is not None else None
                hi = _stat_bound(mn, upper) if upper is not None else None
                if (lo is not None and mx < lo) or (
                    hi is not None and mn > hi
                ):
                    keep = False
                    break
            if keep:
                chosen.append(f)
        return chosen

    def read_pruned_multi(
        self, preds: list[tuple], version: int | None = None
    ) -> DataFrame:
        """Data-skipping read over a CONJUNCTION of range predicates:
        open only the files prune_files keeps, then apply the exact
        filters on top (stats prune files, the filters prune rows)."""
        commits = self._commits()
        if not self.live_files(version, commits=commits):
            raise ValueError(f"table {self.path} has no data")
        target = version if version is not None else self.latest_version()
        schemas = self._schema_commits(target, commits=commits)
        chosen = self.prune_files(preds, version, commits=commits)
        if not chosen:
            return (
                self.read(version).where(F.lit(False))
            )  # schema-correct empty frame
        df = self._read_resolved(
            chosen, schemas, commits, dvs=self.dv_map(target, commits)
        )
        for column, lower, upper in preds:
            if lower is not None:
                df = df.where(F.col(column) >= F.lit(lower))
            if upper is not None:
                df = df.where(F.col(column) <= F.lit(upper))
        return df

    def version_as_of(self, timestamp: float) -> int:
        """Latest version committed at or before ``timestamp`` (unix
        seconds) — Delta's TIMESTAMP AS OF resolution.  Raises if the
        table has no commit that old (mirrors Delta: a timestamp before
        the first commit is an error, after the last resolves to it)."""
        best = None
        for c in self._commits():
            if c.get("committed_at") is not None and c["committed_at"] <= timestamp:
                best = c["version"]
        if best is None:
            raise ValueError(
                f"no commit at or before timestamp {timestamp} "
                f"(earliest retained commit is newer)"
            )
        return best

    def read_as_of(self, timestamp: float) -> DataFrame:
        """Snapshot read at a TIMESTAMP (TIMESTAMP AS OF): resolves to
        the latest version whose commit time is <= the timestamp, then
        time-travels there."""
        return self.read(version=self.version_as_of(timestamp))

    def prune_files_values(
        self,
        column: str,
        values,
        version: int | None = None,
        commits: list[dict] | None = None,
    ) -> list[str]:
        """Files of the snapshot whose committed [min, max] for ``column``
        can contain ANY of the discrete ``values`` — the membership twin
        of prune_files, used by the txn-backed index probes (IVF cell
        probes, BM25 term-bucket probes) where the predicate is an
        IN-set, not a range.  Files without stats are kept (pruning is
        never a correctness gate).

        When the table declared a bloom filter on ``column``
        (set_bloom_filter), each file's committed sparse bitset is
        probed AFTER the [min, max] check: a value inside the range but
        provably absent from the bitset still skips the file — the case
        range stats can never prune on a hash-scattered key, where every
        file's [min, max] spans the whole domain (Delta's bloom-index
        role).  The stale-same-name soundness argument carries from
        range stats: a dropped-and-re-added column resolves to a
        different field id, so pname misses the old era's bloom and the
        file is kept."""
        commits = self._commits() if commits is None else commits
        files = self.live_files(version, commits=commits)
        target = version if version is not None else self.latest_version()
        schemas = self._schema_commits(target, commits=commits)
        addv = self._file_add_versions(commits) if schemas else {}
        stats = self.file_stats(commits)
        vals = list(values)
        chosen = []
        for f in files:
            st = stats.get(f, {})
            pname = self._stats_physical_name(column, f, schemas, addv)
            s = st.get(pname) if pname else None
            bl = (st.get("__bloom__") or {}).get(pname) if pname else None
            if s is None and bl is None:
                chosen.append(f)
                continue
            bits = set(bl["bits"]) if bl is not None else None

            def _may_match(w):
                in_range = s is None or (
                    s[0] <= _stat_bound(s[0], w) <= s[1]
                )
                return in_range and (
                    bits is None
                    or _bloom_maybe(bits, bl["m"], bl["k"], w)
                )

            if any(_may_match(w) for w in vals):
                chosen.append(f)
        return chosen

    def prune_files_nullness(
        self,
        column: str,
        is_null: bool,
        version: int | None = None,
        commits: list[dict] | None = None,
    ) -> list[str]:
        """Files of the snapshot that can contain a row matching
        ``column IS NULL`` (``is_null=True``) or ``IS NOT NULL`` — the
        null-count twin of prune_files, driven by the per-file
        "__nulls__" commit stats: an IS NULL predicate skips files whose
        committed null count is 0, an IS NOT NULL predicate skips
        all-null files (null count == row count).  Files without a null
        count for the column are kept — pruning is an optimization,
        never a correctness gate (same rule as min/max)."""
        commits = self._commits() if commits is None else commits
        files = self.live_files(version, commits=commits)
        target = version if version is not None else self.latest_version()
        schemas = self._schema_commits(target, commits=commits)
        addv = self._file_add_versions(commits) if schemas else {}
        stats = self.file_stats(commits)
        # Nullness needs STRICTER name resolution than range pruning: for
        # a range predicate a stale same-name stat is sound (the old
        # column's values surface as NULL, and NULL never matches a
        # range), but for IS NULL that same stale nulls=0 would wrongly
        # skip a file whose rows ALL surface as NULL.  On an evolved
        # table, trust a null count only for a column REGISTERED in the
        # current schema (field-id-resolved per era); unregistered
        # additive columns read conservatively.
        if schemas:
            current = schemas[-1]["fields"]
            fid = next(
                (f["id"] for f in current if f["name"] == column), None
            )
        chosen = []
        for f in files:
            st = stats.get(f, {})
            if st.get("__rows__") == 0:
                continue  # provably empty: nothing to match either way
            if not schemas:
                pname = column
            elif fid is None:
                pname = None
            else:
                pname = self._physical_name(fid, addv.get(f, 0), schemas)
            nc = (st.get("__nulls__") or {}).get(pname) if pname else None
            rows = st.get("__rows__")
            if nc is None:
                chosen.append(f)
            elif is_null:
                if nc > 0:
                    chosen.append(f)
            elif rows is None or nc < rows:
                chosen.append(f)
        return chosen

    def read_pruned_nullness(
        self, column: str, is_null: bool, version: int | None = None
    ) -> DataFrame:
        """Data-skipping read for ``IS [NOT] NULL`` predicates: open only
        the files prune_files_nullness keeps, then apply the exact
        predicate on top (stats prune files, the filter prunes rows) —
        read_pruned's contract extended to nullness, per Delta's
        nullCount skipping."""
        commits = self._commits()
        if not self.live_files(version, commits=commits):
            raise ValueError(f"table {self.path} has no data")
        target = version if version is not None else self.latest_version()
        schemas = self._schema_commits(target, commits=commits)
        chosen = self.prune_files_nullness(
            column, is_null, version, commits=commits
        )
        if not chosen:
            return self.read(version).where(F.lit(False))
        df = self._read_resolved(
            chosen, schemas, commits, dvs=self.dv_map(target, commits)
        )
        pred = F.col(column).isNull() if is_null else F.col(column).isNotNull()
        return df.where(pred)

    def read_files(
        self, files: list[str], version: int | None = None
    ) -> DataFrame:
        """Era-resolved, DV-applied read of an EXPLICIT file subset (the
        consumer of prune_files/prune_files_values); an empty list
        returns a schema-correct empty frame instead of crashing on a
        zero-path parquet scan."""
        commits = self._commits()
        target = version if version is not None else self.latest_version()
        schemas = self._schema_commits(target, commits=commits)
        if not files:
            return self.read(version).where(F.lit(False))
        return self._read_resolved(
            files, schemas, commits, dvs=self.dv_map(target, commits)
        )

    def is_committed(self, app_txn_id: str) -> bool:
        return any(c.get("app_txn_id") == app_txn_id for c in self._commits())

    # ------------------------------------------------------- constraints
    def constraints(
        self, version: int | None = None, commits: list[dict] | None = None
    ) -> dict[str, str]:
        """name -> CHECK predicate SQL in force at ``version`` (Delta's
        table constraints): folded from set/drop commits; checkpoint
        commits carry the live set forward."""
        return self._constraints_fold(version, commits)[0]

    def constraint_set_versions(
        self, version: int | None = None, commits: list[dict] | None = None
    ) -> dict[str, int]:
        """name -> the version at which each LIVE constraint's current
        predicate was set (checkpoint-carried constraints stamp at the
        checkpoint version — conservative, since every retained version
        is >= it).  restore_version uses this to validate restored
        content only against constraints NEWER than the restore point."""
        return self._constraints_fold(version, commits)[1]

    def _constraints_fold(
        self, version: int | None, commits: list[dict] | None
    ) -> tuple[dict[str, str], dict[str, int]]:
        """THE commit-log constraint replay — the single fold both
        constraints() and constraint_set_versions() read, so a change to
        the constraint commit shape can never diverge the two."""
        v = self.latest_version() if version is None else version
        commits = self._commits() if commits is None else commits
        out: dict[str, str] = {}
        set_at: dict[str, int] = {}
        for c in commits:
            if c["version"] > v:
                break
            if c.get("base"):
                out = dict(c.get("constraints") or {})
                set_at = {n: c["version"] for n in out}
                continue
            ck = c.get("constraint")
            if ck:
                if ck.get("sql") is None:
                    out.pop(ck["name"], None)
                    set_at.pop(ck["name"], None)
                else:
                    out[ck["name"]] = ck["sql"]
                    set_at[ck["name"]] = c["version"]
        return out, set_at

    @staticmethod
    def _satisfies(predicate_sql: str):
        """THE constraint-satisfaction rule, used identically by
        set_constraint, _validate_adds, and restore_version: a row
        satisfies a CHECK iff the predicate is literally TRUE — a NULL
        result counts as a violation (conservative quality-gate
        semantics, stricter than SQL/Delta's NULL-satisfies; one rule
        everywhere so a snapshot accepted by ADD CONSTRAINT is never
        rejected when its identical rows are appended later)."""
        return F.coalesce(F.expr(predicate_sql).cast("boolean"), F.lit(False))

    def set_constraint(self, name: str, predicate_sql: str) -> int:
        """Register a CHECK constraint as a metadata-only commit.  The
        CURRENT snapshot must already satisfy it (one validating pass —
        the Delta ADD CONSTRAINT contract), and every later write batch
        is validated before its files become visible: a violating batch
        raises ConstraintViolation and commits nothing.  Enforcement
        costs one filtered count over each WRITE BATCH (batch-sized,
        map-only), never a standing-table scan.  NULL predicate results
        violate, matching _validate_adds (see _satisfies)."""
        try:
            bad = self.read().where(~self._satisfies(predicate_sql)).count()
        except ValueError:
            bad = 0  # empty table: vacuously satisfied
        if bad:
            raise ConstraintViolation(
                f"existing snapshot has {bad} rows violating {name!r}: "
                f"{predicate_sql}"
            )
        v = self.latest_version() + 1
        if not self._try_commit(
            v,
            "set_constraint",
            [],
            [],
            None,
            extra={"constraint": {"name": name, "sql": predicate_sql}},
        ):
            raise TxnConflict(f"set_constraint {name!r} lost a version race")
        return v

    def drop_constraint(self, name: str) -> int:
        v = self.latest_version() + 1
        if not self._try_commit(
            v,
            "drop_constraint",
            [],
            [],
            None,
            extra={"constraint": {"name": name, "sql": None}},
        ):
            raise TxnConflict(f"drop_constraint {name!r} lost a version race")
        return v

    def _validate_adds(self, adds: list[str]) -> dict[str, str]:
        """Validate freshly WRITTEN (still-invisible) staged files against
        the live CHECK constraints, by reading the parquet back — never by
        re-evaluating the batch DAG.  Re-evaluation would be both unsound
        (a nondeterministic batch could pass the validating evaluation and
        then write DIFFERENT rows) and wasteful (the upstream DAG computes
        twice).  Reading back costs one scan of the batch-sized staged
        files.  NULL predicate results count as violations (the shared
        _satisfies rule).  On violation the staged files are unlinked and
        ConstraintViolation raises: nothing was ever visible.  Returns the
        constraint set validated against, so commit-retry loops can detect
        a concurrent set_constraint and re-validate (see append)."""
        live = self.constraints()
        if not live or not adds:
            return live
        # All staged files of one write share the writing df's schema —
        # it is sitting in _pending_stats — so the read-back never needs
        # a mergeSchema footer job either.
        rec = (
            getattr(self, "_pending_stats", {})
            .get(adds[0], {})
            .get("__schema__")
        )
        reader = self.spark.read
        if rec is not None:
            reader = reader.schema(_struct_from_rec(rec))
        else:
            reader = reader.option("mergeSchema", "true")
        df = reader.parquet(
            *[str(self.path / self.DATA_DIR / f) for f in adds]
        )
        self._raise_violations(df, live, cleanup=adds)
        return live

    def _raise_violations(
        self,
        df: DataFrame,
        live: dict[str, str],
        cleanup: list[str] | None = None,
    ) -> None:
        """One-pass violation count of ``df`` against every constraint in
        ``live`` (single aggregate action, no per-constraint scans); on
        the first violating constraint, unlink ``cleanup`` staged files
        and raise ConstraintViolation."""
        conds = [self._satisfies(sql) for sql in live.values()]
        row = df.select(
            *[
                F.count(F.when(~c, F.lit(1))).alias(f"__bad_{i}")
                for i, c in enumerate(conds)
            ]
        ).collect()[0]
        for i, (n, sql) in enumerate(live.items()):
            if row[f"__bad_{i}"]:
                for name in cleanup or []:
                    (self.path / self.DATA_DIR / name).unlink(missing_ok=True)
                raise ConstraintViolation(
                    f"write batch has {row[f'__bad_{i}']} rows violating "
                    f"{n!r}: {sql}"
                )

    # ---------------------------------------------------------------- write
    def _write_files(self, df: DataFrame) -> list[str]:
        """Write df as immutable parquet files under data/, return names.
        Files are INVISIBLE until a commit names them.  Per-file column
        min/max stats are harvested from the parquet footers into
        ``self._pending_stats`` for the next commit — the data-skipping
        metadata (Delta-style) read_pruned() prunes on."""
        token = uuid.uuid4().hex
        tmp = self.path / f"_staging_{token}"
        df.write.mode("overwrite").parquet(str(tmp))
        names = []
        stats: dict[str, dict] = {}
        # The write SCHEMA rides the commit under a reserved stats key
        # (like __rows__/__nulls__/__bloom__, and carried forward by
        # expire_snapshots' stats fold): every part file of this write has
        # exactly df's columns and Spark types, so readers can reconstruct
        # an era group's merged schema from the log ALONE — no mergeSchema
        # footer job, no driver-side footer loop (Iceberg records schemas
        # in commit metadata for the same reason).  Nullability is not
        # recorded: file-based scans surface every column nullable.
        schema_rec = [
            [f.name, f.dataType.json()] for f in df.schema.fields
        ]
        # declared point-lookup bloom columns, resolved to this write
        # era's PHYSICAL names (a concurrent declaration landing after
        # this read just leaves these files bloom-less — conservative,
        # never wrong)
        bspec = self._bloom_write_targets()
        for i, part in enumerate(sorted(tmp.glob("part-*.parquet"))):
            name = f"{token}-{i:05d}.parquet"
            dest = self.path / self.DATA_DIR / name
            os.rename(part, dest)
            names.append(name)
            stats[name] = _footer_stats(dest)
            stats[name]["__schema__"] = schema_rec
            if bspec:
                bl = _file_bloom(dest, bspec)
                if bl:
                    stats[name]["__bloom__"] = bl
        shutil.rmtree(tmp)
        self._pending_stats = getattr(self, "_pending_stats", {})
        self._pending_stats.update(stats)
        return names

    def _bloom_write_targets(self) -> dict[str, dict]:
        """Declared bloom columns resolved to the CURRENT write era's
        physical names — the name the file about to be written actually
        carries.  Field-id-recorded declarations survive renames the way
        the rest of the stats machinery does (probe-side pname
        resolution lands on the same per-era physical name).  Memoized
        per commit-log version: latest_version() is a cheap directory
        glob, so the common bloom-less table pays no JSON log parse on
        the hot write path (every append/DV write funnels through
        here)."""
        v = self.latest_version()
        cached = getattr(self, "_bloom_cache", None)
        if cached is not None and cached[0] == v:
            return cached[1]
        spec = bloom_spec(self)
        if spec:
            schemas = self._schema_commits()
            if schemas:
                resolved: dict[str, dict] = {}
                for c, mk in spec.items():
                    fid = mk.get("field_id")
                    if fid is None:
                        # name-only declaration (made before any schema
                        # history existed): the name refers to the column
                        # AS OF the declaration version — find the field
                        # whose physical name in that era matches
                        at = mk.get("declared_at", 0)
                        fid = next(
                            (
                                f["id"]
                                for f in schemas[-1]["fields"]
                                if self._physical_name(f["id"], at, schemas)
                                == c
                            ),
                            None,
                        )
                    pname = (
                        self._physical_name(fid, v + 1, schemas)
                        if fid is not None
                        else None
                    )
                    if pname is not None:
                        resolved[pname] = mk
                spec = resolved
        self._bloom_cache = (v, spec)
        return spec

    def _try_commit(
        self,
        version: int,
        op: str,
        adds: list[str],
        removes: list[str],
        app_txn_id: str | None,
        extra: dict | None = None,
    ) -> bool:
        """Atomically publish ``version``; False if someone else won it.
        ``extra`` merges additional metadata into the commit (schema
        evolution records)."""
        pending = getattr(self, "_pending_stats", {})
        payload = json.dumps(
            {
                "version": version,
                "op": op,
                "adds": adds,
                "removes": removes,
                "app_txn_id": app_txn_id,
                "committed_at": time.time(),
                "stats": {n: pending[n] for n in adds if n in pending},
                **(extra or {}),
            },
            indent=1,
        )
        try:
            fd = os.open(
                self._log_path(version), os.O_CREAT | os.O_EXCL | os.O_WRONLY
            )
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as fh:
            fh.write(payload)
        return True

    def append(
        self, df: DataFrame, app_txn_id: str | None = None, max_retries: int = 10
    ) -> int:
        """Blind append: never conflicts, retries version races.
        ``app_txn_id`` makes re-delivery a no-op (exactly-once sink)."""
        if app_txn_id is not None and self.is_committed(app_txn_id):
            return self.latest_version()
        adds = self._write_files(df)
        validated = self._validate_adds(adds)
        for _ in range(max_retries):
            v = self.latest_version() + 1
            if app_txn_id is not None and self.is_committed(app_txn_id):
                # lost a race to a re-delivered twin of ourselves
                for name in adds:
                    (self.path / self.DATA_DIR / name).unlink(missing_ok=True)
                return self.latest_version()
            # a concurrent set_constraint between validation and the
            # winning commit must still gate this batch: re-validate
            # whenever the live set drifted from the one we checked
            if self.constraints() != validated:
                validated = self._validate_adds(adds)
            if self._try_commit(v, "append", adds, [], app_txn_id):
                return v
        raise TxnConflict(f"append lost {max_retries} version races")

    def overwrite(
        self, df: DataFrame, app_txn_id: str | None = None, max_retries: int = 10
    ) -> int:
        """Replace the table contents atomically."""
        if app_txn_id is not None and self.is_committed(app_txn_id):
            return self.latest_version()
        adds = self._write_files(df)
        validated = self._validate_adds(adds)
        for _ in range(max_retries):
            v = self.latest_version() + 1
            removes = self.live_files(v - 1)
            if self.constraints() != validated:
                validated = self._validate_adds(adds)
            if self._try_commit(v, "overwrite", adds, removes, app_txn_id):
                return v
        raise TxnConflict(f"overwrite lost {max_retries} version races")

    def merge_upsert(
        self,
        updates: DataFrame,
        keys: list[str],
        app_txn_id: str | None = None,
    ) -> int:
        """Transactional MERGE: latest row per key wins between the
        current snapshot and ``updates`` (updates win ties).  Optimistic
        concurrency: the merge computes against a pinned snapshot; if
        ANOTHER DATA COMMIT lands first, the snapshot is stale and the
        merge raises TxnConflict rather than silently losing the
        concurrent writer's rows (rewrite-all-files merge => any
        concurrent change conflicts; a file-pruned merge would narrow
        this to overlapping files)."""
        if app_txn_id is not None and self.is_committed(app_txn_id):
            return self.latest_version()
        base_version = self.latest_version()
        base_files = self.live_files(base_version)
        if base_files:
            base = self.read(base_version)
            merged = (
                base.join(updates.select(*keys), keys, "left_anti")
                .unionByName(updates)
            )
        else:
            merged = updates
        adds = self._write_files(merged)
        self._validate_adds(adds)
        if not self._try_commit(
            base_version + 1, "merge", adds, base_files, app_txn_id
        ):
            for name in adds:
                (self.path / self.DATA_DIR / name).unlink(missing_ok=True)
            raise TxnConflict(
                f"merge based on version {base_version} lost to a concurrent "
                f"commit (now {self.latest_version()}); re-read and retry"
            )
        return base_version + 1

    def delete_keys(
        self,
        keys_df: DataFrame,
        keys: list[str],
        app_txn_id: str | None = None,
    ) -> int:
        """Transactional row-level DELETE: remove every row whose key
        appears in ``keys_df`` (left-anti rewrite).  Same strict OCC
        contract as merge_upsert — the rewrite pins a snapshot, and any
        concurrent data commit raises TxnConflict instead of silently
        resurrecting or losing rows; retry via merge_upsert_with_retry's
        pattern (re-call re-reads the new snapshot).  ``app_txn_id``
        makes re-delivery a no-op (exactly-once CDC apply)."""
        if app_txn_id is not None and self.is_committed(app_txn_id):
            return self.latest_version()
        base_version = self.latest_version()
        base_files = self.live_files(base_version)
        if not base_files:
            # deleting from an empty table: nothing to rewrite, no commit
            return base_version
        remaining = self.read(base_version).join(
            keys_df.select(*keys), keys, "left_anti"
        )
        adds = self._write_files(remaining)
        if not self._try_commit(
            base_version + 1, "delete", adds, base_files, app_txn_id
        ):
            for name in adds:
                (self.path / self.DATA_DIR / name).unlink(missing_ok=True)
            raise TxnConflict(
                f"delete based on version {base_version} lost to a "
                f"concurrent commit (now {self.latest_version()}); re-read "
                f"and retry"
            )
        return base_version + 1

    def delete_keys_dv(
        self,
        keys_df: DataFrame,
        keys: list[str],
        app_txn_id: str | None = None,
    ) -> int:
        """Row-level DELETE as a DELETION-VECTOR commit (merge-on-read):
        instead of rewriting every file that holds a matching row
        (``delete_keys`` — copy-on-write, the known 100 TB pain where a
        single-row GDPR delete rewrites a 1 GB file), record the matching
        rows' (file, row_index) positions in a small parquet deletion
        vector and commit only a metadata update.  Readers anti-join the
        vector at scan time; ``compact`` / ``cluster_zorder`` / any
        rewrite later folds the DV in physically.

        Contract mirrors delete_keys: same OCC conflict rule (commit at
        base+1 or TxnConflict), idempotent under ``app_txn_id``, time
        travel to pre-delete versions still shows the rows, and
        table_changes reports the deletes (CDF derives from snapshot
        reads, which apply DVs).  A file's second DV delete UNIONS with
        its existing vector (the prior vector file stays referenced by
        older commits for time travel).

        Scale: the write cost is O(matched rows + prior vectors of the
        touched files) — never a data-file rewrite; the scan-side cost is
        one anti-join against the vector, which disappears entirely after
        the next compaction.  Delta Lake's deletion vectors and Iceberg
        v2 positional delete files are this exact design."""
        if app_txn_id is not None and self.is_committed(app_txn_id):
            return self.latest_version()
        commits = self._commits()
        base_version = self.latest_version()
        base_files = self.live_files(base_version, commits=commits)
        if not base_files:
            return base_version
        schemas = self._schema_commits(base_version, commits=commits)
        dvs = self.dv_map(base_version, commits)
        with_pos = self._read_resolved(
            base_files, schemas, commits, dvs=dvs, with_positions=True
        )
        hits = (
            with_pos.join(keys_df.select(*keys), keys, "left_semi")
            .select(
                F.col("__file").alias("file"), F.col("__pos").alias("pos")
            )
        )
        touched = [
            r["file"] for r in hits.select("file").distinct().collect()
        ]
        if not touched:
            # nothing matched: a content no-op commits nothing (and does
            # not consume the app_txn_id) — same rule as the empty table
            return base_version
        # union the prior vectors of re-deleted files so their earlier
        # deletes survive the mapping replacement
        prior = [dvs[f] for f in touched if f in dvs]
        new_rows = hits
        if prior:
            new_rows = new_rows.unionByName(
                self._dv_rows(prior).where(F.col("file").isin(touched))
            ).distinct()
        # one vector file per commit (DVs are small by construction —
        # deleted positions, not data); every touched file maps to it
        dv_adds = self._write_files(new_rows.coalesce(1))
        if not self._try_commit(
            base_version + 1,
            "delete_dv",
            [],
            [],
            app_txn_id,
            extra={
                "dv_updates": {f: dv_adds[0] for f in sorted(touched)},
                "dv_files": dv_adds,
            },
        ):
            for name in dv_adds:
                (self.path / self.DATA_DIR / name).unlink(missing_ok=True)
            raise TxnConflict(
                f"DV delete based on version {base_version} lost to a "
                f"concurrent commit (now {self.latest_version()}); re-read "
                f"and retry"
            )
        return base_version + 1

    # ------------------------------------------------------------- maintain
    def vacuum(self) -> list[str]:
        """Delete orphan data files no version references (crashed
        writers).  Files removed by later versions are KEPT — they back
        time travel."""
        referenced: set[str] = set()
        for c in self._commits():
            referenced |= set(c["adds"])
            referenced |= set(c.get("dv_files") or [])
        dropped = []
        for p in (self.path / self.DATA_DIR).glob("*.parquet"):
            if p.name not in referenced:
                p.unlink()
                dropped.append(p.name)
        return sorted(dropped)


def merge_upsert_with_retry(
    table: TxnTable,
    updates: DataFrame,
    keys: list[str],
    app_txn_id: str | None = None,
    max_retries: int = 20,
    backoff_s: float = 0.05,
) -> int:
    """Bounded-retry MERGE for concurrent writers.

    TxnTable.merge_upsert is strict OCC: it computes against a pinned
    snapshot and raises TxnConflict if any other data commit lands first
    (rewrite-all-files merge ⇒ every concurrent change conflicts).  Under
    N racing writers that is the CORRECT primitive — no lost updates —
    but each writer must rebase and retry to make progress.  This helper
    is that loop: on conflict it sleeps a linearly growing backoff
    (attempt × ``backoff_s``, deterministic — no randomness, so tests
    replay) and calls merge_upsert again, which re-reads the NEW latest
    snapshot, i.e. the retry is a semantic rebase, not a blind re-commit.

    Liveness: every conflict means some OTHER writer committed, so with N
    writers a writer retries at most N-1 times before winning; set
    ``max_retries`` ≥ the expected writer fan-in.  Combined with the
    create-exclusive log-file primitive (_try_commit) the outcome is
    SERIALIZABLE: the final state equals replaying the writers' merges in
    commit-version order (TestConcurrentWriters proves this by replay).

    ``app_txn_id`` passes through, so a writer that is itself re-driven
    (stream redelivery, job retry) stays exactly-once across the loop.
    """
    last: TxnConflict | None = None
    for attempt in range(max_retries):
        try:
            return table.merge_upsert(updates, keys, app_txn_id=app_txn_id)
        except TxnConflict as exc:
            last = exc
            if attempt + 1 < max_retries:  # no pointless sleep before giving up
                time.sleep(backoff_s * (attempt + 1))
    raise TxnConflict(
        f"merge gave up after {max_retries} rebase attempts: {last}"
    )


def exactly_once_stream_sink(table: TxnTable, sink_id: str = "stream"):
    """foreachBatch handler giving a streaming query EXACTLY-ONCE
    delivery into a TxnTable: the micro-batch id becomes the commit's
    ``app_txn_id``, so a batch replayed after a crash/restart (Structured
    Streaming's at-least-once contract on sinks without their own
    transaction log) re-commits as a no-op instead of duplicating rows.

        q = (df.writeStream
               .foreachBatch(exactly_once_stream_sink(table, "events"))
               .option("checkpointLocation", ckpt).start())

    This is precisely the idempotent-sink half Delta's streaming writer
    implements (txnAppId/txnVersion); combined with the checkpoint's
    replay it upgrades the pipeline end to end to exactly-once."""

    def _handle(batch_df, batch_id: int) -> None:
        table.append(batch_df, app_txn_id=f"{sink_id}-{batch_id}")

    return _handle


def compact(
    table: TxnTable,
    app_txn_id: str | None = None,
    target_rows: int | None = None,
) -> int:
    """Rewrite the current snapshot's files into a coalesced layout as a
    single commit (adds the new files, removes every current one).  The
    table's CONTENT is unchanged — only the file count drops — and
    history still time-travels to pre-compaction versions (their files
    are referenced by earlier commits, so vacuum keeps them).  Small-file
    sprawl is the tax of per-batch streaming appends; this is the
    periodic maintenance commit that pays it down.

    ``target_rows`` sizes the output: the committed per-file row counts
    (``__rows__`` stats — no data scan) give the snapshot total, and the
    rewrite repartitions to ceil(total / target_rows) files.  Default
    remains a single file (test-scale tables); production picks
    target_rows so a file lands near the ~128 MB scan-friendly size."""
    base_version = table.latest_version()
    base_files = table.live_files(base_version)
    if not base_files:
        return base_version
    if app_txn_id is not None and table.is_committed(app_txn_id):
        return table.latest_version()
    snapshot = table.read(base_version)
    if target_rows:
        stats = table.file_stats()
        total = sum(
            stats.get(f, {}).get("__rows__", 0) or 0 for f in base_files
        )
        n_out = max(1, -(-total // target_rows))
        snapshot = snapshot.repartition(n_out)
    else:
        snapshot = snapshot.coalesce(1)
    adds = table._write_files(snapshot)
    if not table._try_commit(
        base_version + 1, "compact", adds, base_files, app_txn_id
    ):
        for name in adds:
            (table.path / table.DATA_DIR / name).unlink(missing_ok=True)
        raise TxnConflict(
            f"compact based on version {base_version} lost to a concurrent commit"
        )
    return base_version + 1


def _cluster_curve_expr(
    table: TxnTable,
    base_files: list[str],
    col_a: str,
    col_b: str,
    bits: int,
    curve: str,
    commits: list[dict],
    base_version: int,
):
    """The shared grid machinery of cluster_zorder / cluster_incremental:
    validate the curve, derive each column's global [lo, hi] from the
    committed per-file stats fold over ``base_files`` (driver-side, no
    data scan; one aggregate fallback when stats are missing), and return
    the curve value expression over the uniform 2^bits width_bucket cells.
    Incremental clustering passes the FULL snapshot's files here even
    though it rewrites only the tail, so tail files land on the same cell
    lattice as the clustered bulk."""
    from aws_genaric_datapipeline_spark.operators.layout import (
        hilbert_value,
        zorder_value,
    )

    if curve not in ("zorder", "hilbert"):
        raise ValueError(f"unknown curve {curve!r}")
    curve_fn = zorder_value if curve == "zorder" else hilbert_value
    schemas = table._schema_commits(base_version, commits=commits)
    addv = table._file_add_versions(commits) if schemas else {}
    stats = table.file_stats(commits)
    bounds: dict[str, tuple] = {}
    for col in (col_a, col_b):
        lo = hi = None
        have_all = True
        for f in base_files:
            pname = table._stats_physical_name(col, f, schemas, addv)
            s = stats.get(f, {}).get(pname) if pname else None
            if s is None:
                have_all = False
                break
            lo = s[0] if lo is None else min(lo, s[0])
            hi = s[1] if hi is None else max(hi, s[1])
        if not have_all:
            row = table.read(base_version).agg(
                F.min(col).alias("lo"), F.max(col).alias("hi")
            ).collect()[0]
            lo, hi = row["lo"], row["hi"]
        bounds[col] = (lo, hi)
    n = 1 << bits

    def _cell(col: str):
        lo, hi = bounds[col]
        if lo is None or hi is None or lo == hi:
            return F.lit(0).cast("bigint")
        wb = F.width_bucket(
            F.col(col).cast("double"),
            F.lit(float(lo)),
            F.lit(float(hi)),
            F.lit(n),
        )
        # width_bucket returns n+1 at the max (and 0 below min, which
        # truncated float stats can produce) — clamp into [1, n]
        return (
            F.greatest(F.least(wb, F.lit(n)), F.lit(1)) - 1
        ).cast("bigint")

    return curve_fn(_cell(col_a), _cell(col_b), bits)


def cluster_zorder(
    table: TxnTable,
    col_a: str,
    col_b: str,
    app_txn_id: str | None = None,
    num_files: int = 8,
    bits: int = 8,
    curve: str = "zorder",
) -> int:
    """Rewrite the current snapshot CLUSTERED on the Z-order (Morton)
    curve of two numeric columns, as a single compaction-style commit —
    Delta's ``OPTIMIZE ... ZORDER BY (a, b)``.  Content is unchanged;
    what changes is the physical layout: every output file covers a
    narrow min/max band on BOTH columns, so the committed footer stats
    let prune_files / read_pruned_multi skip most files for a 2-D box
    predicate (a single-column sort only ever helps its leading column).

    The per-column grid is uniform ``2^bits`` buckets over the column's
    global [min, max], derived from the committed per-file stats fold —
    a driver-side pass over the log, NO extra data scan (falls back to
    one aggregate when stats are missing).  Heavily skewed columns want
    equi-depth cells instead (rank-scale upstream, layout.write_zordered
    shows the shape); uniform cells keep the rewrite one shuffle.

    Deletion vectors fold in (the snapshot read applies them and the
    commit removes every base file, clearing the DV map) and history
    still time-travels to the pre-cluster layout.  Same OCC rule as
    compact: any concurrent data commit wins and this raises TxnConflict.

    ``curve="hilbert"`` swaps the Morton interleave for the Hilbert
    curve (layout.hilbert_value): no diagonal jumps, so each file covers
    a tighter 2-D region for the same row count — the stronger-locality
    clustering production formats moved to.  Same commit, same pruning.
    """
    if curve not in ("zorder", "hilbert"):
        raise ValueError(f"unknown curve {curve!r}")
    if app_txn_id is not None and table.is_committed(app_txn_id):
        return table.latest_version()
    commits = table._commits()
    base_version = table.latest_version()
    base_files = table.live_files(base_version, commits=commits)
    if not base_files:
        return base_version
    snapshot = table.read(base_version)
    zcol = _cluster_curve_expr(
        table, base_files, col_a, col_b, bits, curve, commits, base_version
    )
    clustered = (
        snapshot.withColumn("__z", zcol)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    adds = table._write_files(clustered)
    if not table._try_commit(
        base_version + 1, "cluster", adds, base_files, app_txn_id
    ):
        for name in adds:
            (table.path / table.DATA_DIR / name).unlink(missing_ok=True)
        raise TxnConflict(
            f"cluster based on version {base_version} lost to a concurrent commit"
        )
    return base_version + 1


def cluster_incremental(
    table: TxnTable,
    col_a: str,
    col_b: str,
    app_txn_id: str | None = None,
    num_files: int = 4,
    bits: int = 8,
    curve: str = "zorder",
) -> dict:
    """INCREMENTAL clustering: rewrite only the files appended SINCE the
    last cluster commit, leaving the already-clustered bulk untouched —
    the liquid-clustering maintenance shape.  A full cluster_zorder at
    100 TB re-shuffles the whole table to fold in a day's appends; this
    clusters just the unclustered tail (among itself, on the same curve
    cells — the grid bounds come from the same committed-stats fold, so
    tail files land on the same cell lattice and prune_files treats old
    and new files uniformly).  Periodic full rewrites still help (two
    clustered generations overlap in curve ranges where a single rewrite
    would not), but every query between them gets tail files with tight
    2-D bands instead of hash-scattered ones.

    Files added by a previous "cluster"/"cluster_incremental" commit are
    skipped; the commit removes ONLY the tail files, so the conflict
    window and the write cost both track the tail size.  DV entries on
    tail files fold in (their rows are read DV-applied and the files are
    removed).  Returns {"version", "n_clustered", "n_untouched"};
    version = current latest when there is no tail (no-op, no commit)."""
    if curve not in ("zorder", "hilbert"):
        raise ValueError(f"unknown curve {curve!r}")
    if app_txn_id is not None and table.is_committed(app_txn_id):
        return {
            "version": table.latest_version(),
            "n_clustered": 0,
            "n_untouched": len(table.live_files()),
        }
    commits = table._commits()
    base_version = table.latest_version()
    base_files = table.live_files(base_version, commits=commits)
    clustered_files: set[str] = set()
    for c in commits:
        if c["op"] in ("cluster", "cluster_incremental"):
            clustered_files.update(c["adds"])
    tail = [f for f in base_files if f not in clustered_files]
    if not tail:
        return {
            "version": base_version,
            "n_clustered": 0,
            "n_untouched": len(base_files),
        }
    # same grid as cluster_zorder, over the FULL snapshot's bounds so the
    # tail lands on the same cell lattice as the clustered bulk
    snapshot_tail = table.read_files(tail, version=base_version)
    zcol = _cluster_curve_expr(
        table, base_files, col_a, col_b, bits, curve, commits, base_version
    )
    rewritten = (
        snapshot_tail.withColumn("__z", zcol)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    adds = table._write_files(rewritten)
    if not table._try_commit(
        base_version + 1, "cluster_incremental", adds, tail, app_txn_id
    ):
        for name in adds:
            (table.path / table.DATA_DIR / name).unlink(missing_ok=True)
        raise TxnConflict(
            f"incremental cluster based on version {base_version} lost to a "
            f"concurrent commit"
        )
    return {
        "version": base_version + 1,
        "n_clustered": len(tail),
        "n_untouched": len(base_files) - len(tail),
    }


def restore_version(
    table: TxnTable, version: int, app_txn_id: str | None = None
) -> int:
    """RESTORE the table to an earlier version's CONTENT as a NEW commit
    (Delta's RESTORE TABLE ... VERSION AS OF): the restore point's live
    files are re-added and the current snapshot's files removed — a
    metadata-only commit (data files are immutable and still on disk;
    nothing rewrites).  History is preserved: the bad versions remain
    time-travelable, the restore itself appears in history, and CDF
    between pre- and post-restore versions reports exactly the rows the
    restore un-did.  The restore point's deletion-vector state carries
    over (its dv mapping is re-declared on the restore commit), and any
    CHECK constraints added since the restore point stay in force — they
    are table metadata, not content, AND the restored content is
    validated against them before the restore commits (the restore-point
    snapshot already satisfied every constraint in force back then —
    writes are gated — so only constraints set AFTER the restore point
    need the extra scan; zero scans in the common no-new-constraints
    case).  A nonexistent or future version raises ValueError instead of
    committing a no-op restore that never existed.

    Same OCC rule as every maintenance commit: a concurrent data commit
    wins and this raises TxnConflict."""
    if app_txn_id is not None and table.is_committed(app_txn_id):
        return table.latest_version()
    commits = table._commits()
    base_version = table.latest_version()
    known = {c["version"] for c in commits}
    if min(known, default=1) == 1:
        known.add(0)  # pre-first-commit empty table, unless expiry cut it off
    if version not in known:
        raise ValueError(
            f"cannot restore to version {version}: not in retained history "
            f"(latest is {base_version})"
        )
    target_files = table.live_files(version, commits=commits)
    # constraints set after the restore point: the only ones the restored
    # snapshot has never been validated against (shared fold — see
    # _constraints_fold)
    live, set_at = table._constraints_fold(base_version, commits)
    to_check = {
        n: sql for n, sql in live.items() if set_at.get(n, 0) > version
    }
    if to_check and target_files:
        table._raise_violations(table.read(version), to_check)
    current_files = table.live_files(base_version, commits=commits)
    dvs = table.dv_map(version, commits)
    cur_dvs = table.dv_map(base_version, commits)
    adds = [f for f in target_files if f not in set(current_files)]
    removes = [f for f in current_files if f not in set(target_files)]
    # shared files must end with EXACTLY the restore point's DV state:
    # re-declare its mapping, and explicitly CLEAR (None marker) any
    # vector added after the restore point on a file both snapshots share
    dv_updates: dict = dict(dvs)
    for f in set(target_files) & set(current_files):
        if f in cur_dvs and f not in dvs:
            dv_updates[f] = None
    extra: dict = {"restored_version": version}
    if dv_updates:
        extra["dv_updates"] = dv_updates
        extra["dv_files"] = sorted({d for d in dvs.values()})
    if not table._try_commit(
        base_version + 1, "restore", adds, removes, app_txn_id, extra=extra
    ):
        raise TxnConflict(
            f"restore to version {version} lost to a concurrent commit"
        )
    return base_version + 1


def expire_snapshots(table: TxnTable, keep_last: int) -> list[int]:
    """Bound the time-travel window to the last ``keep_last`` versions
    (Iceberg's expire_snapshots): versions below the cutoff are removed
    from the log, and the cutoff version's commit is REWRITTEN as a
    self-contained checkpoint (its full live file set as adds, no
    removes), so replay from the truncated log reconstructs every
    retained version bit-for-bit.  Per-file column stats for the
    checkpointed files are carried over, so read_pruned() skips exactly
    as before.

    After expiry, ``vacuum()`` reclaims the data files only expired
    versions referenced — the disk-space payoff (before expiry, vacuum
    keeps them because they back time travel).

    Reading an expired version raises (live_files guard) rather than
    silently returning an empty/wrong snapshot.  Two caveats, same as
    the production formats: retention must exceed (a) the oldest
    concurrent reader's pin, (b) the longest possible sink re-delivery
    window — expired commits' ``app_txn_id``s are forgotten (except the
    cutoff's own), so an ancient replayed micro-batch would no longer
    dedupe.

    The checkpoint swap uses write-temp + os.replace (atomic on POSIX
    and the put-overwrite object-store analog); the O_EXCL race
    discipline is unnecessary here because maintenance is single-writer
    by contract (as in Delta/Iceberg, concurrent expiry is externally
    serialized).

    Returns the expired version numbers (empty list = nothing to do).
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    latest = table.latest_version()
    cutoff = latest - keep_last + 1
    commits = table._commits()
    expired = [c["version"] for c in commits if c["version"] < cutoff]
    if not expired:
        return []
    pinned = {n: v for n, v in _load_refs(table).items() if v in set(expired)}
    if pinned:
        # Iceberg semantics: tagged snapshots are retained; expiring one
        # requires an explicit delete_tag first — never a silent unpin.
        raise ValueError(
            f"cannot expire tagged versions {sorted(pinned.items())}; "
            f"delete_tag first"
        )
    live = table.live_files(cutoff)
    # Stats for the checkpointed files, harvested from any commit that
    # added them (adds are unique per file name).
    stats: dict[str, dict] = {}
    for c in commits:
        if c["version"] <= cutoff:
            stats.update(
                {n: s for n, s in c.get("stats", {}).items() if n in set(live)}
            )
    orig = next(c for c in commits if c["version"] == cutoff)
    # Schema-evolution continuity: the checkpoint carries forward (a) the
    # full schema-snapshot history at or below the cutoff and (b) each
    # surviving file's ORIGINAL add version, so field-id resolution for
    # pre-cutoff files (which keep their write-era physical column names)
    # still works after the originating commits are unlinked.
    schema_history = table._schema_commits(cutoff)
    addv = {
        f: v
        for f, v in table._file_add_versions().items()
        if f in set(live)
    }
    # Deletion-vector continuity: the checkpoint re-declares the DV
    # mapping live at the cutoff (dv_map resets on base commits, so the
    # checkpoint must carry it) and references the vector files so
    # vacuum keeps them.
    dvs = table.dv_map(cutoff, commits)
    cons = table.constraints(cutoff, commits)
    ptf = partition_transform(table, cutoff, commits)
    ptf_hist = partition_transform_history(table, cutoff, commits)
    blooms = bloom_spec(table, cutoff, commits)
    payload = json.dumps(
        {
            "version": cutoff,
            "op": "checkpoint",
            "base": True,
            "adds": live,
            "removes": [],
            "app_txn_id": orig.get("app_txn_id"),
            # the ORIGINAL commit time, not the expiry wall-time: the
            # checkpoint REPRESENTS version `cutoff`, and read_as_of for
            # any instant at which that snapshot was live must keep
            # resolving to it after expiry
            "committed_at": orig.get("committed_at", time.time()),
            "stats": stats,
            **(
                {"schema_history": schema_history, "add_versions": addv}
                if schema_history
                else {}
            ),
            **(
                {
                    "dv_updates": dvs,
                    "dv_files": sorted(set(dvs.values())),
                }
                if dvs
                else {}
            ),
            **(
                {"constraints": cons} if cons else {}
            ),
            **(
                {"partition_transform": ptf} if ptf else {}
            ),
            **(
                {"partition_transform_history": ptf_hist} if ptf_hist else {}
            ),
            **(
                {"bloom_filters": blooms} if blooms else {}
            ),
        },
        indent=1,
    )
    tmp = table._log_path(cutoff).with_suffix(".tmp")
    with open(tmp, "w") as fh:
        fh.write(payload)
    os.replace(tmp, table._log_path(cutoff))
    for v in expired:
        table._log_path(v).unlink(missing_ok=True)
    return expired


def table_changes(
    table: TxnTable,
    from_version: int,
    to_version: int,
    keys: list[str],
) -> DataFrame:
    """Change data feed between two committed versions (Delta's
    table_changes): the row-level diff derived FROM THE SNAPSHOTS, so it
    works for any pair of versions regardless of which operations
    produced them (append/overwrite/merge/compact — compaction commits
    correctly produce an EMPTY feed, since content is unchanged).

    Returns one row per changed key:
      keys..., change_type ('insert' | 'delete' | 'update_postimage'),
      old_<col>..., new_<col>... for every non-key column (null on the
      absent side of inserts/deletes).  Unchanged rows are filtered with
      a null-safe struct compare, so evolution-added columns (null in
      old files) diff correctly.

    ``from_version=0`` diffs against the empty table (everything is an
    insert) — the bootstrap form a downstream incremental consumer uses
    on first sync.

    Scale: one full-outer join keyed on the table key between two
    snapshot scans — the operation an incremental downstream pays ONCE
    per sync instead of reprocessing the table; at 100 TB both sides
    prune to the key + compared columns, and a key-partitioned layout
    turns it into a co-located join (see operators/bucketing.py).
    """
    # Both snapshots read under to_version's NAMES (field-id resolution):
    # a version that only renames a column therefore diffs as an empty
    # feed, and updates across the boundary diff the renamed column as
    # itself — CDF stays correct through schema evolution.
    new = table.read(to_version)
    if from_version == 0:
        old = new.where(F.lit(False))
    else:
        old = table.read(from_version, schema_version=to_version)
    val_cols = [c for c in new.columns if c not in keys]
    for c in val_cols:
        if c not in old.columns:
            old = old.withColumn(c, F.lit(None).cast(dict(new.dtypes)[c]))
    o = old.select(
        *[F.col(k).alias(f"_k_old_{k}") for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in val_cols],
    )
    n = new.select(
        *[F.col(k).alias(f"_k_new_{k}") for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in val_cols],
    )
    cond = None
    for k in keys:
        eq = F.col(f"_k_old_{k}") == F.col(f"_k_new_{k}")
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, cond, "full_outer")
    old_key_null = F.col(f"_k_old_{keys[0]}").isNull()
    new_key_null = F.col(f"_k_new_{keys[0]}").isNull()
    change = (
        F.when(old_key_null, F.lit("insert"))
        .when(new_key_null, F.lit("delete"))
        .otherwise(F.lit("update_postimage"))
    )
    same = F.struct(*[F.col(f"old_{c}") for c in val_cols]).eqNullSafe(
        F.struct(*[F.col(f"new_{c}") for c in val_cols])
    )
    return (
        j.where(old_key_null | new_key_null | ~same)
        .select(
            *[
                F.coalesce(F.col(f"_k_new_{k}"), F.col(f"_k_old_{k}")).alias(k)
                for k in keys
            ],
            change.alias("change_type"),
            *[F.col(f"old_{c}") for c in val_cols],
            *[F.col(f"new_{c}") for c in val_cols],
        )
    )


def merge_upsert_pruned(
    table: TxnTable,
    updates: DataFrame,
    key: str,
    app_txn_id: str | None = None,
) -> dict:
    """MERGE that rewrites ONLY the files whose committed [min, max]
    range on ``key`` can contain a delta key — the file-pruned form of
    ``TxnTable.merge_upsert`` (which rewrites the whole snapshot, the
    documented 100 TB gap).  Files outside the delta's key envelope are
    CARRIED OVER untouched: they appear in neither adds nor removes, so
    the commit cost tracks the DELTA's locality, not the table size —
    on a key-range-laid-out table (layout.range_partition / z-order), a
    narrow delta touches a handful of files.

    Pruning is stats-driven and conservative: a file without stats for
    ``key`` is always treated as touched (correctness never rides on the
    optimization — the same rule as read_pruned).  Envelope pruning
    ([delta_min, delta_max] interval overlap) is sound because a file
    whose range misses the envelope contains no delta key at all; a
    sparse wide-spread delta can be refined with an exact broadcast key
    set or a Bloom probe per file — same commit protocol, tighter
    touched set.

    Returns {"version", "n_touched", "n_carried"} — the carried count is
    the savings the layout bought.  Raises TxnConflict if another data
    commit lands first (same optimistic rule as merge_upsert, but the
    conflict window is now only the touched files in principle;
    detecting overlap-only conflicts is a straightforward refinement of
    the version check).
    """
    if app_txn_id is not None and table.is_committed(app_txn_id):
        return {
            "version": table.latest_version(),
            "n_touched": 0,
            "n_carried": len(table.live_files()),
        }
    commits = table._commits()
    base_version = table.latest_version()
    base_files = table.live_files(base_version, commits=commits)
    schemas = table._schema_commits(base_version, commits=commits)
    addv = table._file_add_versions(commits) if schemas else {}
    row = updates.agg(
        F.min(key).alias("lo"),
        F.max(key).alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    lo, hi = row["lo"], row["hi"]
    if row["n"] == 0:
        # empty delta: the merge is a content no-op — commit nothing.
        # Checked BEFORE the empty-table branch, so an empty delta on an
        # empty table is equally a no-op (no junk version 1, no consumed
        # app_txn_id) — the two paths must agree on the contract.
        return {
            "version": base_version,
            "n_touched": 0,
            "n_carried": len(base_files),
        }
    if not base_files:
        v = table.merge_upsert(updates, keys=[key], app_txn_id=app_txn_id)
        return {"version": v, "n_touched": 0, "n_carried": 0}
    stats = table.file_stats(commits)
    touched, carried = [], []
    if lo is None:
        # Non-empty delta whose key is all-NULL: NULL never equi-matches an
        # existing key, so no base file can contain a matching row — the
        # correct merge is a pure append (every base file carried).  Without
        # this guard the stats comparisons below would compare against None.
        carried = list(base_files)
    else:
        for f in base_files:
            st = stats.get(f, {})
            if st.get("__rows__") == 0:
                carried.append(f)  # provably empty: no keys to merge
                continue
            # stats live under the file's PHYSICAL write-era key name
            # (rename/drop transparent — the read_pruned resolution rule)
            pname = table._stats_physical_name(key, f, schemas, addv)
            s = st.get(pname) if pname else None
            if s is None or not (
                s[1] < _stat_bound(s[1], lo) or s[0] > _stat_bound(s[0], hi)
            ):
                touched.append(f)
            else:
                carried.append(f)
    if touched:
        # era-mapped read: touched files surface under LOGICAL names, so
        # the anti-join/union against the (logical-named) delta is sound
        # on evolved tables and the rewrite normalizes them to current
        # names (stats re-harvest under those at commit).  Deletion
        # vectors apply here too — a rewrite that ignored a touched
        # file's DV would resurrect its deleted rows.
        base = table._read_resolved(
            touched,
            schemas,
            commits,
            dvs=table.dv_map(base_version, commits),
        )
        merged = base.join(updates.select(key), [key], "left_anti").unionByName(
            updates, allowMissingColumns=True
        )
    else:
        merged = updates
    adds = table._write_files(merged)
    table._validate_adds(adds)
    if not table._try_commit(
        base_version + 1, "merge_pruned", adds, touched, app_txn_id
    ):
        for name in adds:
            (table.path / table.DATA_DIR / name).unlink(missing_ok=True)
        raise TxnConflict(
            f"pruned merge based on version {base_version} lost to a "
            f"concurrent commit (now {table.latest_version()})"
        )
    return {
        "version": base_version + 1,
        "n_touched": len(touched),
        "n_carried": len(carried),
    }


def merge_full_sync(
    table: TxnTable,
    source: DataFrame,
    key: str,
    delete_condition: str | None = None,
    app_txn_id: str | None = None,
) -> dict:
    """MERGE with full-sync semantics in ONE commit — Delta's
    ``WHEN MATCHED THEN UPDATE ALL / WHEN NOT MATCHED THEN INSERT ALL /
    WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE``: after the
    commit, every source row is present (source wins on key ties), and
    every pre-existing row whose key does NOT appear in the source is
    deleted — all of them when ``delete_condition`` is None, else only
    the rows satisfying the condition (SQL over the row's columns, e.g.
    ``"region = 'EU'"``).  Replica sync therefore needs neither a
    separate diff nor a delete_keys pass.

    Scale shape (the delete side PREFERS metadata over rewrites):
    - Files overlapping the source's [min, max] key envelope are
      REWRITTEN (they may hold matched rows): kept content = their
      unmatched rows that fail the delete condition, plus all source
      rows.  Same stats-driven conservative pruning as
      merge_upsert_pruned — a file without stats counts as touched.
    - Files OUTSIDE the envelope can hold no matched key, so every row
      is "not matched by source": with no condition the whole file is
      DROPPED from the snapshot (metadata-only, zero bytes moved); with
      a condition the matching rows land in a DELETION VECTOR
      (merge-on-read, zero data files rewritten — the delete_keys_dv
      machinery, prior vectors unioned so earlier deletes survive).

    OCC: computed against a pinned snapshot, commits at base+1 or
    raises TxnConflict (any concurrent data commit conflicts — the
    delete-by-absence side reads the WHOLE snapshot, so no narrower
    window is sound).  Idempotent under ``app_txn_id``.  The written
    batch passes CHECK-constraint validation before visibility.

    Returns {"version", "n_touched", "n_carried", "n_dropped",
    "n_dv_files"}."""
    if app_txn_id is not None and table.is_committed(app_txn_id):
        return {
            "version": table.latest_version(),
            "n_touched": 0,
            "n_carried": len(table.live_files()),
            "n_dropped": 0,
            "n_dv_files": 0,
        }
    commits = table._commits()
    base_version = table.latest_version()
    base_files = table.live_files(base_version, commits=commits)
    schemas = table._schema_commits(base_version, commits=commits)
    addv = table._file_add_versions(commits) if schemas else {}
    dvs = table.dv_map(base_version, commits)
    row = source.agg(
        F.min(key).alias("lo"), F.max(key).alias("hi")
    ).collect()[0]
    lo, hi = row["lo"], row["hi"]
    stats = table.file_stats(commits)
    touched: list[str] = []
    unmatched: list[str] = []  # no source key can live here
    for f in base_files:
        st = stats.get(f, {})
        if st.get("__rows__") == 0:
            unmatched.append(f)
            continue
        pname = table._stats_physical_name(key, f, schemas, addv)
        s = st.get(pname) if pname else None
        if lo is not None and (
            s is None
            or not (
                s[1] < _stat_bound(s[1], lo) or s[0] > _stat_bound(s[0], hi)
            )
        ):
            touched.append(f)
        else:
            # all-NULL source key (lo None) equi-matches nothing: every
            # base file is pure not-matched-by-source territory
            unmatched.append(f)
    # ---- rewrite side: touched files' kept rows + every source row.
    # With no delete condition EVERY unmatched row deletes, so the
    # rewrite is exactly the source; with one, unmatched rows failing
    # the condition survive the rewrite.
    if touched and delete_condition is not None:
        base = table._read_resolved(touched, schemas, commits, dvs=dvs)
        kept = base.join(source.select(key), [key], "left_anti").where(
            ~F.coalesce(
                F.expr(delete_condition).cast("boolean"), F.lit(False)
            )
        )
        merged = kept.unionByName(source, allowMissingColumns=True)
    else:
        merged = source
    adds = table._write_files(merged)
    table._validate_adds(adds)
    # ---- delete-by-absence side on unmatched files
    removes = list(touched)
    dv_adds: list[str] = []
    dv_updates: dict[str, str] = {}
    if unmatched:
        if delete_condition is None:
            # every row deletes: drop the files, move zero bytes
            removes += unmatched
        else:
            with_pos = table._read_resolved(
                unmatched, schemas, commits, dvs=dvs, with_positions=True
            )
            hits = with_pos.where(
                F.coalesce(
                    F.expr(delete_condition).cast("boolean"), F.lit(False)
                )
            ).select(
                F.col("__file").alias("file"), F.col("__pos").alias("pos")
            )
            dv_touched = sorted(
                r["file"] for r in hits.select("file").distinct().collect()
            )
            if dv_touched:
                prior = [dvs[f] for f in dv_touched if f in dvs]
                new_rows = hits
                if prior:
                    new_rows = new_rows.unionByName(
                        table._dv_rows(prior).where(
                            F.col("file").isin(dv_touched)
                        )
                    ).distinct()
                dv_adds = table._write_files(new_rows.coalesce(1))
                dv_updates = {f: dv_adds[0] for f in dv_touched}
    extra: dict = {}
    if dv_updates:
        extra = {"dv_updates": dv_updates, "dv_files": dv_adds}
    if not table._try_commit(
        base_version + 1,
        "merge_full_sync",
        adds,
        removes,
        app_txn_id,
        extra=extra,
    ):
        for name in adds + dv_adds:
            (table.path / table.DATA_DIR / name).unlink(missing_ok=True)
        raise TxnConflict(
            f"full-sync merge based on version {base_version} lost to a "
            f"concurrent commit (now {table.latest_version()})"
        )
    return {
        "version": base_version + 1,
        "n_touched": len(touched),
        "n_carried": len(base_files) - len(touched)
        - (len(unmatched) if delete_condition is None else 0),
        "n_dropped": len(unmatched) if delete_condition is None else 0,
        "n_dv_files": len(dv_updates),
    }


# ----------------------------------------- hidden partition transforms
# Iceberg-style hidden partitioning: the table declares a TRANSFORM of a
# raw column (days(ts), bucket(n, col)); writes cluster by the transform
# into a physical __p_* column that every read path strips
# (_read_resolved), and raw-column predicates prune files THROUGH the
# transform — the user never sees or manages a partition column.


def _transform_column(spec: dict, col, dtype: str | None = None) -> "F.Column":
    """The transform's value expression over ``col`` (a Column).
    ``dtype`` (the column's Spark type string) selects truncate's
    variant: W-char prefix for strings, floor-to-width for integers
    (F.pmod is the sign-correct floored modulus, so negative values
    floor toward -inf like Iceberg) — MONOTONIC either way, so range
    predicates prune through truncate like days."""
    if spec["kind"] == "days":
        return F.datediff(col.cast("date"), F.to_date(F.lit("1970-01-01")))
    if spec["kind"] == "bucket":
        return F.pmod(F.xxhash64(col), F.lit(int(spec["n"]))).cast("int")
    if spec["kind"] == "truncate":
        w = int(spec["n"])
        if dtype == "string":
            return F.substring(col, 1, w)
        return col - F.pmod(col, F.lit(w))
    raise ValueError(f"unknown partition transform kind {spec['kind']!r}")


def _hidden_name(spec: dict) -> str:
    if spec["kind"] in ("bucket", "truncate"):
        return f"__p_{spec['kind']}_{spec['n']}_{spec['col']}"
    return f"__p_{spec['kind']}_{spec['col']}"


def set_bloom_filter(
    table: TxnTable, column: str, num_bits: int = 4096, k: int = 5
) -> int:
    """Declare a point-lookup bloom filter on ``column`` as a
    metadata-only commit (Delta's `delta.bloomFilter` table property
    role): every file written AFTER the declaration commits a sparse
    per-file bitset alongside its min/max stats, and
    prune_files_values() skips files the bitset proves cannot contain a
    probed value — the lookup shape range stats never prune on a
    hash-scattered key.  Earlier files carry no bloom and read
    conservatively.  Defaults (m=4096, k=5) hold ~1% false positives to
    ~570 distinct values per file and cost at most m positions of
    commit-log metadata per file.

    On a schema-evolved table the declaration records the column's FIELD
    ID, so later renames keep producing bitsets under each write era's
    physical name (the same rename-transparency the min/max stats have);
    declaring a column the non-empty table doesn't have raises."""
    if num_bits < 8 or k < 1:
        raise ValueError("bloom filter requires num_bits >= 8 and k >= 1")
    decl = {"col": column, "m": int(num_bits), "k": int(k)}
    schemas = table._schema_commits()
    if schemas:
        fid = next(
            (
                f["id"]
                for f in schemas[-1]["fields"]
                if f["name"] == column
            ),
            None,
        )
        if fid is None:
            raise ValueError(
                f"set_bloom_filter: column {column!r} is not in the "
                f"table's current schema"
            )
        decl["field_id"] = fid
    elif table.live_files() and column not in table.read().columns:
        raise ValueError(
            f"set_bloom_filter: column {column!r} is not in the "
            f"table's current schema"
        )
    v = table.latest_version() + 1
    # the era the (possibly name-only) declaration refers to — lets the
    # write path resolve the name through renames that happen later
    decl["declared_at"] = v
    if not table._try_commit(
        v, "set_bloom_filter", [], [], None, extra={"bloom_filter": decl}
    ):
        raise TxnConflict("set_bloom_filter lost a version race")
    return v


def _fold_meta(
    table: TxnTable,
    version: int | None,
    commits: list[dict] | None,
    carry_key: str,
    commit_key: str,
    init,
    reset,
    apply,
):
    """THE checkpoint-aware commit-log metadata fold shared by
    partition_transform, partition_transform_history and bloom_spec
    (mirroring _constraints_fold's discipline, extracted so the
    version-cap / base-commit-carry rules can never diverge between
    them): commits at or below ``version``; a checkpoint ("base")
    commit carrying ``carry_key`` resets the state through ``reset``;
    any commit carrying ``commit_key`` folds through ``apply``."""
    v = table.latest_version() if version is None else version
    commits = table._commits() if commits is None else commits
    state = init
    for c in commits:
        if c["version"] > v:
            break
        if c.get("base") and carry_key in c:
            state = reset(c[carry_key])
            continue
        if c.get(commit_key):
            state = apply(state, c[commit_key])
    return state


def bloom_spec(
    table: TxnTable,
    version: int | None = None,
    commits: list[dict] | None = None,
) -> dict[str, dict]:
    """column -> {m, k[, field_id]} bloom declarations in force at
    ``version`` (latest per column wins; expiry checkpoints carry the
    folded map forward under ``bloom_filters``)."""
    return _fold_meta(
        table,
        version,
        commits,
        carry_key="bloom_filters",
        commit_key="bloom_filter",
        init={},
        reset=dict,
        apply=lambda s, d: {
            **s,
            d["col"]: {k2: v2 for k2, v2 in d.items() if k2 != "col"},
        },
    )


def metadata_count(table: TxnTable, version: int | None = None) -> int:
    """COUNT(*) of the snapshot WITHOUT scanning data files: committed
    per-file ``__rows__`` stats sum to the physical total, and live
    deletion vectors subtract their positions (read from the DV files
    only — O(deleted rows), the same cost class as Delta's stored DV
    cardinality; a table with no DVs answers purely from the commit
    log).  Files predating row-count stats (none written by this engine,
    but a conservative reader assumes nothing) fall back to a real count
    of just those files.  This is the aggregate-pushdown shape that
    answers `SELECT count(*)` on a 100 TB table in milliseconds."""
    commits = table._commits()
    v = table.latest_version() if version is None else version
    files = table.live_files(v, commits=commits)
    stats = table.file_stats(commits)
    total = 0
    unknown: list[str] = []
    for f in files:
        r = stats.get(f, {}).get("__rows__")
        if r is None:
            unknown.append(f)
        else:
            total += int(r)
    dvs = {
        f: d for f, d in table.dv_map(v, commits).items() if f in set(files)
    }
    if unknown:
        # read_files applies DVs itself — exclude those files from the
        # DV subtraction below or their deletes would count twice
        total += table.read_files(unknown, version=v).count()
        dvs = {f: d for f, d in dvs.items() if f not in set(unknown)}
    if dvs:
        counted = set(dvs)
        total -= (
            table._dv_rows(sorted(set(dvs.values())))
            .where(F.col("file").isin(sorted(counted)))
            .select("file", "pos")
            .distinct()
            .count()
        )
    return total


def metadata_minmax(
    table: TxnTable, column: str, version: int | None = None
) -> tuple:
    """MIN/MAX of ``column`` answered from committed per-file stats
    wherever that is sound, scanning ONLY the files where it is not
    (Delta's OptimizeMetadataOnlyQuery role, extended to deletion
    vectors): a file contributes its footer [min, max] directly unless
    (a) it carries a live DV (the extremum might be a deleted row),
    (b) it has no stats for the column, or (c) the column resolution is
    ambiguous on an evolved table — those files alone are scanned and
    folded in.  Parquet footer min/max ignore NULLs, matching SQL
    aggregate semantics; all-null files carry no min/max stat and land
    in the scan set, where the exact aggregate ignores them too.

    Column-era resolution is STRICT field-id (the prune_files_nullness
    rule, not the range-pruning rule): a stale same-name stat is sound
    for range PRUNING (missed rows surface as NULL and never match) but
    NOT for aggregation (a dropped column's extrema are not the
    re-added column's), so unresolvable files are scanned, never
    trusted.

    Stats stringify temporal scalars (ISO order-preserving), so on a
    date/timestamp column the result may come back as ISO strings when
    any metadata stat contributed.  Returns (None, None) for an
    empty/all-null snapshot."""
    commits = table._commits()
    v = table.latest_version() if version is None else version
    files = table.live_files(v, commits=commits)
    schemas = table._schema_commits(v, commits=commits)
    addv = table._file_add_versions(commits) if schemas else {}
    stats = table.file_stats(commits)
    dvs = table.dv_map(v, commits)
    if schemas:
        fid = next(
            (
                f["id"]
                for f in schemas[-1]["fields"]
                if f["name"] == column
            ),
            None,
        )
    lo = hi = None
    scan: list[str] = []
    for f in files:
        st = stats.get(f, {})
        if st.get("__rows__") == 0:
            continue
        if not schemas:
            pname = column
        elif fid is None:
            pname = None
        else:
            pname = table._physical_name(fid, addv.get(f, 0), schemas)
        s = st.get(pname) if pname else None
        if f in dvs or s is None:
            scan.append(f)
            continue
        mn, mx = s
        lo = mn if lo is None else min(lo, mn)
        hi = mx if hi is None else max(hi, mx)
    if scan:
        row = (
            table.read_files(scan, version=v)
            .agg(F.min(column).alias("mn"), F.max(column).alias("mx"))
            .collect()[0]
        )
        smn, smx = row["mn"], row["mx"]
        if smn is not None:
            if isinstance(lo, str) and not isinstance(smn, str):
                smn, smx = str(smn), str(smx)
            lo = smn if lo is None else min(lo, smn)
            hi = smx if hi is None else max(hi, smx)
    return lo, hi


def set_partition_transform(
    table: TxnTable, kind: str, col: str, n: int | None = None
) -> int:
    """Declare the table's hidden partition transform as a metadata-only
    commit (Iceberg's partition spec): ``kind`` is ``"days"`` (temporal
    clustering; raw range predicates prune through the monotonic
    transform), ``"bucket"`` with ``n`` (hash clustering; raw equality
    predicates prune to the one matching bucket), or ``"truncate"`` with
    ``n`` (Iceberg's truncate[W] — floor-to-width for integers, W-char
    prefix for strings; monotonic, so range predicates prune through it
    like days).  Later declarations replace earlier ones; existing files
    keep their old layout and stay readable (pruning is stats-driven,
    never a correctness gate)."""
    if kind not in ("days", "bucket", "truncate"):
        raise ValueError(f"unknown partition transform kind {kind!r}")
    if kind in ("bucket", "truncate") and (n is None or n < 1):
        raise ValueError(f"{kind} transform requires n >= 1")
    spec = {"kind": kind, "col": col, **({"n": int(n)} if n else {})}
    v = table.latest_version() + 1
    if not table._try_commit(
        v,
        "set_partition_transform",
        [],
        [],
        None,
        extra={"partition_transform": spec},
    ):
        raise TxnConflict("set_partition_transform lost a version race")
    return v


def partition_transform(
    table: TxnTable,
    version: int | None = None,
    commits: list[dict] | None = None,
) -> dict | None:
    """The transform spec in force at ``version`` (latest declaration
    wins; expiry checkpoints carry it forward under the same key)."""
    return _fold_meta(
        table,
        version,
        commits,
        carry_key="partition_transform",
        commit_key="partition_transform",
        init=None,
        reset=lambda v: v,
        apply=lambda s, v: v,
    )


def partition_transform_history(
    table: TxnTable,
    version: int | None = None,
    commits: list[dict] | None = None,
) -> list[dict]:
    """EVERY transform spec declared at or below ``version``, deduped by
    hidden column name — the partition-EVOLUTION fold (Iceberg's spec
    history).  Pruning conjoins one hidden predicate per spec here:
    each spec's stats key encodes (kind, n, col), so a predicate only
    ever bites files actually written under that exact transform, and
    files from every era keep pruning after the spec changes.  Expiry
    checkpoints carry the folded list (``partition_transform_history``);
    a pre-history checkpoint degrades to its single carried spec — old
    eras' files just read conservatively, never wrongly."""
    specs: list[dict] = _fold_meta(
        table,
        version,
        commits,
        carry_key="partition_transform_history",
        commit_key="partition_transform",
        init=[],
        reset=list,
        apply=lambda s, v: s + [v],
    )
    seen: set[str] = set()
    out: list[dict] = []
    for s in specs:
        name = _hidden_name(s)
        if name not in seen:
            seen.add(name)
            out.append(s)
    return out


def append_clustered(
    table: TxnTable,
    df: DataFrame,
    num_files: int = 4,
    app_txn_id: str | None = None,
) -> int:
    """Append laid out by the table's declared hidden transform: the
    __p_* transform column is computed, the batch range-partitions and
    sorts on it (each file covers a narrow contiguous transform band —
    tight footer stats), and the column ships IN the parquet so pruning
    reads it from commit stats while _read_resolved hides it from every
    logical read.  Plain appends remain legal; their files simply carry
    no transform stats and are never pruned by it."""
    spec = partition_transform(table)
    if spec is None:
        raise ValueError(
            "append_clustered requires set_partition_transform first"
        )
    hidden = _hidden_name(spec)
    out = (
        df.withColumn(
            hidden,
            _transform_column(
                spec, F.col(spec["col"]), dict(df.dtypes).get(spec["col"])
            ),
        )
        .repartitionByRange(num_files, hidden)
        .sortWithinPartitions(hidden)
    )
    return table.append(out, app_txn_id=app_txn_id)


def _transform_literals_multi(
    table: TxnTable, specs: list[dict], values: list
) -> list[list]:
    """Evaluate EVERY spec's transform on the literal raw values
    ENGINE-SIDE in one tiny job (one column per spec over a
    len(values)-row frame) so pruning bounds are bit-identical to what
    the writer computed — never a Python reimplementation of
    xxhash64/datediff.  Literals are CAST to the table column's actual
    type first: xxhash64 is type-sensitive (hash(42 AS int) !=
    hash(42 AS bigint)), so hashing the Python-inferred type would
    compute a different bucket than append_clustered wrote and silently
    prune matching files.  Returns one value list per spec, in order."""
    if not specs or not values:
        return [[] for _ in specs]
    dtypes = dict(table.read().dtypes)
    df = table.spark.createDataFrame([(v,) for v in values], ["v"])
    rows = df.select(
        *[
            _transform_column(
                s,
                F.col("v").cast(dtypes[s["col"]]),
                dtypes[s["col"]],
            ).alias(f"t{i}")
            for i, s in enumerate(specs)
        ]
    ).collect()
    return [[r[f"t{i}"] for r in rows] for i in range(len(specs))]


def _transform_literals(table: TxnTable, spec: dict, values: list):
    """Single-spec convenience over _transform_literals_multi."""
    return _transform_literals_multi(table, [spec], values)[0]


def prune_files_hidden(
    table: TxnTable,
    lower=None,
    upper=None,
    version: int | None = None,
    commits: list[dict] | None = None,
) -> list[str]:
    """Files that can match a RAW-column predicate, answered through the
    hidden transform: ``days`` maps [lower, upper] through the monotonic
    transform and range-prunes on the __p_* stats (conjoined with any
    raw-column stats); ``bucket`` requires equality (lower == upper) and
    prunes to files whose __p_* band covers the value's bucket — the
    case raw min/max can never prune, since every bucket file spans the
    full raw range.

    PARTITION EVOLUTION: the conjunction carries one hidden predicate
    per spec EVER declared on the query column (partition_transform_
    history), not just the current one.  Each hidden stats key encodes
    (kind, n, col), so a spec's predicate only bites files written under
    that exact transform — after days(ts) evolves to bucket(n, ts), an
    equality probe prunes the old era through the day band AND the new
    era through the bucket, with zero per-file attribution bookkeeping
    (wrong-era stats simply don't exist under the probed name, and a
    missing stat always reads conservatively)."""
    spec = partition_transform(table, version, commits)
    if spec is None:
        raise ValueError("table has no partition transform declared")
    commits = table._commits() if commits is None else commits
    files = table.live_files(version, commits=commits)
    if not files:
        return []
    if lower is None and upper is None:
        return files  # no predicate: nothing to prune by
    is_eq = lower is not None and lower == upper
    usable = [
        e
        for e in partition_transform_history(table, version, commits)
        if e["col"] == spec["col"]
        and (e["kind"] in ("days", "truncate") or is_eq)
    ]
    if spec["kind"] == "bucket" and not is_eq and not usable:
        raise ValueError(
            "bucket transform pruning requires an equality predicate "
            "(lower == upper)"
        )
    preds: list[tuple] = [(spec["col"], lower, upper)]
    # ONE 1-row-per-bound Spark job evaluates every usable era's
    # transform (a column per spec), however many eras the table has
    vals = [v for v in (lower, upper) if v is not None]
    tcols = _transform_literals_multi(table, usable, vals)
    for e, out in zip(usable, tcols):
        if e["kind"] == "bucket":
            preds.append((_hidden_name(e), out[0], out[0]))
        else:
            tlo = out[0] if lower is not None else None
            thi = out[-1] if upper is not None else None
            preds.append((_hidden_name(e), tlo, thi))
    return table.prune_files(preds, version, commits=commits)


def read_pruned_hidden(
    table: TxnTable,
    lower=None,
    upper=None,
    version: int | None = None,
) -> DataFrame:
    """Data-skipping read for a raw-column predicate answered through
    the hidden transform: open only prune_files_hidden's files, then
    apply the exact raw predicate on top."""
    commits = table._commits()
    spec = partition_transform(table, version, commits)
    if spec is None:
        raise ValueError("table has no partition transform declared")
    chosen = prune_files_hidden(table, lower, upper, version, commits)
    df = table.read_files(chosen, version=version)
    col = F.col(spec["col"])
    # the exact filter follows the PREDICATE shape, not the current
    # spec's kind — after evolution a range probe is legal on a
    # bucket-current table (old days-era files still prune)
    if lower is not None and lower == upper:
        return df.where(col == F.lit(lower))
    if lower is not None:
        df = df.where(col >= F.lit(lower))
    if upper is not None:
        df = df.where(col <= F.lit(upper))
    return df


# ------------------------------------------------------------------- tags
def _refs_path(table: TxnTable) -> Path:
    return table.path / table.LOG_DIR / "refs.json"


def _load_refs(table: TxnTable) -> dict:
    p = _refs_path(table)
    if not p.exists():
        return {}
    with open(p) as fh:
        return json.load(fh)


def set_tag(table: TxnTable, name: str, version: int | None = None) -> int:
    """Name a committed version (Iceberg-style tag): ``read_tag`` then
    resolves the name forever — 'the snapshot we trained run 47 on', 'the
    audited quarterly close' — independent of later writes.  Default is
    the current latest version.  Publication is write-temp + os.replace
    (atomic); tags are a tiny name→version map next to the log."""
    v = table.latest_version() if version is None else version
    versions = {c["version"] for c in table._commits()}
    if v not in versions:
        raise ValueError(f"cannot tag version {v}: not a committed version")
    refs = _load_refs(table)
    refs[name] = v
    tmp = _refs_path(table).with_suffix(".tmp")
    with open(tmp, "w") as fh:
        json.dump(refs, fh, indent=1)
    os.replace(tmp, _refs_path(table))
    return v


def read_tag(table: TxnTable, name: str) -> DataFrame:
    """Snapshot read at a named tag."""
    refs = _load_refs(table)
    if name not in refs:
        raise ValueError(f"unknown tag {name!r}; have {sorted(refs)}")
    return table.read(version=refs[name])


def delete_tag(table: TxnTable, name: str) -> None:
    refs = _load_refs(table)
    refs.pop(name, None)
    tmp = _refs_path(table).with_suffix(".tmp")
    with open(tmp, "w") as fh:
        json.dump(refs, fh, indent=1)
    os.replace(tmp, _refs_path(table))


def list_tags(table: TxnTable) -> dict:
    return dict(sorted(_load_refs(table).items()))
