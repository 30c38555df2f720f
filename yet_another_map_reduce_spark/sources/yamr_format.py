"""Custom connector for the reference's on-disk dataset format
(Spark 4 Python DataSource API).

The reference stores a dataset as chunk text files plus a manifest CSV
``<name>_manifest`` with rows ``filename,filesize,header``
(``/root/reference/Client/client.py:147-191`` writes it;
``/root/reference/Master/metadata/data_manifest`` is a live example).
This DataSource makes that layout a first-class Spark format:

- **read**: one ``InputPartition`` per manifest entry — each chunk is
  scanned by its own task, the exact parallelism model of the
  reference's per-worker READ (F2).  Rows are
  ``(part string, line_no bigint, value string)``.
- **write**: each Spark task writes one ``<name>_part-NNNNN.txt`` chunk
  and reports ``(filename, size)`` in its commit message; the driver
  writes the manifest only in ``commit()`` — a two-phase commit, so a
  half-failed job leaves no manifest and readers never see partial
  output (the atomicity the reference's direct-write protocol lacks,
  SURVEY.md §3.2).  ``mode('append')`` over an existing dataset writes
  its chunks under a fresh generation prefix and atomically merges the
  prior manifest entries with the new ones — a failed append leaves the
  old dataset fully intact.

- **time travel**: every commit (batch overwrite/append AND each
  streaming micro-batch) also writes an immutable snapshot manifest
  ``<name>_manifest.vNNNNN``; ``.option('version', N)`` on read pins
  that snapshot.  Batch writes always take a fresh generation prefix —
  chunk files are immutable once written — so snapshots stay valid
  across overwrites; :func:`vacuum` retires old snapshots and their
  unreachable chunks, and :func:`delete_where` is a copy-on-write
  row delete that commits as a new version.
- **chunk pruning**: commits record per-chunk min/max ``value`` stats
  in a sidecar; the reader's ``pushFilters`` (Spark 4.1 Python
  DataSource pushdown) skips chunks that provably contain no matching
  row for =, range, and prefix predicates — partial pushdown, so Spark
  still evaluates every filter on the emitted rows.

Registered under the short name ``yamr``.  Options:
``path`` (directory), ``name`` (dataset name, default ``data``) and
``version`` (read-side snapshot pin, default: live manifest).
"""

from __future__ import annotations

import os
import re as _re
import uuid as _uuid
import warnings

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


def _manifest_path(path: str, name: str, version: int | None = None) -> str:
    if version is None:
        return os.path.join(path, f"{name}_manifest")
    return os.path.join(path, f"{name}_manifest.v{int(version):05d}")


def read_manifest(
    path: str, name: str, version: int | None = None
) -> list[tuple[str, int]]:
    """Parse ``filename,filesize,header`` rows (header line skipped).
    ``version`` reads a committed snapshot manifest instead of the live
    one (time travel)."""
    mpath = _manifest_path(path, name, version)
    entries: list[tuple[str, int]] = []
    with open(mpath, encoding="utf-8") as fh:
        header = fh.readline()
        # validate rather than blindly skip line 1: a truncated or
        # foreign file must fail HERE with the path, not half-parse
        # (an empty read() means a zero-byte manifest — a crashed
        # writer's artifact, equally loud)
        if header.strip() != "filename,filesize,header":
            raise ValueError(
                f"{mpath}: not a yamr manifest (bad or missing header "
                f"line {header.strip()!r})"
            )
        for i, line in enumerate(fh, start=2):
            line = line.strip()
            if not line:
                continue
            parts = line.split(",")
            # sizes are never negative; plain isdigit also rejects the
            # '--5' class that a dash-strip would let through to int()
            if len(parts) != 3 or not parts[1].isdigit():
                raise ValueError(
                    f"{mpath}: corrupt manifest row at line {i}: {line!r}"
                )
            entries.append((parts[0], int(parts[1])))
    return entries


def list_versions(path: str, name: str) -> list[int]:
    """Committed snapshot versions, ascending (empty for pre-snapshot
    datasets)."""
    pat = _re.compile(_re.escape(name) + r"_manifest\.v(\d+)$")
    try:
        names = os.listdir(path)
    except FileNotFoundError:
        return []
    return sorted(int(m.group(1)) for n in names if (m := pat.match(n)))


class ManifestConflictError(RuntimeError):
    """Optimistic-concurrency conflict: the dataset's manifest advanced
    between the start of a write job and its commit.  The losing commit
    is aborted cleanly (its chunks are garbage, never referenced)."""


def _commit_manifest(
    path: str,
    name: str,
    entries: list[tuple[str, int]],
    expected_version: int | None = None,
) -> int:
    """Two-phase manifest publish with a time-travel snapshot and
    optimistic concurrency control.

    The snapshot ``<name>_manifest.vNNNNN`` lands first, then the live
    manifest is atomically replaced — chunk files are already durable
    when this runs, so a snapshot can never reference missing data, and
    a crash between the two steps costs at most one snapshot that never
    became live (readers of the live dataset are unaffected).

    Concurrency: the snapshot version number is claimed with
    ``os.link`` (atomic fail-if-exists on POSIX), so two concurrent
    commits can never write the same snapshot.  When
    ``expected_version`` is given (the version the writer observed at
    job start), a commit whose predecessor is NOT that version raises
    :class:`ManifestConflictError` instead of last-write-winning the
    live manifest — the Delta/Iceberg optimistic protocol.  Without it,
    the commit retries onto the next free version (live manifest is
    still last-write-wins for explicitly unconditional callers).

    Returns the committed version number.
    """
    body = "filename,filesize,header\n" + "".join(
        f"{fname},{fsize},False\n" for fname, fsize in entries
    )
    while True:
        latest = (list_versions(path, name) or [0])[-1]
        if expected_version is not None and latest != expected_version:
            raise ManifestConflictError(
                f"dataset '{name}' at {path}: expected version "
                f"{expected_version} at commit, found {latest} — another "
                "writer committed first; aborting this commit"
            )
        version = latest + 1
        snap = _manifest_path(path, name, version)
        # per-call unique tmp name: pid alone is not enough — two
        # threads in one driver (a streaming micro-batch commit racing
        # a batch commit) would share the path and link the wrong body
        tmp = f"{snap}.tmp.{os.getpid()}.{_uuid.uuid4().hex[:8]}"
        os.makedirs(path, exist_ok=True)
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(body)
        try:
            os.link(tmp, snap)  # atomic version claim
        except FileExistsError:
            os.remove(tmp)
            if expected_version is not None:
                raise ManifestConflictError(
                    f"dataset '{name}' at {path}: version {version} was "
                    "claimed by a concurrent writer; aborting this commit"
                )
            continue  # unconditional commit: retry on the next version
        os.remove(tmp)
        break
    target = _manifest_path(path, name)
    ltmp = f"{target}.tmp.{os.getpid()}.{_uuid.uuid4().hex[:8]}"
    with open(ltmp, "w", encoding="utf-8") as fh:
        fh.write(body)
    os.replace(ltmp, target)
    return version


def _stats_path(path: str, name: str) -> str:
    return os.path.join(path, f"{name}_chunkstats")


def read_chunk_stats(path: str, name: str) -> dict[str, tuple[str, str]]:
    """Per-chunk (min_value, max_value) sidecar, base64-encoded so
    values with commas/newlines round-trip.  Missing file → no stats
    (chunks without stats are never pruned — always safe)."""
    import base64

    stats: dict[str, tuple[str, str]] = {}
    try:
        with open(_stats_path(path, name), encoding="utf-8") as fh:
            next(fh)  # header
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                fname, lo, hi = line.split(",")
                stats[fname] = (
                    base64.b64decode(lo).decode("utf-8"),
                    base64.b64decode(hi).decode("utf-8"),
                )
    except FileNotFoundError:
        pass
    return stats


def _rewrite_chunk_stats(
    path: str, name: str, stats: dict[str, tuple[str, str]]
) -> None:
    """Replace the stats sidecar wholesale (atomic rename)."""
    import base64

    tmp = _stats_path(path, name) + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write("filename,min_b64,max_b64\n")
        for fname in sorted(stats):
            lo, hi = stats[fname]
            fh.write(
                f"{fname},{base64.b64encode(lo.encode()).decode()},"
                f"{base64.b64encode(hi.encode()).decode()}\n"
            )
    os.replace(tmp, _stats_path(path, name))


def _merge_chunk_stats(path: str, name: str, new: dict[str, tuple[str, str]]) -> None:
    """Merge chunk stats into the sidecar (atomic rename).  Written
    AFTER the manifest commit: a crash in between leaves chunks without
    stats, which only disables pruning for them, never correctness."""
    stats = read_chunk_stats(path, name)
    stats.update(new)
    _rewrite_chunk_stats(path, name, stats)


def _prefix_successor(p: str) -> str | None:
    """Smallest string greater than every string with prefix ``p``
    (None if no finite successor exists)."""
    for i in range(len(p) - 1, -1, -1):
        if ord(p[i]) < 0x10FFFF:
            return p[:i] + chr(ord(p[i]) + 1)
    return None


#: NULL marker in chunk files (never produced by _encode_value for a
#: real string: a leading backslash is always escaped to two)
_NULL_TOKEN = "\\N"

#: Chunk-codec version marker, carried in the FILENAME so a dataset
#: can mix codecs (a pre-upgrade dataset appended to post-upgrade):
#: ``*.esc.txt`` chunks use the lossless backslash-escape codec
#: (:func:`_encode_value`/:func:`_decode_value`); plain ``*.txt``
#: chunks are the legacy raw codec (values verbatim, NULL stored as
#: the literal string ``'None'``) and are read back verbatim — never
#: unescaped, so a legacy stored value like ``\\N`` can NOT silently
#: turn into NULL.  Both directions key off the filename, keeping
#: write/read symmetric per chunk with no sidecar needed.
_ESC_SUFFIX = ".esc.txt"


def _decode_chunk_line(fname: str, line: str) -> str | None:
    """Decode one chunk-file line under the codec its FILENAME declares
    (see :data:`_ESC_SUFFIX`)."""
    if fname.endswith(_ESC_SUFFIX):
        return _decode_value(line)
    return line  # legacy raw codec: verbatim, no NULL marker


def _encode_value(v: str | None) -> str:
    """One VALUE per chunk-file line, losslessly: NULL becomes ``\\N``,
    and backslash / newline / carriage-return are backslash-escaped so
    a value can never split into extra lines or collide with the NULL
    marker (previously a NULL round-tripped as the 4-char string
    'None' and an embedded newline split one row into two)."""
    if v is None:
        return _NULL_TOKEN
    return (
        str(v)
        .replace("\\", "\\\\")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
    )


def _decode_value(s: str) -> str | None:
    """Exact inverse of :func:`_encode_value`."""
    if s == _NULL_TOKEN:
        return None
    if "\\" not in s:
        return s
    out: list[str] = []
    i = 0
    unescape = {"n": "\n", "r": "\r", "\\": "\\"}
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s) and s[i + 1] in unescape:
            out.append(unescape[s[i + 1]])
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _write_chunk_file(
    path: str, fname: str, rows
) -> tuple[int, int, str | None, str | None]:
    """The ONE chunk-file writer behind the batch writer, the stream
    writer, and delete_where's rewrite (previously three drifting
    copies): mode ``'x'`` (a name collision is a loud failure, never a
    silent clobber of a possibly-committed chunk), escaped values, and
    NULL-safe min/max stats (NULLs never update stats; a chunk without
    stats is simply never pruned, which is safe).  The value codec is
    chosen by the FILENAME (:data:`_ESC_SUFFIX`): every production
    writer passes ``*.esc.txt`` names; a legacy ``*.txt`` name gets the
    legacy raw codec so write and read stay symmetric per file.
    Returns ``(rows_written, file_bytes, vmin, vmax)``."""
    full = os.path.join(path, fname)
    escaped = fname.endswith(_ESC_SUFFIX)
    wrote = 0
    vmin = vmax = None
    with open(full, "x", encoding="utf-8") as fh:
        for row in rows:
            v = row[0]
            fh.write((_encode_value(v) if escaped else str(v)) + "\n")
            wrote += 1
            if v is not None:
                vmin = v if vmin is None or v < vmin else vmin
                vmax = v if vmax is None or v > vmax else vmax
    return wrote, os.path.getsize(full), vmin, vmax


class _ChunkPartition(InputPartition):
    def __init__(self, directory: str, filename: str):
        self.directory = directory
        self.filename = filename


class YamrReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.name = options.get("name", "data")
        # time travel: .option("version", N) pins a committed snapshot
        v = options.get("version")
        self.version = int(v) if v is not None else None
        self._pushed: list = []
        self._part_allow: set[str] | None = None

    def pushFilters(self, filters):
        """Partial pushdown for chunk pruning: remember the ``value``
        filters we can evaluate against per-chunk min/max stats, and
        ``part`` equality/IN filters that prune by filename directly
        (exact — ``part`` IS the chunk), but return EVERY filter for
        Spark to re-apply post-scan — pruning only decides which chunks
        to open, never which rows to emit."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            LessThan,
            LessThanOrEqual,
            StringStartsWith,
        )

        usable = (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
            StringStartsWith,
        )
        self._pushed = [
            f
            for f in filters
            if isinstance(f, usable)
            and tuple(f.attribute) == ("value",)
            and isinstance(f.value, str)
        ]
        for f in filters:
            if tuple(getattr(f, "attribute", ())) != ("part",):
                continue
            if isinstance(f, EqualTo) and isinstance(f.value, str):
                allowed = {f.value}
            elif isinstance(f, In) and all(isinstance(v, str) for v in f.value):
                allowed = set(f.value)
            else:
                continue
            self._part_allow = (
                allowed
                if self._part_allow is None
                else self._part_allow & allowed
            )
        return filters

    def _chunk_can_match(self, lo: str, hi: str) -> bool:
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
            StringStartsWith,
        )

        for f in self._pushed:
            v = f.value
            if isinstance(f, EqualTo) and (v < lo or v > hi):
                return False
            if isinstance(f, GreaterThan) and hi <= v:
                return False
            if isinstance(f, GreaterThanOrEqual) and hi < v:
                return False
            if isinstance(f, LessThan) and lo >= v:
                return False
            if isinstance(f, LessThanOrEqual) and lo > v:
                return False
            if isinstance(f, StringStartsWith):
                succ = _prefix_successor(v)
                if hi < v or (succ is not None and lo >= succ):
                    return False
        return True

    def partitions(self):
        try:
            entries = read_manifest(self.path, self.name, self.version)
        except FileNotFoundError:
            if self.version is not None:
                known = list_versions(self.path, self.name)
                raise FileNotFoundError(
                    f"yamr dataset '{self.name}' has no snapshot version "
                    f"{self.version}; available: {known}"
                ) from None
            raise
        stats = read_chunk_stats(self.path, self.name) if self._pushed else {}
        parts = []
        for fname, _ in entries:
            if self._part_allow is not None and fname not in self._part_allow:
                continue  # part filter names other chunks
            st = stats.get(fname)
            if st is not None and not self._chunk_can_match(*st):
                continue  # provably no matching row in this chunk
            parts.append(_ChunkPartition(self.path, fname))
        if not parts:
            # every chunk pruned: the Python DataSource API maps an
            # empty partition list to a single None partition, so hand
            # back an explicit empty sentinel instead
            parts.append(_ChunkPartition(self.path, None))
        return parts

    def read(self, partition: _ChunkPartition):
        if partition is None or partition.filename is None:
            return  # empty sentinel: all chunks pruned
        fname = partition.filename
        with open(
            os.path.join(partition.directory, fname), encoding="utf-8"
        ) as fh:
            for i, line in enumerate(fh):
                yield (fname, i, _decode_chunk_line(fname, line.rstrip("\n")))


class YamrReaderNoPushdown(YamrReader):
    """:class:`YamrReader` with chunk-stat pruning disabled, for
    sessions where ``spark.sql.python.filterPushdown.enabled`` is
    locked to false.  Spark 4.1 decides "this reader implements
    pushFilters" by ``__func__`` identity against the base class
    (``pyspark/sql/worker/plan_data_source_read.py:376``), so
    rebinding the attribute to the base implementation makes the
    probe see it as absent — the read then proceeds with Spark
    applying every filter post-scan, which is always correct (pruning
    only ever skips chunks, never rows).  Selected per-read via
    ``.option("pushdown", "false")``.

    VERSION NOTE: the ``__func__``-identity probe is a pyspark 4.1
    internal; an upgrade could change the probe and re-raise
    ``DATA_SOURCE_PUSHDOWN_DISABLED`` here.  The regression test
    ``tests/test_sources.py::test_yamr_pushdown_option_reads_under_locked_conf``
    is the tripwire — if it fails after a pyspark bump, restructure so
    pruning lives in a mixin and this class genuinely lacks the
    method."""

    pushFilters = DataSourceReader.pushFilters


class _PartCommit(WriterCommitMessage):
    def __init__(
        self,
        filename: str,
        filesize: int,
        vmin: str | None = None,
        vmax: str | None = None,
    ):
        self.filename = filename
        self.filesize = filesize
        self.vmin = vmin
        self.vmax = vmax


class YamrWriter(DataSourceWriter):
    """Batch writer.  ``append=True`` merges the prior manifest instead
    of replacing it: the previous entries are snapshotted driver-side at
    writer construction, this job's chunks are written under a fresh
    generation prefix (``<name>_part-gNNNNN-PPPPP.txt`` — never colliding
    with earlier generations or the base ``part-PPPPP`` files), and
    ``commit`` atomically rewrites the manifest as previous + new.  A
    failed append aborts without touching the manifest, so readers keep
    seeing the old dataset — the same two-phase guarantee as overwrite."""

    def __init__(self, options: dict, append: bool = False):
        self.path = options["path"]
        self.name = options.get("name", "data")
        self.append = append
        self.previous: list[tuple[str, int]] = []
        if append:
            try:
                self.previous = read_manifest(self.path, self.name)
            except FileNotFoundError:
                self.previous = []
        # Optimistic concurrency: remember the committed version this
        # job's plan is based on; commit() aborts if it moved (another
        # writer won) instead of silently last-write-winning — an
        # append would otherwise drop the concurrent writer's rows.
        self.base_version = (list_versions(self.path, self.name) or [0])[-1]
        # EVERY batch write — overwrite included — takes a fresh
        # generation prefix, discovered from the directory (not just the
        # live manifest): chunk files are immutable once written, which
        # is what keeps time-travel snapshots valid across overwrites.
        gen_pat = _re.compile(_re.escape(self.name) + r"_part-g(\d+)-")
        try:
            gens = [
                int(m.group(1))
                for fname in os.listdir(self.path)
                if (m := gen_pat.match(fname))
            ]
        except FileNotFoundError:
            gens = []
        self.generation = max(gens, default=0) + 1
        # Writer-unique token in every chunk filename: two writers
        # constructed before either commits observe the SAME directory
        # scan, so generation numbers alone can collide — the loser's
        # abort() would then delete chunk files the winner's committed
        # manifest references.  The token makes each writer's chunk
        # namespace disjoint; mode='x' below turns any residual
        # collision into a loud failure instead of a silent clobber.
        self.token = _uuid.uuid4().hex[:8]

    def write(self, iterator):
        from pyspark import TaskContext

        tc = TaskContext.get()
        # attempt number in the name: a retried/speculative attempt
        # writes its OWN file — the committed manifest references only
        # the winning attempt's; losers are unreachable chunks that
        # vacuum() collects
        fname = (
            f"{self.name}_part-g{self.generation:05d}-{self.token}"
            f"-{tc.partitionId():05d}-a{tc.attemptNumber()}{_ESC_SUFFIX}"
        )
        os.makedirs(self.path, exist_ok=True)
        _, size, vmin, vmax = _write_chunk_file(self.path, fname, iterator)
        return _PartCommit(fname, size, vmin, vmax)

    def commit(self, messages):
        # manifest written LAST, driver-side, via atomic rename (plus a
        # time-travel snapshot): readers can never observe a dataset
        # whose chunks aren't all on disk, nor a half-written manifest
        entries = self.previous + sorted(
            ((m.filename, m.filesize) for m in messages), key=lambda e: e[0]
        )
        _commit_manifest(
            self.path, self.name, entries, expected_version=self.base_version
        )
        _merge_chunk_stats(
            self.path,
            self.name,
            {
                m.filename: (m.vmin, m.vmax)
                for m in messages
                if m.vmin is not None
            },
        )

    def abort(self, messages):
        for m in messages:
            try:
                os.remove(os.path.join(self.path, m.filename))
            except OSError:
                pass


class NonAppendChangeError(RuntimeError):
    """The manifest changed non-append-only under a tailing stream
    reader (``delete_where`` removed entries mid-list, or a replayed
    stream batch's entries were no longer at the tail because a batch
    append interleaved).  A positional offset over the new list would
    silently skip unread chunks and re-read consumed ones — fail loudly
    instead (the Delta ``ignoreDeletes`` contract)."""


class YamrStreamReader(DataSourceStreamReader):
    """Structured-Streaming source tailing a manifest dataset.

    The offset is ``{"n": entries_consumed, "v": snapshot_version,
    "last": name_of_last_consumed_entry}`` — a prefix length made
    SELF-VALIDATING.  Append-only writers (batch append, stream commit
    of a new batch) keep the consumed prefix intact, so the common path
    is a pure slice.  But the prefix is NOT unconditionally stable:
    ``delete_where`` REMOVES touched entries mid-list, and a replayed
    stream batch whose entries were no longer at the tail shifts
    everything after them.  Each micro-batch therefore checks that the
    entry at position ``n-1`` of the planning snapshot still carries
    the recorded name; on mismatch it raises
    :class:`NonAppendChangeError` unless ``.option("ignoreDeletes",
    "true")`` is set, in which case it repositions exactly: the old
    consumed prefix is read back from snapshot ``v`` (time travel), and
    since every manifest rewrite preserves the relative order of
    carried entries and appends new ones, the survivors of the consumed
    prefix are precisely the longest leading run of current entries
    drawn from that old prefix.  Rows from rewrite chunks that carry
    surviving rows of consumed chunks ARE re-delivered under
    ``ignoreDeletes`` — inherent to copy-on-write deletes under a
    tailing reader (same caveat as Delta's option of the same name).

    Planning and replay both read the SNAPSHOT manifest of the offset's
    version, not the live file, so a replayed ``[start, end)`` range
    re-reads identical data even after later deletes — exactly-once
    downstream composes.  If retention vacuumed the needed snapshot,
    the reader falls back to the live manifest only when the recorded
    ``last`` name still validates; otherwise it fails rather than guess.
    Legacy checkpoint offsets (``{"n": k}`` with no ``last``) skip
    validation — same trust-the-writer behavior they were written under.

    Each micro-batch reads the chunk files in ``[start, end)`` with one
    input partition per chunk — the same parallelism as the batch
    reader.  Chunk files are immutable once listed.
    """

    def __init__(self, options: dict):
        self.path = options["path"]
        self.name = options.get("name", "data")
        self.ignore_deletes = (
            str(options.get("ignoreDeletes", "false")).lower() == "true"
        )

    def _snapshot(self, version: int) -> list[tuple[str, int]] | None:
        """Entries of snapshot ``version`` (None if vacuumed/absent)."""
        if version <= 0:
            return []
        try:
            return read_manifest(self.path, self.name, version)
        except (FileNotFoundError, ValueError):
            return None

    def initialOffset(self) -> dict:
        return {"n": 0, "v": 0, "last": None}

    def latestOffset(self) -> dict:
        # Observe the latest committed SNAPSHOT, not the live file: the
        # (version, entries) pair is then consistent by immutability
        # even if a writer replaces the live manifest mid-call.
        versions = list_versions(self.path, self.name)
        if not versions:
            return {"n": 0, "v": 0, "last": None}
        v = versions[-1]
        entries = self._snapshot(v)
        if entries is None:  # raced with vacuum retiring v: use live
            try:
                entries = read_manifest(self.path, self.name)
            except FileNotFoundError:
                entries = []
        return {
            "n": len(entries),
            "v": v,
            "last": entries[-1][0] if entries else None,
        }

    def _plan_entries(self, end: dict) -> list[tuple[str, int]]:
        entries = self._snapshot(int(end.get("v", 0)))
        if entries is not None and len(entries) >= end["n"]:
            return entries
        # snapshot vacuumed (or legacy offset with no version): the live
        # manifest is acceptable ONLY if the recorded tail name still
        # validates — otherwise this range is no longer replayable.
        try:
            live = read_manifest(self.path, self.name)
        except FileNotFoundError:
            live = []
        last = end.get("last")
        if end["n"] == 0 or last is None or (
            len(live) >= end["n"] and live[end["n"] - 1][0] == last
        ):
            return live
        raise NonAppendChangeError(
            f"yamr stream '{self.name}' at {self.path}: snapshot "
            f"v{end.get('v')} needed to replay this micro-batch was "
            "vacuumed and the live manifest no longer matches the "
            "recorded offset — increase vacuum retention (keep_versions) "
            "for datasets with active stream readers"
        )

    def partitions(self, start: dict, end: dict):
        entries = self._plan_entries(end)
        lo, hi = start["n"], end["n"]
        last = start.get("last")
        prefix_ok = (
            lo == 0
            or last is None  # legacy checkpoint offset: no validation
            or (len(entries) >= lo and entries[lo - 1][0] == last)
        )
        if not prefix_ok:
            if not self.ignore_deletes:
                raise NonAppendChangeError(
                    f"yamr stream '{self.name}' at {self.path}: manifest "
                    f"entries before the consumed offset (n={lo}, "
                    f"last={last!r}) were removed or reordered — "
                    "delete_where (or an interleaved stream-batch replay) "
                    "rewrote consumed history.  Set .option('ignoreDeletes',"
                    " 'true') to skip past it (rewrite chunks carrying "
                    "surviving rows of consumed chunks will be re-read)."
                )
            old = self._snapshot(int(start.get("v", 0)))
            if old is None:
                raise NonAppendChangeError(
                    f"yamr stream '{self.name}' at {self.path}: cannot "
                    f"reposition after a non-append change — snapshot "
                    f"v{start.get('v')} holding the consumed prefix was "
                    "vacuumed; increase vacuum retention (keep_versions) "
                    "for datasets with active stream readers"
                )
            consumed = {f for f, _ in old[:lo]}
            lo = 0
            while lo < len(entries) and entries[lo][0] in consumed:
                lo += 1
        return [
            _ChunkPartition(self.path, fname) for fname, _ in entries[lo:hi]
        ]

    def read(self, partition: _ChunkPartition):
        fname = partition.filename
        with open(
            os.path.join(partition.directory, fname), encoding="utf-8"
        ) as fh:
            for i, line in enumerate(fh):
                yield (fname, i, _decode_chunk_line(fname, line.rstrip("\n")))

    def commit(self, end: dict) -> None:
        pass  # no source-side cleanup: chunks stay readable for replay


class YamrStreamWriter(DataSourceStreamWriter):
    """Structured-Streaming sink for the manifest format.

    Exactly-once at the manifest level: chunk files carry the batch id
    in their name (``<name>_part-bNNNNN-PPPPP.txt``), and ``commit``
    rewrites the manifest as (previous entries minus this batch's
    prefix) + (this batch's commit messages).  A replayed batch
    therefore *replaces* its own entries instead of duplicating them,
    and readers — which only trust the manifest — never see uncommitted
    or doubled chunks.  Orphan chunk files from failed attempts are
    invisible garbage, collectable by listing against the manifest.
    """

    def __init__(self, options: dict):
        self.path = options["path"]
        self.name = options.get("name", "data")
        # run-unique token in every chunk filename, same rationale as
        # YamrWriter: chunk files are IMMUTABLE once a manifest
        # references them.  A replayed micro-batch (new writer instance
        # after a restart) or a speculative duplicate attempt must
        # write its OWN files — reopening the deterministic old name
        # with mode 'w' would truncate a chunk the live manifest (and
        # snapshots) still reference.  commit() replaces the batch's
        # entries by bNNNNN- prefix, so replays converge regardless of
        # token; losers are unreachable chunks vacuum() collects.
        self.token = _uuid.uuid4().hex[:8]

    def write(self, iterator):
        from pyspark import TaskContext

        tc = TaskContext.get()
        batch = int(tc.getLocalProperty("streaming.sql.batchId"))
        fname = (
            f"{self.name}_part-b{batch:05d}-{self.token}"
            f"-{tc.partitionId():05d}-a{tc.attemptNumber()}{_ESC_SUFFIX}"
        )
        os.makedirs(self.path, exist_ok=True)
        wrote, size, vmin, vmax = _write_chunk_file(self.path, fname, iterator)
        if wrote == 0:
            os.remove(os.path.join(self.path, fname))  # no chunk for
            return _PartCommit("", 0)  # an empty partition
        return _PartCommit(fname, size, vmin, vmax)

    def commit(self, messages, batchId: int) -> None:
        prefix = f"{self.name}_part-b{batchId:05d}-"
        base_version = (list_versions(self.path, self.name) or [0])[-1]
        try:
            previous = [
                e for e in read_manifest(self.path, self.name)
                if not e[0].startswith(prefix)
            ]
        except FileNotFoundError:
            previous = []
        # APPEND-ordered manifest: previous entries keep their order and
        # this batch's entries (sorted within the batch for determinism)
        # go at the END.  A global sort would insert entries mid-list —
        # e.g. before a batch-append's g-prefixed chunks, or at the
        # b99999->b100000 digit rollover — shifting every later entry
        # under a tailing YamrStreamReader whose offset is a manifest
        # PREFIX LENGTH: it would re-read shifted old entries and
        # permanently skip the new ones.
        entries = previous + sorted(
            (m.filename, m.filesize) for m in messages if m.filename
        )
        # every micro-batch commit is a snapshot version too: streaming
        # datasets get the same time-travel surface as batch ones;
        # expected_version pins the manifest read above — a concurrent
        # writer between read and commit aborts this micro-batch
        # (Structured Streaming retries it) rather than dropping rows
        _commit_manifest(
            self.path, self.name, entries, expected_version=base_version
        )
        _merge_chunk_stats(
            self.path,
            self.name,
            {
                m.filename: (m.vmin, m.vmax)
                for m in messages
                if m.filename and m.vmin is not None
            },
        )

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m.filename:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass


class YamrDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "yamr"

    def schema(self) -> str:
        return "part string, line_no bigint, value string"

    def reader(self, schema) -> YamrReader:
        if str(self.options.get("pushdown", "true")).lower() in (
            "false",
            "0",
            "no",
        ):
            return YamrReaderNoPushdown(self.options)
        return YamrReader(self.options)

    def writer(self, schema, overwrite: bool) -> YamrWriter:
        return YamrWriter(self.options, append=not overwrite)

    def streamWriter(self, schema, overwrite: bool) -> YamrStreamWriter:
        return YamrStreamWriter(self.options)

    def streamReader(self, schema) -> YamrStreamReader:
        return YamrStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the ``yamr`` format on a session.

    Also turns on ``spark.sql.python.filterPushdown.enabled``: Spark
    4.1 hard-errors (``DATA_SOURCE_PUSHDOWN_DISABLED``) when a Python
    ``DataSourceReader`` implements ``pushFilters`` while that conf is
    false, and :class:`YamrReader` implements it for chunk pruning.
    The conf is runtime-settable, so flipping it here makes the format
    usable from ANY session — not just ones built by
    ``session.build_session`` (which sets it at construction).  Sessions
    that lock the conf can still read by disabling pruning per-read with
    ``.option("pushdown", "false")``.
    """
    spark.dataSource.register(YamrDataSource)
    conf_key = "spark.sql.python.filterPushdown.enabled"
    try:
        already_on = spark.conf.get(conf_key, "false") == "true"
    except Exception:
        already_on = False
    if not already_on:
        from pyspark.errors import AnalysisException

        try:
            spark.conf.set(conf_key, "true")
            # session-wide by necessity (the conf has no per-read
            # scope) — say so, since it affects every Python
            # DataSource in the session, not just this format
            warnings.warn(
                f"yamr.register(): enabled {conf_key} session-wide "
                "(required for chunk-stats pushdown; affects all "
                "Python DataSources in this session)",
                stacklevel=2,
            )
        except AnalysisException:
            # conf locked down (CANNOT_MODIFY_CONFIG): per-read
            # .option("pushdown", "false") remains as the escape hatch
            pass
        except Exception as exc:  # noqa: BLE001
            # a forked/proxied session may reject conf mutation with a
            # different exception type; the escape hatch still applies,
            # but surface what happened instead of swallowing it
            warnings.warn(
                f"yamr.register(): could not enable {conf_key} "
                f"({type(exc).__name__}: {exc}); reads needing chunk "
                'pruning will fail — use .option("pushdown", "false")',
                stacklevel=2,
            )


def vacuum(
    path: str,
    name: str,
    keep_versions: int = 2,
    retention_seconds: float = 3600.0,
) -> dict:
    """Retire old snapshots and delete chunk files no longer reachable
    from any retained manifest (the Delta-VACUUM analog for this
    format).

    Keeps the live manifest plus the newest ``keep_versions`` snapshot
    manifests; every chunk referenced by ANY retained manifest
    survives, everything else under the dataset's chunk-name prefix is
    deleted.  Safe by construction: the live manifest is always
    retained, so current readers are never broken — only time travel
    beyond the retention window is given up.

    ``retention_seconds`` (Delta-style, default 1 h) additionally
    protects any chunk whose mtime is within the window: an in-flight
    write lands its chunk files BEFORE commit() publishes the manifest,
    so a freshly-written, not-yet-referenced chunk is indistinguishable
    from garbage by reachability alone — age is the tiebreaker.  Pass
    ``0`` only when no concurrent writer can exist.

    Stats-sidecar entries for removed chunks are dropped in the same
    pass so the sidecar can't grow without bound.

    Returns ``{"removed_snapshots": [...], "removed_chunks": [...]}``.
    """
    import time

    versions = list_versions(path, name)
    drop_versions = versions[:-keep_versions] if keep_versions > 0 else versions
    keep = versions[len(drop_versions):]

    reachable: set[str] = set()
    for v in [None, *keep]:
        try:
            reachable.update(f for f, _ in read_manifest(path, name, v))
        except FileNotFoundError:
            continue

    removed_snapshots = []
    for v in drop_versions:
        try:
            os.remove(_manifest_path(path, name, v))
            removed_snapshots.append(v)
        except OSError:
            pass

    chunk_pat = _re.compile(_re.escape(name) + r"_part-.*\.txt$")
    cutoff = time.time() - retention_seconds
    removed_chunks = []
    for fname in sorted(os.listdir(path)):
        if chunk_pat.match(fname) and fname not in reachable:
            full = os.path.join(path, fname)
            try:
                if os.path.getmtime(full) > cutoff:
                    continue  # young orphan: likely an in-flight write
                os.remove(full)
                removed_chunks.append(fname)
            except OSError:
                pass
    if removed_chunks:
        stats = read_chunk_stats(path, name)
        if any(f in stats for f in removed_chunks):
            for f in removed_chunks:
                stats.pop(f, None)
            _rewrite_chunk_stats(path, name, stats)
    return {"removed_snapshots": removed_snapshots, "removed_chunks": removed_chunks}


def delete_where(spark, path: str, name: str, predicate: str) -> dict:
    """Chunk-pruned copy-on-write row deletion: rewrite ONLY the chunks
    that contain rows matching ``predicate`` (a SQL boolean over
    ``part``, ``line_no``, ``value``); untouched chunks are carried
    over in the new manifest by reference.  Commits as a new snapshot
    version with optimistic concurrency (a concurrent writer aborts
    this delete, not vice versa).

    The old chunks stay on disk — time travel to pre-delete versions
    keeps working until :func:`vacuum` retires them — and the manifest
    lands in one atomic commit, so a failed delete leaves the live
    dataset exactly as it was.  Returns ``{"deleted": n, "remaining":
    m, "rewritten_chunks": r, "carried_chunks": c}``.

    Scale shape: the match scan benefits from min/max chunk pruning
    when the predicate is pushable (value =/range/prefix), the rewrite
    scan opens only the matching chunks (``part`` filename pushdown),
    and carried chunks cost one manifest row each — a selective delete
    on a 100 TB dataset rewrites only the affected fraction.
    """
    from pyspark.sql import functions as _F

    base_version = (list_versions(path, name) or [0])[-1]
    reader = lambda: (  # noqa: E731
        spark.read.format("yamr").option("path", path).option("name", name).load()
    )
    # total rows, deleted rows, and touched chunks from ONE per-part
    # aggregate scan (chunk-count-bounded collect) — previously three
    # jobs, one of which (the bare total count) read the full dataset
    # anyway, defeating the pruned shape it paid for elsewhere
    per_part = (
        reader()
        .groupBy("part")
        .agg(
            _F.count(_F.lit(1)).alias("n"),
            _F.sum(
                _F.expr(
                    f"CASE WHEN coalesce(({predicate}), false) THEN 1 ELSE 0 END"
                )
            ).alias("matched"),
        )
        .collect()
    )
    total = int(sum(r["n"] for r in per_part))
    deleted = int(sum(r["matched"] for r in per_part))
    touched = sorted(r["part"] for r in per_part if r["matched"])
    if not touched:
        # no-op delete still commits a (carried-only) version: every
        # delete is an auditable point in the snapshot history, Delta-
        # style, and "one version per operation" stays property-testable
        carried = read_manifest(path, name)
        _commit_manifest(path, name, carried, expected_version=base_version)
        return {
            "deleted": 0,
            "remaining": total,
            "rewritten_chunks": 0,
            "carried_chunks": len(carried),
        }

    surviving = (
        reader()
        .where(_F.col("part").isin(touched))  # filename-level pruning
        # DELETE semantics: only predicate=TRUE rows are removed, so a
        # NULL-evaluating row SURVIVES — plain NOT(pred) would drop it
        # from both sides (matches neither pred nor NOT pred) while the
        # returned counts claim it remains
        .where(f"NOT coalesce(({predicate}), false)")
        .select("value")
    )
    # manual chunk write (same layout as YamrWriter) so the carried +
    # rewritten entry list can land in ONE atomic manifest commit
    gen_pat = _re.compile(_re.escape(name) + r"_part-g(\d+)-")
    gens = [
        int(m.group(1)) for f in os.listdir(path) if (m := gen_pat.match(f))
    ]
    generation = max(gens, default=0) + 1
    token = _uuid.uuid4().hex[:8]  # same cross-writer namespace
    # isolation as YamrWriter

    def _write_chunk(pid: int, rows):
        from pyspark import TaskContext

        # attempt number in the name, mirroring YamrWriter.write: a
        # retried/speculative attempt writes its OWN file instead of
        # colliding (mode='x') with its failed predecessor's partial
        # chunk; unreferenced loser chunks are vacuum-collectable
        tc = TaskContext.get()
        att = tc.attemptNumber() if tc is not None else 0
        fname = (
            f"{name}_part-g{generation:05d}-{token}-{pid:05d}-a{att}{_ESC_SUFFIX}"
        )
        wrote, size, vmin, vmax = _write_chunk_file(path, fname, rows)
        if wrote == 0:
            os.remove(os.path.join(path, fname))
            return iter(())
        return iter([(fname, size, vmin, vmax)])

    new_chunks = surviving.rdd.mapPartitionsWithIndex(_write_chunk).collect()
    carried = [
        e for e in read_manifest(path, name) if e[0] not in set(touched)
    ]
    # carried entries keep their manifest order, rewrites append — a
    # global sort would reorder the list under a tailing stream reader
    # whose offset is a manifest prefix length
    entries = carried + sorted(
        (fname, fsize) for fname, fsize, _, _ in new_chunks
    )
    try:
        _commit_manifest(path, name, entries, expected_version=base_version)
    except ManifestConflictError:
        for fname, _, _, _ in new_chunks:  # abort: new chunks are garbage
            try:
                os.remove(os.path.join(path, fname))
            except OSError:
                pass
        raise
    _merge_chunk_stats(
        path,
        name,
        {
            fname: (vmin, vmax)
            for fname, _, vmin, vmax in new_chunks
            if vmin is not None
        },
    )
    return {
        "deleted": deleted,
        "remaining": total - deleted,
        "rewritten_chunks": len(touched),
        "carried_chunks": len(carried),
    }
