"""Python Data Source (Spark 4 extension point) for kv-record logs.

The reference's EOS reader ingests ``k=v&k=v&…`` record lines squashed
into one string per row (spark_utils.py:552-566) and splits them in
per-row Python downstream. ``parse_kv_record`` already handles that as
a Catalyst expression over a text scan; this module goes one step
further and makes the format a first-class *source*: a
``pyspark.sql.datasource.DataSource`` that presents kv logs as a typed
table with projected columns, one input partition per file.

Why a Python DataSource and not just text+parse? The connector shape:
schema negotiation happens at the source (``.schema()`` or
user-supplied), partition planning is explicit (``partitions()`` — one
per file, so a directory of daily logs scans in parallel), and the
reader emits tuples batched per partition — the same contract a
production connector (JDBC, queue, object store listing) implements.
Registered per-session with ``spark.dataSource.register(KVLogDataSource)``
then ``spark.read.format("kvlog").option("path", ...).load()``.

Reader code runs ON EXECUTORS: everything here pickles by value (file
lists and column names only — no engine imports inside ``read``).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class KVLogReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self._cols = [f.name for f in schema.fields]
        self._pair_sep = options.get("pair_sep", "&")
        self._kv_sep = options.get("kv_sep", "=")
        import glob

        pattern = options.get("path")
        if not pattern:
            raise ValueError("kvlog source requires option 'path'")
        self._files = sorted(glob.glob(pattern))

    def partitions(self):
        # One partition per file: a directory of daily logs scans with
        # file-level parallelism, the natural split for line formats.
        return [_FilePartition(p) for p in self._files]

    def read(self, partition: _FilePartition):
        cols, psep, ksep = self._cols, self._pair_sep, self._kv_sep
        with open(partition.path, "r", encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                rec = {}
                for pair in line.split(psep):
                    k, sep, v = pair.partition(ksep)
                    if sep:
                        rec[k] = v
                yield tuple(rec.get(c) for c in cols)


class KVLogDataSource(DataSource):
    """``spark.read.format("kvlog")``: kv-record lines as a typed table.

    Columns come from the user schema when given, else from the
    option ``columns`` (comma-separated projection); values are
    strings — cast downstream (the reference does the same with its
    EOS fields)."""

    @classmethod
    def name(cls) -> str:
        return "kvlog"

    def schema(self):
        cols = self.options.get("columns", "path,rb,wb,ts")
        return StructType(
            [StructField(c.strip(), StringType(), True) for c in cols.split(",")]
        )

    def reader(self, schema: StructType) -> KVLogReader:
        return KVLogReader(schema, dict(self.options))

    def simpleStreamReader(self, schema: StructType) -> "KVLogStreamReader":
        return KVLogStreamReader(schema, dict(self.options))


class KVLogStreamReader(SimpleDataSourceStreamReader):
    """Streaming side of the kvlog source: the sorted file list IS the
    offset log. An offset is ``{"idx": n}`` — files[0:n] are committed;
    each micro-batch reads every file that appeared past ``idx``
    (append-only directories with monotonically-sorting names, the
    daily-log layout). ``readBetweenOffsets`` replays a committed range
    exactly, which is what gives the source end-to-end exactly-once on
    restart: offsets name files, files are immutable."""

    def __init__(self, schema: StructType, options: dict):
        self._cols = [f.name for f in schema.fields]
        self._pair_sep = options.get("pair_sep", "&")
        self._kv_sep = options.get("kv_sep", "=")
        self._pattern = options.get("path")
        if not self._pattern:
            raise ValueError("kvlog source requires option 'path'")

    def _files(self) -> list:
        import glob

        return sorted(glob.glob(self._pattern))

    def _rows(self, files):
        cols, psep, ksep = self._cols, self._pair_sep, self._kv_sep
        for path in files:
            with open(path, "r", encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    rec = {}
                    for pair in line.split(psep):
                        k, sep, v = pair.partition(ksep)
                        if sep:
                            rec[k] = v
                    yield tuple(rec.get(c) for c in cols)

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def read(self, start: dict):
        # Lists, not generators: the simple-reader contract prefetches
        # the batch through the driver and pickles it to executors —
        # the documented tradeoff of SimpleDataSourceStreamReader
        # (bounded by the per-batch file arrivals here).
        files = self._files()
        return (
            list(self._rows(files[start["idx"]:])),
            {"idx": len(files)},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        return list(self._rows(self._files()[start["idx"]: end["idx"]]))


# ---------------------------------------------------------------------------
# Kafka-shaped partitioned offset log ("partlog")
# ---------------------------------------------------------------------------


def _partlog_scan(root: str) -> list:
    """Sorted (partition_name, [segment files]) under a partlog root.
    Layout mirrors a Kafka topic on disk: one subdirectory per
    partition, each holding append-only immutable SEGMENT files whose
    sorted names give record order; a partition's offset is its
    record index across segments."""
    import os

    out = []
    if not os.path.isdir(root):
        return out
    for p in sorted(os.listdir(root)):
        pdir = os.path.join(root, p)
        if not os.path.isdir(pdir) or p.startswith(("_", ".")):
            continue
        segs = sorted(
            os.path.join(pdir, s)
            for s in os.listdir(pdir)
            if not s.startswith(("_", "."))
        )
        out.append((p, segs))
    return out


def _partlog_records(segs: list) -> list:
    rows = []
    for path in segs:
        with open(path, "r", encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if line:
                    rows.append(line)
    return rows


class _PartDirPartition(InputPartition):
    def __init__(self, name: str, segs: list):
        self.name = name
        self.segs = segs


class PartLogReader(DataSourceReader):
    def __init__(self, options: dict):
        self._root = options.get("path")
        if not self._root:
            raise ValueError("partlog source requires option 'path'")

    def partitions(self):
        return [
            _PartDirPartition(p, segs)
            for p, segs in _partlog_scan(self._root)
        ]

    def read(self, partition: _PartDirPartition):
        for off, value in enumerate(_partlog_records(partition.segs)):
            yield (partition.name, off, value)


class PartLogDataSource(DataSource):
    """``format("partlog")``: a Kafka-shaped source over a directory of
    partition subdirs with append-only segment files. Surface matches
    the Kafka connector's essentials — ``(partition, offset, value)``
    with per-partition MONOTONE offsets — so a pipeline written
    against it ports to a real broker by swapping the format string.
    Batch reads scan one input partition per log partition; the
    streaming side tracks per-partition offsets in the checkpoint
    (see :class:`PartLogStreamReader`). Values are opaque strings —
    parse downstream (``parse_kv_record``, ``from_json``)."""

    @classmethod
    def name(cls) -> str:
        return "partlog"

    def schema(self):
        return StructType(
            [
                StructField("partition", StringType(), False),
                StructField("offset", LongType(), False),
                StructField("value", StringType(), True),
            ]
        )

    def reader(self, schema: StructType) -> PartLogReader:
        return PartLogReader(dict(self.options))

    def simpleStreamReader(self, schema: StructType) -> "PartLogStreamReader":
        return PartLogStreamReader(dict(self.options))


class PartLogStreamReader(SimpleDataSourceStreamReader):
    """Streaming partlog: the offset is ``{"parts": {partition:
    consumed_record_count}}`` — per-partition and monotone, exactly
    Kafka's offset model. Each micro-batch reads every partition's
    records past its committed offset; a partition directory that
    APPEARS mid-stream (rebalance / topic growth) is picked up from
    offset 0 on the next batch, and one that disappears keeps its
    committed offset in the log (monotonicity is never violated by a
    listing hiccup). ``readBetweenOffsets`` replays a committed
    [start, end) range record-exactly — segments are immutable and
    append-only, so offsets name records forever; that replay is what
    makes a checkpoint restart exactly-once end to end."""

    def __init__(self, options: dict):
        self._root = options.get("path")
        if not self._root:
            raise ValueError("partlog source requires option 'path'")
        # per-segment record counts keyed by PATH holding (size,
        # count): segments are immutable, so a consumed segment is
        # never re-parsed — each micro-batch stats the old segments
        # and reads only the tail, keeping per-batch cost O(new
        # records), not O(total log). One entry per segment (a grown
        # file replaces its entry), so the cache is O(segments), not
        # O(batches)
        self._seg_counts: dict = {}

    def _seg_count(self, path: str) -> int:
        import os

        size = os.path.getsize(path)
        cached = self._seg_counts.get(path)
        if cached is not None and cached[0] == size:
            return cached[1]
        with open(path, "r", encoding="utf-8") as fh:
            n = sum(1 for line in fh if line.rstrip("\n"))
        self._seg_counts[path] = (size, n)
        return n

    def _part_rows_from(self, segs: list, lo: int, hi=None) -> list:
        """Records [lo, hi) of one partition, skipping whole segments
        below ``lo`` via the cached counts."""
        rows = []
        base = 0
        for path in segs:
            n = self._seg_count(path)
            seg_end = base + n
            if seg_end > lo and (hi is None or base < hi):
                for i, rec in enumerate(_partlog_records([path])):
                    off = base + i
                    if off >= lo and (hi is None or off < hi):
                        rows.append((off, rec))
            base = seg_end
        return rows

    def initialOffset(self) -> dict:
        return {"parts": {}}

    def read(self, start: dict):
        committed = dict(start.get("parts", {}))
        rows = []
        end = dict(committed)
        for p, segs in _partlog_scan(self._root):
            lo = int(committed.get(p, 0))
            got = self._part_rows_from(segs, lo)
            rows.extend((p, off, rec) for off, rec in got)
            total = got[-1][0] + 1 if got else sum(
                self._seg_count(s) for s in segs
            )
            end[p] = max(lo, total)
        # the runner peeks the prefetched batch with next() — hand it a
        # real iterator, not a list
        return iter(rows), {"parts": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        s = start.get("parts", {})
        e = end.get("parts", {})
        by_part = dict(_partlog_scan(self._root))
        rows = []
        for p in sorted(e):
            lo, hi = int(s.get(p, 0)), int(e[p])
            got = self._part_rows_from(by_part.get(p, []), lo, hi)
            if len(got) < hi - lo:
                # committed records must replay EXACTLY — a shrunken
                # or deleted segment is data loss, never a short batch
                raise ValueError(
                    f"partlog partition {p!r} holds only {lo + len(got)} "
                    f"records but offset {hi} was committed — segments "
                    "were deleted or truncated; cannot replay"
                )
            rows.extend((p, off, rec) for off, rec in got)
        return iter(rows)
