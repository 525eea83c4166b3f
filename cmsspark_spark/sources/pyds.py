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
from pyspark.sql.types import StringType, StructField, StructType


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
