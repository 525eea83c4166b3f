"""Pure-Python Avro Object Container File codec + Spark reader.

The reference's most-used source format is Avro: every Rucio job reads
daily Avro dumps (rucio_datasets_stats.py:152-175,240-242,
rucio_daily.py:37-38, rucio_ds_summary.py:70-117 — via
``spark.read.format("avro")``). This container has neither the
spark-avro module jar nor a Python avro package, so the fallback path
here implements the *public* Avro 1.11 specification
(container file: magic ``Obj\\x01``, metadata map, 16-byte sync marker,
framed blocks; binary encoding: zigzag-varint longs, length-prefixed
strings/bytes, little-endian IEEE floats) from scratch.

Scale design: files are listed and decoded CLUSTER-SIDE via Spark's
``binaryFile`` source + Arrow ``mapInPandas`` — one task per file
group (binaryFile packs small files per ``maxPartitionBytes``), so a
day's worth of Rucio dumps decodes with full input parallelism and no
driver materialization. When the real spark-avro jar is present,
``read_source`` uses it instead (native, block-splittable); this
module is the jar-less fallback and the test-side writer.

Supported schema surface: all primitives, record / array / map /
enum / fixed / union. Logical types (Avro 1.11 §Logical Types) are
FIRST-CLASS for the ones Spark has native types for — ``decimal``
(bytes/fixed → DecimalType, two's-complement big-endian unscaled),
``timestamp-millis``/``timestamp-micros`` (long → TimestampType,
UTC), ``date`` (int → DateType), ``uuid`` (string passthrough) —
matching spark-avro's mapping, so Rucio-style timestamped dumps
(rucio_daily.py:49-54) read with real temporal/decimal columns.
Unrecognized logical types decode as their underlying type.
Codecs: ``null`` and ``deflate``.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any, Callable, Iterator

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# binary decoder (Avro spec "Binary Encoding")
# ---------------------------------------------------------------------------


def _read_long(buf: io.BytesIO) -> int:
    """Zigzag varint decode."""
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    return buf.read(n)


#: epoch anchors for the temporal logical types (UTC per the spec)
_EPOCH_TS = None  # lazily built to keep module import light
_EPOCH_DATE = None


def _epochs():
    global _EPOCH_TS, _EPOCH_DATE
    if _EPOCH_TS is None:
        import datetime as _dt

        _EPOCH_TS = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
        _EPOCH_DATE = _dt.date(1970, 1, 1)
    return _EPOCH_TS, _EPOCH_DATE


def _apply_logical(schema: dict, value: Any) -> Any:
    """Underlying decoded value → first-class logical value (decimal /
    timestamp / date); unknown annotations pass through untouched."""
    lt = schema.get("logicalType")
    if lt is None or value is None:
        return value
    if lt == "decimal":
        import decimal

        unscaled = int.from_bytes(value, "big", signed=True)
        return decimal.Decimal(unscaled).scaleb(-int(schema.get("scale", 0)))
    if lt in ("timestamp-micros", "timestamp-millis"):
        import datetime as _dt

        epoch_ts, _ = _epochs()
        mult = 1 if lt.endswith("micros") else 1000
        return epoch_ts + _dt.timedelta(microseconds=value * mult)
    if lt in ("local-timestamp-micros", "local-timestamp-millis"):
        # no-timezone wall-clock (Avro 1.10) → naive datetime, which
        # Spark stores as TimestampNTZType — never shifted by the
        # session zone, matching spark-avro's mapping
        import datetime as _dt

        mult = 1 if lt.endswith("micros") else 1000
        return _dt.datetime(1970, 1, 1) + _dt.timedelta(
            microseconds=value * mult
        )
    if lt == "date":
        import datetime as _dt

        _, epoch_d = _epochs()
        return epoch_d + _dt.timedelta(days=value)
    return value  # uuid (already a string) and unrecognized annotations


def _logical_to_underlying(schema: dict, value: Any) -> Any:
    """Writer-side inverse of _apply_logical (fixture/sink path)."""
    lt = schema.get("logicalType")
    if lt is None or value is None:
        return value
    if lt == "decimal":
        import decimal

        scale = int(schema.get("scale", 0))
        unscaled = int(
            decimal.Decimal(value).scaleb(scale).to_integral_value()
        )
        n = max(1, (unscaled.bit_length() + 8) // 8)
        if schema.get("type") == "fixed":
            n = int(schema["size"])
        return unscaled.to_bytes(n, "big", signed=True)
    if lt in ("timestamp-micros", "timestamp-millis"):
        import datetime as _dt

        epoch_ts, _ = _epochs()
        if value.tzinfo is None:
            value = value.replace(tzinfo=_dt.timezone.utc)
        d = value - epoch_ts
        micros = (d.days * 86400 + d.seconds) * 1_000_000 + d.microseconds
        return micros if lt.endswith("micros") else micros // 1000
    if lt in ("local-timestamp-micros", "local-timestamp-millis"):
        import datetime as _dt

        d = value.replace(tzinfo=None) - _dt.datetime(1970, 1, 1)
        micros = (d.days * 86400 + d.seconds) * 1_000_000 + d.microseconds
        return micros if lt.endswith("micros") else micros // 1000
    if lt == "date":
        _, epoch_d = _epochs()
        return (value - epoch_d).days
    return value


def _decode(buf: io.BytesIO, schema: Any, names: dict[str, Any]) -> Any:
    """Decode one value of ``schema`` (parsed JSON) from ``buf``."""
    if isinstance(schema, str):
        t = schema
        if t in names:  # named-type reference
            return _decode(buf, names[t], names)
        if t == "null":
            return None
        if t == "boolean":
            return buf.read(1) == b"\x01"
        if t in ("int", "long"):
            return _read_long(buf)
        if t == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if t == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if t == "bytes":
            return _read_bytes(buf)
        if t == "string":
            return _read_bytes(buf).decode("utf-8")
        raise ValueError(f"unknown avro type {t!r}")
    if isinstance(schema, list):  # union: long branch index, then value
        idx = _read_long(buf)
        return _decode(buf, schema[idx], names)
    t = schema["type"]
    if t == "record":
        name = schema.get("name")
        if name:
            names[name] = schema
        return {
            f["name"]: _decode(buf, f["type"], names) for f in schema["fields"]
        }
    if t == "enum":
        if schema.get("name"):
            names[schema["name"]] = schema
        return schema["symbols"][_read_long(buf)]
    if t == "fixed":
        if schema.get("name"):
            names[schema["name"]] = schema
        return _apply_logical(schema, buf.read(schema["size"]))
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix
                n = -n
                _read_long(buf)
            for _ in range(n):
                out.append(_decode(buf, schema["items"], names))
        return out
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(buf, schema["values"], names)
        return out
    # {"type": "long", ...} wrapper: decode the underlying type, then
    # lift any logical-type annotation to its first-class value
    return _apply_logical(schema, _decode(buf, t, names))


def read_container(blob: bytes) -> tuple[dict | str | list, list[dict]]:
    """Decode a whole Avro object container file → (schema, records)."""
    buf = io.BytesIO(blob)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            _read_long(buf)
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    sync = buf.read(16)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    records: list[dict] = []
    names: dict[str, Any] = {}
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = _read_long(buf)
        size = _read_long(buf)
        payload = buf.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        block = io.BytesIO(payload)
        for _ in range(count):
            records.append(_decode(block, schema, names))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block framing)")
    return schema, records


# ---------------------------------------------------------------------------
# binary encoder + container writer (test fixtures / utility sink)
# ---------------------------------------------------------------------------


def _write_long(out: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            break


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


def _encode(out: io.BytesIO, schema: Any, value: Any, names: dict[str, Any]) -> None:
    if isinstance(schema, str):
        t = schema
        if t in names:
            return _encode(out, names[t], value, names)
        if t == "null":
            return
        if t == "boolean":
            out.write(b"\x01" if value else b"\x00")
        elif t in ("int", "long"):
            _write_long(out, int(value))
        elif t == "float":
            out.write(struct.pack("<f", float(value)))
        elif t == "double":
            out.write(struct.pack("<d", float(value)))
        elif t == "bytes":
            _write_bytes(out, bytes(value))
        elif t == "string":
            _write_bytes(out, str(value).encode("utf-8"))
        else:
            raise ValueError(f"unknown avro type {t!r}")
        return
    if isinstance(schema, list):  # union: first matching branch
        for idx, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch.get("type")
            if value is None and branch == "null":
                _write_long(out, idx)
                return
            if value is not None and branch != "null":
                _write_long(out, idx)
                _encode(out, branch, value, names)
                return
        raise ValueError(f"no union branch for {value!r} in {schema!r}")
    t = schema["type"]
    if schema.get("logicalType") is not None:
        value = _logical_to_underlying(schema, value)
    if t == "record":
        if schema.get("name"):
            names[schema["name"]] = schema
        for f in schema["fields"]:
            _encode(out, f["type"], value.get(f["name"]), names)
    elif t == "enum":
        _write_long(out, schema["symbols"].index(value))
    elif t == "fixed":
        out.write(bytes(value))
    elif t == "array":
        if value:
            _write_long(out, len(value))
            for v in value:
                _encode(out, schema["items"], v, names)
        _write_long(out, 0)
    elif t == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                _write_bytes(out, str(k).encode("utf-8"))
                _encode(out, schema["values"], v, names)
        _write_long(out, 0)
    else:
        _encode(out, t, value, names)


def write_container(
    path: str,
    schema: dict | str | list,
    records: list[dict],
    codec: str = "null",
    records_per_block: int = 4096,
) -> None:
    """Write an Avro object container file (spec-conformant; readable
    by any Avro implementation)."""
    import hashlib

    schema_json = json.dumps(schema)
    sync = hashlib.md5(schema_json.encode()).digest()  # deterministic 16B
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    _write_long(out, 0)
    out.write(sync)
    names: dict[str, Any] = {}
    for lo in range(0, len(records), records_per_block):
        chunk = records[lo : lo + records_per_block]
        block = io.BytesIO()
        for r in chunk:
            _encode(block, schema, r, names)
        payload = block.getvalue()
        if codec == "deflate":
            payload = zlib.compress(payload)[2:-4]  # raw deflate, no header
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        _write_long(out, len(chunk))
        _write_long(out, len(payload))
        out.write(payload)
        out.write(sync)
    with open(path, "wb") as fh:
        fh.write(out.getvalue())


# ---------------------------------------------------------------------------
# Avro schema → Spark StructType
# ---------------------------------------------------------------------------


def spark_type_of(schema: Any):
    """Map an Avro schema to a Spark DataType (same mapping spark-avro
    uses for the types this codec supports)."""
    from pyspark.sql import types as T

    if isinstance(schema, str):
        return {
            "boolean": T.BooleanType(),
            "int": T.IntegerType(),
            "long": T.LongType(),
            "float": T.FloatType(),
            "double": T.DoubleType(),
            "bytes": T.BinaryType(),
            "string": T.StringType(),
        }[schema]
    if isinstance(schema, list):  # union: nullable non-null branch
        non_null = [b for b in schema if b != "null"]
        if len(non_null) != 1:
            raise ValueError(f"general unions unsupported: {schema!r}")
        return spark_type_of(non_null[0])
    lt = schema.get("logicalType")
    if lt == "decimal":
        return T.DecimalType(
            int(schema["precision"]), int(schema.get("scale", 0))
        )
    if lt in ("timestamp-micros", "timestamp-millis"):
        return T.TimestampType()
    if lt in ("local-timestamp-micros", "local-timestamp-millis"):
        return T.TimestampNTZType()
    if lt == "date":
        return T.DateType()
    t = schema["type"]
    if t == "record":
        return T.StructType(
            [
                T.StructField(f["name"], spark_type_of(f["type"]), True)
                for f in schema["fields"]
            ]
        )
    if t == "array":
        return T.ArrayType(spark_type_of(schema["items"]), True)
    if t == "map":
        return T.MapType(T.StringType(), spark_type_of(schema["values"]), True)
    if t == "enum":
        return T.StringType()
    if t == "fixed":
        return T.BinaryType()
    return spark_type_of(t)


# ---------------------------------------------------------------------------
# Spark reader: binaryFile listing + distributed mapInPandas decode
# ---------------------------------------------------------------------------


def read_avro(spark, paths: list[str] | str, schema=None, with_path=False):
    """Read Avro container files as a DataFrame without spark-avro.

    ``binaryFile`` does the (distributed, glob-aware) listing; each
    task decodes its files with this module's pure-Python codec inside
    an Arrow ``mapInPandas``. ``schema`` (StructType) projects the
    declared top-level fields; when None, the writer schema is peeked
    from one file driver-side (declare the schema for production —
    peeking reads a header but costs one extra open).

    ``with_path=True`` appends a ``_source_file`` string column — the
    ``input_file_name()`` provenance the reference derives its
    tally-date from (rucio_daily.py:39-48); binaryFile's ``path``
    column carries it through the decode.

    The module is registered for BY-VALUE cloudpickle so executors
    never need ``cmsspark_spark`` importable (the round-1 closure bug
    class).
    """
    import pandas as pd  # noqa: F401  (mapInPandas contract)

    from pyspark import cloudpickle
    from pyspark.sql import types as T

    import cmsspark_spark.sources.avro_io as _self

    cloudpickle.register_pickle_by_value(_self)

    if schema is None:
        schema = _peek_schema(spark, paths)
    cols = [f.name for f in schema.fields]

    binary = spark.read.format("binaryFile")
    if isinstance(paths, str):
        paths = [paths]
    files = binary.load(paths).select("path", "content")

    out_cols = cols + (["_source_file"] if with_path else [])
    out_schema = (
        schema if not with_path
        else T.StructType(
            list(schema.fields)
            + [T.StructField("_source_file", T.StringType())]
        )
    )

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            for path, blob in zip(pdf["path"], pdf["content"]):
                _, records = read_container(bytes(blob))
                data = {c: [r.get(c) for r in records] for c in cols}
                if with_path:
                    data["_source_file"] = [path] * len(records)
                yield pd.DataFrame(data, columns=out_cols)

    return files.mapInPandas(decode, schema=out_schema)


def _peek_schema(spark, paths: list[str] | str):
    """Driver-side header peek of ONE matching file for schema
    inference (local-fs globs; at production scale pass an explicit
    schema instead)."""
    import glob as g

    if isinstance(paths, str):
        paths = [paths]
    for p in paths:
        for f in sorted(g.glob(p)):
            with open(f, "rb") as fh:
                blob = fh.read()
            avro_schema, _ = read_container(blob)
            return spark_type_of(avro_schema)
    raise FileNotFoundError(f"no avro files match {paths!r}")
