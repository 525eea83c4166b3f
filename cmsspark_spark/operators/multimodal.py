"""Multimodal column plumbing (SURVEY §7.2 M8).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata alongside. The Spark-side plumbing — schema, Arrow batching,
``mapInPandas`` signatures, partition sizing — is real and tested; the
actual media decode is stubbed (decode libraries are not in this
container) behind ``register_decoder``/``FakeDecoder``.

Scale notes: media rows are large — ``repartition`` by a size-balanced
key before the UDF so Arrow batches stay bounded; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` small for multi-MB
payloads.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Output schema of feature extraction: stable contract for downstream.
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
        StructField("feature", StringType()),
    ]
)


class FakeDecoder:
    """Deterministic stand-in for a real media decoder.

    Real decoders (PIL/ffmpeg/torchaudio) are not installed here; this
    produces a deterministic 'feature' from the raw bytes so the full
    Arrow/mapInPandas pipeline is exercised and oracle-testable.
    """

    def __call__(self, payload: bytes) -> str:
        if payload is None:
            return ""
        # md5-derived head/tail + length: deterministic, content-
        # sensitive, and byte-exact to express in ANSI SQL regardless of
        # text encoding (first/last RAW BYTE is not — DuckDB's ascii()
        # yields code points, diverging on non-ASCII).
        import hashlib

        h = hashlib.md5(payload).hexdigest()
        return f"{h[:2]}{h[-2:]}{len(payload):08x}"


def real_decoder(payload: bytes) -> str:  # pragma: no cover - container lacks libs
    """Placeholder for a real decode (image resize / audio resample /
    video frame-sample). Plug in when media libs are available."""
    raise NotImplementedError(
        "media decode libraries are not available in this container; "
        "use FakeDecoder for plumbing tests"
    )


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo helper: materialize an opaque binary column from text (the
    test corpus has no real media); real pipelines read binary parquet
    columns directly."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_type", F.lit("text/plain")
    )


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    media_type_col: str = "media_type",
    decoder: Callable[[bytes], str] | None = None,
    max_parallelism: int | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` keeps the decode vectorized per Arrow batch; md5
    checksum and byte length are computed pandas-side on the raw bytes.
    The output schema is fixed (``FEATURE_SCHEMA``) so downstream plans
    are stable regardless of decoder.

    The default decoder is a *locally defined* function so cloudpickle
    serializes it by value: executors never need ``cmsspark_spark``
    importable (no addPyFile/--py-files requirement). A custom
    ``decoder`` must itself be importable on executors or by-value
    picklable.
    """
    import hashlib

    if decoder is None:
        def decoder(payload: bytes) -> str:
            # Same contract as FakeDecoder, inlined for by-value pickling.
            if payload is None:
                return ""
            import hashlib as _hl

            h = _hl.md5(payload).hexdigest()
            return f"{h[:2]}{h[-2:]}{len(payload):08x}"

    dec = decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "media_type": pdf[media_type_col].astype(str),
                    "n_bytes": payloads.map(lambda b: 0 if b is None else len(b)).astype(
                        "int64"
                    ),
                    "checksum": payloads.map(
                        lambda b: "" if b is None else hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "feature": payloads.map(lambda b: dec(None if b is None else bytes(b))),
                }
            )

    narrow = df.select(id_col, payload_col, media_type_col)
    if max_parallelism is not None:
        # Each concurrent task spawns a Python worker (pandas/pyarrow
        # import ≈ seconds). For small inputs, capping the stage keeps
        # worker spin-up from dominating; at real scale leave None so
        # the stage inherits full input parallelism.
        narrow = narrow.coalesce(max_parallelism)
    return narrow.mapInPandas(run, schema=FEATURE_SCHEMA)


def payload_schema(extra_meta: list[StructField] | None = None) -> StructType:
    """Canonical multimodal table schema: opaque payload + typed metadata."""
    fields = [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
    ]
    return StructType(fields + (extra_meta or []))
