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


def _make_bmp_codec():
    """Pure-Python 24-bit BMP decode/encode/nearest-resize, returned as
    NESTED functions so any closure referencing them pickles BY VALUE
    (cloudpickle can't resolve nested funcs by module+qualname, so it
    ships the code — executors never need this package importable)."""
    import struct

    def decode(raw: bytes):
        """BMP → (width, height, rows) with rows top-down lists of BGR
        byte triples. Supports the baseline everyone writes: 24-bit
        uncompressed (BI_RGB) with BITMAPINFOHEADER."""
        if len(raw) < 54 or raw[:2] != b"BM":
            raise ValueError("not a BMP payload")
        data_off = struct.unpack_from("<I", raw, 10)[0]
        width, height = struct.unpack_from("<ii", raw, 18)
        bpp = struct.unpack_from("<H", raw, 28)[0]
        compression = struct.unpack_from("<I", raw, 30)[0]
        if bpp != 24 or compression != 0:
            raise ValueError("only 24-bit uncompressed BMP is supported")
        bottom_up = height > 0
        height = abs(height)
        if width <= 0 or height == 0:
            # a header can claim degenerate dims that pass the size
            # check but blow up resize/cell indexing downstream —
            # surface them as the ValueError every caller's fallback
            # path already handles (r8 advice)
            raise ValueError("degenerate BMP dimensions")
        stride = (width * 3 + 3) & ~3
        if data_off + stride * height > len(raw):
            raise ValueError("truncated BMP pixel data")
        rows = [
            raw[data_off + r * stride : data_off + r * stride + width * 3]
            for r in range(height)
        ]
        if bottom_up:
            rows.reverse()
        return width, height, rows

    def encode(width: int, height: int, rows) -> bytes:
        """(width, height, top-down BGR rows) → 24-bit bottom-up BMP."""
        stride = (width * 3 + 3) & ~3
        pad = b"\x00" * (stride - width * 3)
        body = b"".join(rows[r] + pad for r in range(height - 1, -1, -1))
        off = 14 + 40
        header = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
        info = struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body),
            2835, 2835, 0, 0,
        )
        return header + info + body

    def resize(width: int, height: int, rows, new_w: int, new_h: int):
        """Nearest-neighbor resample of top-down BGR rows."""
        out = []
        for y in range(new_h):
            sy = min(height - 1, (y * height) // new_h)
            srow = rows[sy]
            orow = bytearray()
            for x in range(new_w):
                sx = min(width - 1, (x * width) // new_w)
                orow += srow[sx * 3 : sx * 3 + 3]
            out.append(bytes(orow))
        return out

    return decode, encode, resize


def _make_wav_probe():
    """Pure-Python RIFF/WAVE header walk (PCM), nested for by-value
    pickling like ``_make_bmp_codec``."""
    import struct

    def probe(raw: bytes):
        """WAV → (n_channels, sample_rate, bits_per_sample, n_samples)."""
        if len(raw) < 44 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
            raise ValueError("not a WAV payload")
        pos, fmt, data_len = 12, None, None
        while pos + 8 <= len(raw):
            cid = raw[pos : pos + 4]
            size = struct.unpack_from("<I", raw, pos + 4)[0]
            if cid == b"fmt ":
                audio_fmt, n_ch, rate = struct.unpack_from("<HHI", raw, pos + 8)
                bits = struct.unpack_from("<H", raw, pos + 22)[0]
                if audio_fmt != 1:
                    raise ValueError("only PCM WAV is supported")
                fmt = (n_ch, rate, bits)
            elif cid == b"data":
                data_len = size
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        if fmt is None or data_len is None:
            raise ValueError("WAV missing fmt/data chunk")
        n_ch, rate, bits = fmt
        n_samples = data_len // max(n_ch * (bits // 8), 1)
        return n_ch, rate, bits, n_samples

    return probe


def real_decoder(payload: bytes) -> str:
    """Real decode for the pure-Python-decodable formats: BMP (24-bit
    uncompressed) and PCM WAV, dispatched on magic bytes. Returns the
    same compact feature-string contract as ``FakeDecoder`` — media
    geometry instead of a content hash. Formats needing native libs
    (JPEG/PNG/MP4...) raise ValueError with the offending magic; plug a
    PIL/ffmpeg-backed callable into ``extract_features(decoder=...)``
    on deployments that have them."""
    if payload is None:
        return ""
    raw = bytes(payload)
    if raw[:2] == b"BM":
        decode, _, _ = _make_bmp_codec()
        w, h, _rows = decode(raw)
        return f"bmp:{w}x{h}"
    if raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
        probe = _make_wav_probe()
        n_ch, rate, bits, n_samples = probe(raw)
        return f"wav:{n_ch}ch:{rate}hz:{bits}bit:{n_samples}samp"
    raise ValueError(
        f"unsupported media format (magic {raw[:8]!r}); decodable here: "
        "BMP (24-bit), PCM WAV"
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


#: Resize output: one row per input image, new payload + dimensions.
RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_bytes", LongType()),
    ]
)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_parallelism: int | None = None,
) -> DataFrame:
    """Image resize over binary payloads: Arrow ``mapInPandas``, fixed
    output schema (payload + new dims) so the write side is stable.

    BMP payloads (24-bit uncompressed — the one format decodable in
    pure Python) are REALLY decoded, nearest-neighbor resampled to
    width×height, and re-encoded as BMP. Anything else falls back to a
    deterministic fake raster (bytes tiled/truncated to width×height),
    standing in for a PIL/opencv resample on deployments that have
    native imaging libs (same contract: bytes → bytes of the new
    raster). Closure pickles by value; executors never import the
    package.
    """
    import struct

    w, h = int(width), int(height)
    target = w * h
    bmp_decode, bmp_encode, bmp_resize = _make_bmp_codec()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def do_resize(b) -> bytes:
            if b is None or len(b) == 0:
                return bytes(target)
            raw = bytes(b)
            if raw[:2] == b"BM":
                try:
                    ow, oh, rows = bmp_decode(raw)
                    return bmp_encode(w, h, bmp_resize(ow, oh, rows, w, h))
                except (ValueError, IndexError, struct.error):
                    pass  # malformed/degenerate BMP → fake raster below
            reps = -(-target // len(raw))  # ceil-div tile then crop
            return (raw * reps)[:target]

        for pdf in batches:
            out = pdf[payload_col].map(do_resize)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": out,
                    "width": w,
                    "height": h,
                    "n_bytes": out.map(len).astype("int64"),
                }
            )

    narrow = df.select(id_col, payload_col)
    if max_parallelism is not None:
        narrow = narrow.coalesce(max_parallelism)
    return narrow.mapInPandas(run, schema=RESIZE_SCHEMA)


def image_ahash(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    grid: int = 8,
    max_parallelism: int | None = None,
    decoder: Callable[[bytes], tuple[int, int, list]] | None = None,
) -> DataFrame:
    """Perceptual AVERAGE-HASH of image payloads — the multimodal
    rung of the dedup family: downscale to ``grid``×``grid``,
    grayscale, threshold each cell at the image mean, pack the bits
    into one signed BIGINT. Re-encodes, crops, small watermarks and
    format round-trips perturb only a few cells, so near-duplicate
    images sit within a small Hamming distance — feed the output to
    ``dedup.hamming_near_pairs`` exactly like text SimHash
    fingerprints (same pigeonhole block join, never all-pairs).

    The CODEC IS INJECTABLE: ``decoder`` takes raw bytes and returns
    (width, height, top-down rows of BGR byte-triples) or raises on
    formats it can't read — the executable deployment seam for
    PIL/opencv (``lambda b: pil_to_bgr_rows(Image.open(...))``). The
    default is the vendored pure-Python 24-bit BMP codec; any payload
    the decoder rejects (ValueError/struct.error/IndexError — malformed
    headers included, never a job-killing escape) hashes a
    deterministic fake raster (bytes tiled to the grid — the stand-in
    contract every stub here follows: plumbing, schema and
    distribution shape real). One Arrow ``mapInPandas`` pass, zero
    shuffle; the hash is 8 bytes per image no matter the payload size
    — the ONLY thing the pair stage ever shuffles. A custom
    ``decoder`` must be by-value picklable or importable on executors.
    Returns (id_col, ahash bigint)."""
    import struct

    g = int(grid)
    nbits = g * g
    assert nbits <= 64, "grid*grid must fit one BIGINT"
    bmp_decode, _, bmp_resize = _make_bmp_codec()
    dec = decoder if decoder is not None else bmp_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def gray_cells(b) -> list:
            if b is None or len(b) == 0:
                return [0] * nbits
            raw = bytes(b)
            try:
                w, h, rows = dec(raw)
                small = bmp_resize(w, h, rows, g, g)
                return [
                    (
                        small[y][x * 3]
                        + small[y][x * 3 + 1]
                        + small[y][x * 3 + 2]
                    )
                    for y in range(g)
                    for x in range(g)
                ]
            except (ValueError, IndexError, struct.error):
                pass
            reps = -(-nbits // len(raw))
            tiled = (raw * reps)[:nbits]
            return [3 * v for v in tiled]

        def one(b) -> int:
            cells = gray_cells(b)
            mean = sum(cells) / len(cells)
            v = 0
            for i, c in enumerate(cells):
                if c > mean:
                    v |= 1 << i
            if v >= 1 << 63:
                v -= 1 << 64
            return v

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "ahash": pdf[payload_col].map(one).astype("int64"),
                }
            )

    narrow = df.select(id_col, payload_col)
    if max_parallelism is not None:
        narrow = narrow.coalesce(max_parallelism)
    return narrow.mapInPandas(run, schema="doc_id long, ahash long")


def image_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    grid: int = 8,
    max_hamming: int = 5,
    max_parallelism: int | None = None,
    decoder: Callable[[bytes], tuple[int, int, list]] | None = None,
) -> DataFrame:
    """Near-duplicate IMAGE pairs: :func:`image_ahash` fingerprints +
    the shared Hamming pigeonhole block join
    (``dedup.hamming_near_pairs``). Payload bytes never shuffle — only
    (id, 8-byte hash) cells enter the exchange, so a 100 TB image
    corpus pairs at the cost of its id space. ``decoder`` swaps the
    image codec (see :func:`image_ahash`) without touching the pair
    machinery. Returns (id_a, id_b, hamming)."""
    from cmsspark_spark.operators.dedup import hamming_near_pairs

    hashes = image_ahash(
        df, id_col=id_col, payload_col=payload_col, grid=grid,
        max_parallelism=max_parallelism, decoder=decoder,
    )
    return hamming_near_pairs(
        hashes, "doc_id", "ahash",
        bits=int(grid) * int(grid), max_hamming=max_hamming,
    )


def audio_ahash(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    windows: int = 64,
    max_parallelism: int | None = None,
    decoder: Callable[[bytes], list] | None = None,
) -> DataFrame:
    """ENERGY-ENVELOPE hash of audio payloads — the audio twin of
    :func:`image_ahash`: split the sample stream into ``windows``
    equal chunks, mean-absolute amplitude per chunk, threshold at the
    clip's overall mean, pack the bits into one signed BIGINT. Level
    changes, re-encodes and small edits perturb few envelope bits, so
    near-duplicate clips sit within a small Hamming distance — pair
    with ``dedup.hamming_near_pairs`` like every other fingerprint
    here. The CODEC IS INJECTABLE: ``decoder`` takes raw bytes and
    returns the sample amplitude list or raises on formats it can't
    read — the executable deployment seam for ffmpeg/torchaudio. The
    default really decodes 16-bit PCM WAV (first channel); payloads
    the decoder rejects (ValueError/struct.error/IndexError — a WAV
    truncated inside its fmt chunk included, never a job-killing
    escape) hash their raw bytes as a deterministic fake sample
    stream (the shared stub contract). One Arrow pass, zero shuffle,
    8 bytes out per clip. A custom ``decoder`` must be by-value
    picklable or importable on executors.
    Returns (id_col, ahash bigint)."""
    import struct

    nw = int(windows)
    assert nw <= 64, "windows must fit one BIGINT"

    def wav_samples(raw: bytes) -> list:
        if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
            raise ValueError("not a WAV payload")
        pos, n_ch, bits, data = 12, 1, 16, None
        ok = True
        while pos + 8 <= len(raw):
            cid = raw[pos : pos + 4]
            size = struct.unpack_from("<I", raw, pos + 4)[0]
            if cid == b"fmt ":
                fmt_, n_ch, _rate = struct.unpack_from("<HHI", raw, pos + 8)
                bits = struct.unpack_from("<H", raw, pos + 22)[0]
                ok = fmt_ == 1 and bits == 16
            elif cid == b"data":
                data = raw[pos + 8 : pos + 8 + size]
            pos += 8 + size + (size & 1)
        if not ok or not data:
            raise ValueError("unsupported or chunk-incomplete WAV")
        step = 2 * max(n_ch, 1)
        return [
            struct.unpack_from("<h", data, i)[0]
            for i in range(0, len(data) - 1, step)
        ]

    dec = decoder if decoder is not None else wav_samples

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def samples(raw: bytes) -> list:
            try:
                return dec(raw)
            except (ValueError, IndexError, struct.error):
                return list(raw)  # fake stream: bytes as amplitudes

        def one(b) -> int:
            raw = bytes(b) if b else b"\x00"
            s = samples(raw) or [0]
            k = max(1, len(s) // nw)
            energies = [
                sum(abs(v) for v in s[i * k : (i + 1) * k]) / k
                for i in range(nw)
            ]
            mean = sum(energies) / nw
            v = 0
            for i, e in enumerate(energies):
                if e > mean:
                    v |= 1 << i
            if v >= 1 << 63:
                v -= 1 << 64
            return v

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "ahash": pdf[payload_col].map(one).astype("int64"),
                }
            )

    narrow = df.select(id_col, payload_col)
    if max_parallelism is not None:
        narrow = narrow.coalesce(max_parallelism)
    return narrow.mapInPandas(run, schema="doc_id long, ahash long")


def audio_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    windows: int = 64,
    max_hamming: int = 5,
    max_parallelism: int | None = None,
    decoder: Callable[[bytes], list] | None = None,
) -> DataFrame:
    """Near-duplicate AUDIO pairs: envelope hashes + the shared
    Hamming pigeonhole block join — payload bytes never shuffle.
    ``decoder`` swaps the audio codec (see :func:`audio_ahash`)
    without touching the pair machinery.
    Returns (id_a, id_b, hamming)."""
    from cmsspark_spark.operators.dedup import hamming_near_pairs

    hashes = audio_ahash(
        df, id_col=id_col, payload_col=payload_col, windows=windows,
        max_parallelism=max_parallelism, decoder=decoder,
    )
    return hamming_near_pairs(
        hashes, "doc_id", "ahash", bits=int(windows),
        max_hamming=max_hamming,
    )


#: Frame sampling output: 1→N rows (frame_idx within each video).
FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
        StructField("frame_checksum", StringType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_k: int = 10,
    frame_bytes: int = 64,
    max_frames: int = 16,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_parallelism: int | None = None,
) -> DataFrame:
    """Video frame sampling: each binary payload yields every ``k``-th
    frame as its own row (1→N via ``mapInPandas`` — the UDTF shape),
    capped at ``max_frames`` per video so one long video can't blow an
    Arrow batch.

    The decoder is STUBBED deterministically: the payload is treated as
    a stream of fixed-size ``frame_bytes`` frames (stand-in for ffmpeg
    keyframe extraction) — the explode shape, per-frame checksums, and
    batch-size discipline are real. Closure pickles by value.
    """
    k, fb, cap = int(every_k), int(frame_bytes), int(max_frames)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, idxs, frames, sums = [], [], [], []
            for doc_id, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue
                raw = bytes(b)
                n_frames = len(raw) // fb
                taken = 0
                for fi in range(0, n_frames, k):
                    if taken >= cap:
                        break
                    frame = raw[fi * fb : (fi + 1) * fb]
                    ids.append(int(doc_id))
                    idxs.append(fi)
                    frames.append(frame)
                    sums.append(hashlib.md5(frame).hexdigest())
                    taken += 1
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame": pd.Series(frames, dtype="object"),
                    "frame_checksum": pd.Series(sums, dtype="object"),
                }
            )

    narrow = df.select(id_col, payload_col)
    if max_parallelism is not None:
        narrow = narrow.coalesce(max_parallelism)
    return narrow.mapInPandas(run, schema=FRAME_SCHEMA)
