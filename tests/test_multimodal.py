

def test_resize_images_fixed_output_shape(spark):
    from cmsspark_spark.operators.multimodal import attach_binary_payload, resize_images

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "x")], ["doc_id", "text"]
    )
    out = resize_images(
        attach_binary_payload(docs), width=8, height=4, max_parallelism=2
    ).collect()
    assert len(out) == 3
    for r in out:
        assert r["width"] == 8 and r["height"] == 4
        assert r["n_bytes"] == 32 and len(r["payload"]) == 32
    # deterministic: same input bytes → same resized bytes
    by_id = {r["doc_id"]: bytes(r["payload"]) for r in out}
    assert by_id[1][:11] == b"hello world"  # tiling starts with the raw bytes
    assert by_id[2] == bytes(32)  # empty payload → zero raster


def test_sample_frames_explode_shape_and_cap(spark):
    from cmsspark_spark.operators.multimodal import attach_binary_payload, sample_frames

    # 'video' of 400 bytes → 50 frames of 8 bytes; every 10th → idx 0,10,20,30,40
    docs = spark.createDataFrame([(7, "ab" * 200)], ["doc_id", "text"])
    out = sample_frames(
        attach_binary_payload(docs), every_k=10, frame_bytes=8, max_frames=16
    ).collect()
    assert [r["frame_idx"] for r in sorted(out, key=lambda r: r["frame_idx"])] == [
        0, 10, 20, 30, 40
    ]
    assert all(len(r["frame"]) == 8 for r in out)
    # cap respected on a long video
    long = spark.createDataFrame([(8, "z" * 4000)], ["doc_id", "text"])
    capped = sample_frames(
        attach_binary_payload(long), every_k=1, frame_bytes=8, max_frames=16
    ).collect()
    assert len(capped) == 16
    # frame checksum matches the frame bytes
    import hashlib

    for r in out:
        assert r["frame_checksum"] == hashlib.md5(bytes(r["frame"])).hexdigest()


def _make_bmp(width, height, pixels):
    """Build a 24-bit BMP from top-down rows of (B, G, R) tuples."""
    import struct

    stride = (width * 3 + 3) & ~3
    pad = b"\x00" * (stride - width * 3)
    rows = [
        b"".join(bytes(px) for px in pixels[r]) + pad
        for r in range(height - 1, -1, -1)  # bottom-up storage
    ]
    body = b"".join(rows)
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + info + body


def test_bmp_codec_roundtrip():
    from cmsspark_spark.operators.multimodal import _make_bmp_codec

    decode, encode, resize = _make_bmp_codec()
    px = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)],
        [(1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12)],
    ]
    raw = _make_bmp(4, 2, px)
    w, h, rows = decode(raw)
    assert (w, h) == (4, 2)
    assert rows[0][:3] == bytes((255, 0, 0))  # top-down after decode
    assert rows[1][9:12] == bytes((10, 11, 12))
    # encode→decode roundtrip is identity
    w2, h2, rows2 = decode(encode(w, h, rows))
    assert (w2, h2, rows2) == (w, h, rows)
    # nearest-neighbor 4x2 → 2x2 picks columns 0,2 of each row
    small = resize(w, h, rows, 2, 2)
    assert small[0] == bytes((255, 0, 0)) + bytes((0, 0, 255))
    assert small[1] == bytes((1, 2, 3)) + bytes((7, 8, 9))


def test_real_decoder_bmp_and_wav():
    import io
    import wave

    import pytest

    from cmsspark_spark.operators.multimodal import real_decoder

    bmp = _make_bmp(4, 2, [[(0, 0, 0)] * 4, [(1, 1, 1)] * 4])
    assert real_decoder(bmp) == "bmp:4x2"

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)  # 16-bit
        wf.setframerate(8000)
        wf.writeframes(b"\x00\x01" * 2 * 100)  # 100 stereo samples
    assert real_decoder(buf.getvalue()) == "wav:2ch:8000hz:16bit:100samp"

    with pytest.raises(ValueError, match="unsupported media format"):
        real_decoder(b"\x89PNG\r\n\x1a\nrest")
    assert real_decoder(None) == ""


def test_resize_images_real_bmp_payload(spark):
    import pyspark.sql.functions as F

    from cmsspark_spark.operators.multimodal import _make_bmp_codec, resize_images

    px = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)],
        [(1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12)],
    ]
    raw = _make_bmp(4, 2, px)
    df = spark.createDataFrame([(1, bytearray(raw))], "doc_id: long, payload: binary")
    out = resize_images(df, width=2, height=2, max_parallelism=1).collect()
    assert len(out) == 1
    r = out[0]
    assert r["width"] == 2 and r["height"] == 2
    # the output is a real BMP of the resampled raster, not a fake tile
    decode, _, _ = _make_bmp_codec()
    w, h, rows = decode(bytes(r["payload"]))
    assert (w, h) == (2, 2)
    assert rows[0] == bytes((255, 0, 0)) + bytes((0, 0, 255))
    assert rows[1] == bytes((1, 2, 3)) + bytes((7, 8, 9))
    assert r["n_bytes"] == len(bytes(r["payload"]))


def test_image_ahash_perceptual_properties(spark):
    """r8: the average-hash is stable under re-encode, nearly stable
    under a small perturbation, and far from a structurally different
    image — the contract that makes Hamming near-dup work on images."""
    from cmsspark_spark.operators.multimodal import image_ahash

    # 16x16 half-dark / half-bright gradient
    def px(grad):
        return [
            [grad(x, y) for x in range(16)] for y in range(16)
        ]

    base = _make_bmp(16, 16, px(lambda x, y: (x * 16, x * 16, x * 16)))
    tweak_px = px(lambda x, y: (x * 16, x * 16, x * 16))
    tweak_px[3][3] = (255, 255, 255)  # one bright pixel in the dark half
    tweaked = _make_bmp(16, 16, tweak_px)
    inverted = _make_bmp(
        16, 16, px(lambda x, y: (255 - x * 16,) * 3)
    )
    df = spark.createDataFrame(
        [(0, bytearray(base)), (1, bytearray(base)),
         (2, bytearray(tweaked)), (3, bytearray(inverted))],
        "doc_id long, payload binary",
    )
    h = {r.doc_id: r.ahash for r in image_ahash(df).collect()}
    assert h[0] == h[1]  # identical bytes, identical hash

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(h[0], h[2]) <= 4          # small perturbation
    assert ham(h[0], h[3]) >= 20         # structural difference


def test_image_near_dup_pairs_blocked_join(spark):
    """r8: near-dup image pairs via the shared Hamming pigeonhole
    join — the planted near-identical pair is found, the inverted
    image pairs with nothing, and non-BMP payloads flow through the
    deterministic fake-raster path (identical bytes → hamming 0)."""
    from cmsspark_spark.operators.multimodal import image_near_dup_pairs

    def px(grad):
        return [[grad(x, y) for x in range(16)] for y in range(16)]

    base = _make_bmp(16, 16, px(lambda x, y: (x * 16, x * 16, x * 16)))
    tweak_px = px(lambda x, y: (x * 16, x * 16, x * 16))
    tweak_px[3][3] = (255, 255, 255)
    tweaked = _make_bmp(16, 16, tweak_px)
    inverted = _make_bmp(16, 16, px(lambda x, y: (255 - x * 16,) * 3))
    fake = b"not-a-bmp-payload" * 5
    df = spark.createDataFrame(
        [(0, bytearray(base)), (1, bytearray(tweaked)),
         (2, bytearray(inverted)),
         (10, bytearray(fake)), (11, bytearray(fake))],
        "doc_id long, payload binary",
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in image_near_dup_pairs(df, max_hamming=5).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] <= 4
    assert (10, 11) in pairs and pairs[(10, 11)] == 0
    assert not any(2 in p for p in pairs)  # inverted image unpaired


def _make_wav(pattern, n_per=200):
    """16-bit mono PCM WAV whose loudness follows `pattern` (list of
    amplitudes, one block of n_per samples each)."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        frames = b"".join(
            struct.pack("<h", amp if i % 2 == 0 else -amp)
            for amp in pattern
            for i in range(n_per)
        )
        wf.writeframes(frames)
    return buf.getvalue()


def test_audio_ahash_envelope_properties(spark):
    """r8: the energy-envelope hash — stable on identical clips,
    near-stable under small amplitude noise, far from a clip with the
    opposite loudness pattern; non-WAV payloads go through the fake
    byte-stream path deterministically."""
    from cmsspark_spark.operators.multimodal import (
        audio_ahash,
        audio_near_dup_pairs,
    )

    loud_quiet = [20000 if (i // 8) % 2 == 0 else 100 for i in range(64)]
    noisy = [v + 50 for v in loud_quiet]
    quiet_loud = [100 if (i // 8) % 2 == 0 else 20000 for i in range(64)]
    base = _make_wav(loud_quiet)
    near = _make_wav(noisy)
    diff = _make_wav(quiet_loud)
    fake = b"definitely-not-audio" * 7
    df = spark.createDataFrame(
        [(0, bytearray(base)), (1, bytearray(base)),
         (2, bytearray(near)), (3, bytearray(diff)),
         (10, bytearray(fake)), (11, bytearray(fake))],
        "doc_id long, payload binary",
    )
    h = {r.doc_id: r.ahash for r in audio_ahash(df).collect()}
    assert h[0] == h[1]

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(h[0], h[2]) <= 4
    assert ham(h[0], h[3]) >= 20

    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in audio_near_dup_pairs(df, max_hamming=5).collect()
    }
    assert (0, 1) in pairs and (0, 2) in pairs and (10, 11) in pairs
    assert not any(3 in p for p in pairs)


def test_image_ahash_decoder_injection_flows_through_pairs(spark):
    """r9: the codec seam is EXECUTABLE — a swapped-in decoder (stand-in
    for PIL/opencv) feeds image_ahash → hamming_near_pairs unchanged.
    The toy decoder reads a 1-byte 'format': payloads the default BMP
    codec would reject become valid 2x2 rasters keyed by that byte."""
    from cmsspark_spark.operators.multimodal import (
        image_ahash,
        image_near_dup_pairs,
    )

    def toy_decoder(raw: bytes):
        if raw[:1] != b"T":  # toy magic
            raise ValueError("not a toy image")
        v = raw[1]
        row = bytes([v, v, v, 255 - v, 255 - v, 255 - v])
        return 2, 2, [row, row]

    payload_a = b"T" + bytes([10]) + b"junk-tail-a"
    payload_b = b"T" + bytes([10]) + b"different-tail"  # same raster
    payload_c = b"T" + bytes([200]) + b"x"
    df = spark.createDataFrame(
        [(0, bytearray(payload_a)), (1, bytearray(payload_b)),
         (2, bytearray(payload_c))],
        "doc_id long, payload binary",
    )
    h = {r.doc_id: r.ahash for r in
         image_ahash(df, grid=4, decoder=toy_decoder).collect()}
    assert h[0] == h[1]  # decoder output, not raw bytes, drives the hash
    h_default = {r.doc_id: r.ahash for r in image_ahash(df, grid=4).collect()}
    assert h_default[0] != h_default[1]  # default codec saw only bytes
    pairs = {
        (r.id_a, r.id_b)
        for r in image_near_dup_pairs(
            df, grid=4, max_hamming=2, decoder=toy_decoder
        ).collect()
    }
    assert (0, 1) in pairs


def test_audio_ahash_decoder_injection_flows_through_pairs(spark):
    """r9: audio twin of the decoder-injection seam."""
    from cmsspark_spark.operators.multimodal import (
        audio_ahash,
        audio_near_dup_pairs,
    )

    def toy_decoder(raw: bytes):
        if raw[:1] != b"S":
            raise ValueError("not a toy stream")
        # loud/quiet envelope selected by the second byte, ignore tail
        loud = [1000] * 256 + [10] * 256
        quiet = [10] * 256 + [1000] * 256
        return loud if raw[1] == 0 else quiet

    a = b"S" + bytes([0]) + b"tail-one"
    b_ = b"S" + bytes([0]) + b"tail-two"
    c = b"S" + bytes([1]) + b"z"
    df = spark.createDataFrame(
        [(0, bytearray(a)), (1, bytearray(b_)), (2, bytearray(c))],
        "doc_id long, payload binary",
    )
    h = {r.doc_id: r.ahash for r in
         audio_ahash(df, windows=16, decoder=toy_decoder).collect()}
    assert h[0] == h[1] and h[0] != h[2]
    pairs = {
        (r.id_a, r.id_b)
        for r in audio_near_dup_pairs(
            df, windows=16, max_hamming=2, decoder=toy_decoder
        ).collect()
    }
    assert (0, 1) in pairs and (0, 2) not in pairs


def test_malformed_media_payloads_fall_back_not_crash(spark):
    """r8 advice: a BMP whose header claims height=0 (passes the size
    check, used to IndexError in resize) or negative width, and a WAV
    truncated inside its fmt chunk (used to escape as struct.error),
    must all take the deterministic fallback hash instead of killing
    the job."""
    import struct

    from cmsspark_spark.operators.multimodal import (
        audio_ahash,
        image_ahash,
        resize_images,
    )

    zero_h = _make_bmp(4, 1, [[(1, 2, 3)] * 4])
    zero_h = zero_h[:22] + struct.pack("<i", 0) + zero_h[26:]  # height := 0
    neg_w = _make_bmp(4, 1, [[(1, 2, 3)] * 4])
    neg_w = neg_w[:18] + struct.pack("<i", -4) + neg_w[22:]  # width := -4
    bad_wav = b"RIFF" + struct.pack("<I", 100) + b"WAVE" + b"fmt " + \
        struct.pack("<I", 16) + b"\x01\x00"  # fmt chunk cut short
    df = spark.createDataFrame(
        [(0, bytearray(zero_h)), (1, bytearray(neg_w)),
         (2, bytearray(bad_wav))],
        "doc_id long, payload binary",
    )
    img = {r.doc_id: r.ahash for r in image_ahash(df, grid=4).collect()}
    assert set(img) == {0, 1, 2}  # every row hashed, nothing raised
    aud = {r.doc_id: r.ahash for r in audio_ahash(df, windows=8).collect()}
    assert set(aud) == {0, 1, 2}
    rs = resize_images(df, 4, 4).collect()
    assert all(r.n_bytes == 16 for r in rs)  # fake-raster fallback size
