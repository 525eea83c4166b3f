

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
