"""Unit tests for the multimodal mapInPandas operators (decode stubs)."""

from __future__ import annotations

import hashlib

import pytest

from lms_etl_pipeline_spark.operators import multimodal as mm


@pytest.fixture()
def payloads(spark):
    df = spark.createDataFrame([(1, "abcd" * 100), (2, ""), (3, "z")], "doc_id BIGINT, text STRING")
    return mm.with_payload(df)


def test_image_features_fake_decode(spark, payloads):
    rows = {r.id: r for r in mm.decode_image_features(payloads).collect()}
    assert rows[1].payload_bytes == 400
    assert rows[1].pseudo_width == 400 % 509 and rows[1].pseudo_height == 400 % 293
    assert rows[1].payload_md5 == hashlib.md5(b"abcd" * 100).hexdigest()
    assert abs(rows[1].mean_byte - (sum(b"abcd") / 4)) < 1e-9
    assert rows[2].payload_bytes == 0 and rows[2].mean_byte is None


def test_image_real_decode_is_explicit_stub(payloads):
    with pytest.raises(NotImplementedError, match="PIL"):
        mm.decode_image_features(payloads, decode="real")
    with pytest.raises(ValueError):
        mm.decode_image_features(payloads, decode="whatever")


def test_frame_sample_fanout_and_cap(spark):
    df = spark.createDataFrame(
        [(1, "x" * 2500), (2, "y" * 10), (3, "")], "doc_id BIGINT, text STRING"
    )
    out = mm.sample_frames(mm.with_payload(df), frame_size=256, max_frames=8).collect()
    by_id: dict[int, list] = {}
    for r in out:
        by_id.setdefault(r.id, []).append(r)
    # 2500 bytes => ceil = 10 frames, capped at 8
    assert len(by_id[1]) == 8
    assert [r.frame_bytes for r in sorted(by_id[1], key=lambda r: r.frame_idx)][:2] == [256, 256]
    assert len(by_id[2]) == 1 and by_id[2][0].frame_bytes == 10
    assert 3 not in by_id  # empty payload -> zero frames


def test_audio_features(spark, payloads):
    rows = {r.id: r for r in mm.decode_audio_features(payloads).collect()}
    assert rows[1].pseudo_duration_s == 400 / 32000.0
    b = b"abcd"
    expected_rms = (sum(x * x for x in b) / 4) ** 0.5
    assert abs(rows[1].rms_byte - expected_rms) < 1e-9


def test_resize_stride_subsample(spark):
    df = spark.createDataFrame([(1, "ab" * 2048), (2, "xy")], "doc_id BIGINT, text STRING")
    rows = {r.id: r for r in mm.resize_images(mm.with_payload(df), target_bytes=1024).collect()}
    assert rows[1].orig_bytes == 4096
    assert rows[1].resized_bytes == 1024
    assert bytes(rows[1].payload) == (b"ab" * 2048)[::4][:1024]
    assert rows[2].resized_bytes == 2  # already smaller than target

def test_resize_real_is_explicit_stub(spark):
    df = mm.with_payload(spark.createDataFrame([(1, "x")], "doc_id BIGINT, text STRING"))
    with pytest.raises(NotImplementedError, match="PIL"):
        mm.resize_images(df, decode="real")


def test_map_in_arrow_zero_copy_batch_transform(spark):
    """mapInArrow: the lowest-overhead Python surface — RecordBatch in,
    RecordBatch out, no pandas materialization.  The right tool when the
    Python side is itself Arrow-native (tokenizers, image codecs reading
    Arrow buffers)."""
    import pyarrow as pa

    df = spark.createDataFrame(
        [(1, b"abc"), (2, b"defg"), (3, b"")], "id LONG, payload BINARY"
    )

    def add_len(batches):
        for batch in batches:
            n = pa.compute.binary_length(batch.column(1))
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), batch.column(1), n], ["id", "payload", "n_bytes"]
            )

    out = df.mapInArrow(add_len, "id LONG, payload BINARY, n_bytes INT").collect()
    assert sorted((r.id, r.n_bytes) for r in out) == [(1, 3), (2, 4), (3, 0)]
