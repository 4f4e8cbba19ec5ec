"""Multimodal stage plumbing tests (decode stubbed, Ray path real)."""

import numpy as np
import pytest

from textpipe_ray.stages.multimodal import (
    AudioFeatureStage,
    DecoderBackend,
    FakeDecoderBackend,
    ImageFeatureStage,
    generate_media,
)


def test_generate_media_schema():
    t = generate_media(50)
    assert t.num_rows == 50
    assert set(t.column("kind").to_pylist()) <= {"image", "audio", "video"}
    # deterministic
    assert t.equals(generate_media(50))


def test_real_backend_raises():
    b = DecoderBackend()
    with pytest.raises(NotImplementedError):
        b.decode_image(b"x", 1, 1)
    with pytest.raises(NotImplementedError):
        b.decode_audio(b"x", 16000, 100)


def test_image_stage_direct():
    t = generate_media(20)
    stage = ImageFeatureStage(target_size=16)
    out = stage(t)
    kinds = out.column("kind").to_pylist()
    feats = out.column("image_features").to_pylist()
    for k, f in zip(kinds, feats):
        if k == "image":
            assert f is not None and len(f) == 8
        else:
            assert f is None


def test_audio_stage_direct():
    t = generate_media(20)
    out = AudioFeatureStage(frame_ms=100)(t)
    for k, env, dur in zip(
        out.column("kind").to_pylist(),
        out.column("rms_envelope").to_pylist(),
        out.column("duration_ms").to_pylist(),
    ):
        if k == "audio":
            assert env is not None
            assert len(env) == (16000 * dur // 1000) // 1600
        else:
            assert env is None


def test_media_pipeline_on_ray(ray_session):
    import ray.data

    ds = ray.data.from_arrow(generate_media(64))
    out = (
        ds.map_batches(ImageFeatureStage, batch_format="pyarrow", batch_size=16, concurrency=2)
        .map_batches(AudioFeatureStage, batch_format="pyarrow", batch_size=16, concurrency=2)
        .to_pandas()
    )
    assert len(out) == 64
    img = out[out["kind"] == "image"]
    assert img["decoded_ok"].all()
    assert img["image_features"].map(len).eq(8).all()


def test_video_frame_sampling(ray_session):
    import ray.data

    from textpipe_ray.stages.multimodal import VideoFrameSampleStage, generate_media

    ds = ray.data.from_arrow(generate_media(60, seed=9)).repartition(4)
    rows = []
    for b in ds.map_batches(
        VideoFrameSampleStage, batch_format="pyarrow", batch_size=8, concurrency=2,
        fn_constructor_kwargs={"num_frames": 4},
    ).iter_batches(batch_size=64, batch_format="pyarrow"):
        rows.extend(b.to_pylist())
    vids = [r for r in rows if r["kind"] == "video"]
    assert len(vids) > 0
    for row in vids:
        assert len(row["frame_ts_ms"]) == 4
        assert len(row["frame_features"]) == 4
        # timestamps increasing within the clip duration
        ts = list(row["frame_ts_ms"])
        assert ts == sorted(ts) and ts[-1] <= row["duration_ms"]
        assert all(len(f) == 6 for f in row["frame_features"])
    # non-video rows untouched
    assert all(r["frame_ts_ms"] is None for r in rows if r["kind"] != "video")


def test_video_frames_deterministic(ray_session):
    from textpipe_ray.stages.multimodal import FakeDecoderBackend

    b = FakeDecoderBackend()
    f1 = b.decode_video_frame(b"payload", 500, 8, 8)
    f2 = b.decode_video_frame(b"payload", 500, 8, 8)
    f3 = b.decode_video_frame(b"payload", 600, 8, 8)
    assert (f1 == f2).all()
    assert (f1 != f3).any()  # distinct timestamps → distinct frames


def test_phash_dedup_recovers_planted_dups(ray_session):
    """Every planted byte-identical image pair must surface from the
    hamming-band plan, and under the fake decoder nothing else may
    (distinct payloads decode to independent noise -> far hashes)."""
    from collections import defaultdict

    import ray.data

    from textpipe_ray.stages.dedup import near_dup_fingerprints
    from textpipe_ray.stages.multimodal import ImagePHashStage, generate_media

    tbl = generate_media(200, dup_frac=0.3)
    # ground truth: all within-group pairs of byte-identical image payloads
    groups = defaultdict(list)
    for r in tbl.to_pylist():
        if r["kind"] == "image":
            groups[r["payload"]].append(r["media_id"])
    expected = set()
    for ids in groups.values():
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                expected.add((min(a, b), max(a, b)))
    assert expected, "generator must plant duplicates at dup_frac=0.3"

    ds = ray.data.from_arrow(tbl).repartition(4).filter(lambda r: r["kind"] == "image")
    hashed = ds.map_batches(
        ImagePHashStage, batch_format="pyarrow", batch_size=32, concurrency=2
    ).select_columns(["media_id", "phash"])
    pairs = near_dup_fingerprints(
        hashed, fp_col="phash", id_col="media_id", max_hamming=2
    ).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert expected <= got  # pigeonhole recall is 1.0 by construction
    assert (pairs["hamming"] == 0).all()  # identical payloads -> identical hashes


def test_video_dedup_recovers_planted_dups(ray_session):
    """Planted payload+duration video copies must surface as 4/4-frame
    matches; under the fake decoder nothing else may match."""
    from collections import defaultdict

    from textpipe_ray.pipelines.queries import q_video_dedup
    from textpipe_ray.stages.multimodal import generate_media

    tbl = generate_media(200, dup_frac=0.3)
    groups = defaultdict(list)
    for r in tbl.to_pylist():
        if r["kind"] == "video":
            groups[(r["payload"], r["duration_ms"])].append(r["media_id"])
    expected = set()
    for ids in groups.values():
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                expected.add((min(a, b), max(a, b)))
    assert expected, "generator must plant video duplicates at dup_frac=0.3"

    df = q_video_dedup("/root/testdata/sf0.001").to_pandas()
    got = set(zip(df["id_a"], df["id_b"]))
    assert got == expected
    assert (df["n_frames_matched"] == 4).all()


def test_audio_dedup_recovers_planted_dups(ray_session):
    """Planted payload+rate+duration audio copies must surface as
    hamming-0 fingerprint pairs; nothing else may under the fake."""
    from collections import defaultdict

    from textpipe_ray.pipelines.queries import q_audio_dedup
    from textpipe_ray.stages.multimodal import generate_media

    tbl = generate_media(200, dup_frac=0.3)
    groups = defaultdict(list)
    for r in tbl.to_pylist():
        if r["kind"] == "audio":
            groups[(r["payload"], r["sample_rate"], r["duration_ms"])].append(r["media_id"])
    expected = set()
    for ids in groups.values():
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                expected.add((min(a, b), max(a, b)))
    assert expected

    df = q_audio_dedup("/root/testdata/sf0.001").to_pandas()
    assert set(zip(df["id_a"], df["id_b"])) == expected
    assert (df["hamming"] == 0).all()
