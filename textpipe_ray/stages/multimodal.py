"""Multimodal (image/audio/video) stages: opaque binary columns +
typed metadata, processed by actor-pool ``map_batches`` stages.

The Ray-side plumbing — schemas, batch sizing for large payloads,
actor signatures, output layout — is real and tested; the actual
codec work is stubbed behind ``DecoderBackend`` because the media
libraries are not available in this environment.  Swapping in a real
backend (PIL/torchaudio/ffmpeg) touches ONE class per modality.

Scale notes: binary payloads dominate block size — use small
``batch_size`` (16-64) and let ``target_max_block_size`` keep blocks
bounded; decode stages pin ``num_cpus`` per actor and the pool size
caps peak decoded-memory = concurrency × batch_size × frame bytes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # 'image' | 'audio' | 'video'
        ("payload", pa.binary()),        # opaque encoded bytes
        ("mime", pa.string()),
        ("width", pa.int32()),           # images/video
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),     # audio
        ("duration_ms", pa.int64()),     # audio/video
    ]
)


class DecoderBackend:
    """Codec seam.  The deterministic fake derives pseudo-pixels /
    samples from the payload hash so pipelines are testable end-to-end;
    a real backend decodes with PIL / soundfile / ffmpeg."""

    def decode_image(self, payload: bytes, width: int, height: int) -> np.ndarray:
        raise NotImplementedError("real image decoding requires an image library")

    def decode_audio(self, payload: bytes, sample_rate: int, duration_ms: int) -> np.ndarray:
        raise NotImplementedError("real audio decoding requires an audio library")

    def decode_video_frame(
        self, payload: bytes, t_ms: int, width: int, height: int
    ) -> np.ndarray:
        raise NotImplementedError("real frame extraction requires ffmpeg")


class FakeDecoderBackend(DecoderBackend):
    def decode_image(self, payload: bytes, width: int, height: int) -> np.ndarray:
        seed = int.from_bytes(hashlib.blake2b(payload, digest_size=4).digest(), "little")
        return np.random.RandomState(seed).randint(
            0, 256, size=(max(height, 1), max(width, 1), 3), dtype=np.uint8
        )

    def decode_audio(self, payload: bytes, sample_rate: int, duration_ms: int) -> np.ndarray:
        seed = int.from_bytes(hashlib.blake2b(payload, digest_size=4).digest(), "little")
        n = max(1, int(max(sample_rate, 1) * max(duration_ms, 1) / 1000))
        return np.random.RandomState(seed).standard_normal(min(n, 480000)).astype(np.float32)

    def decode_video_frame(
        self, payload: bytes, t_ms: int, width: int, height: int
    ) -> np.ndarray:
        # frame content derives from (payload, timestamp) → deterministic
        # per frame, distinct across frames
        seed = int.from_bytes(
            hashlib.blake2b(payload + t_ms.to_bytes(8, "little"), digest_size=4).digest(),
            "little",
        )
        return np.random.RandomState(seed).randint(
            0, 256, size=(max(height, 1), max(width, 1), 3), dtype=np.uint8
        )


class ImageFeatureStage:
    """Actor-pool stage: decode → resize → global feature vector.

    Use: ``ds.map_batches(ImageFeatureStage, batch_size=32,
    concurrency=(2, 8), num_cpus=1, batch_format='pyarrow')``."""

    def __init__(self, target_size: int = 64, backend: DecoderBackend | None = None):
        self.size = target_size
        self.backend = backend or FakeDecoderBackend()

    def _resize(self, img: np.ndarray) -> np.ndarray:
        # nearest-neighbour resize without an image library
        h, w = img.shape[:2]
        ys = (np.arange(self.size) * h // self.size).clip(0, h - 1)
        xs = (np.arange(self.size) * w // self.size).clip(0, w - 1)
        return img[ys][:, xs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, ok = [], []
        for i in range(len(batch)):
            if batch.column("kind")[i].as_py() != "image":
                feats.append(None)
                ok.append(False)
                continue
            img = self.backend.decode_image(
                batch.column("payload")[i].as_py(),
                batch.column("width")[i].as_py() or 1,
                batch.column("height")[i].as_py() or 1,
            )
            small = self._resize(img).astype(np.float64) / 255.0
            # cheap global features: per-channel means + gradient energy
            f = np.concatenate(
                [small.mean(axis=(0, 1)), small.std(axis=(0, 1)),
                 [float(np.abs(np.diff(small.mean(axis=2), axis=0)).mean()),
                  float(np.abs(np.diff(small.mean(axis=2), axis=1)).mean())]]
            )
            feats.append(f.tolist())
            ok.append(True)
        return batch.append_column(
            "image_features", pa.array(feats, pa.list_(pa.float64()))
        ).append_column("decoded_ok", pa.array(ok, pa.bool_()))


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash of an RGB frame: 8×9 nearest-neighbour
    grayscale resample, horizontal-gradient signs, int64 bit pattern."""
    h, w = img.shape[:2]
    ys = (np.arange(8) * h // 8).clip(0, h - 1)
    xs = (np.arange(9) * w // 9).clip(0, w - 1)
    gray = img[ys][:, xs].astype(np.float64).mean(axis=2)
    bits = (gray[:, 1:] > gray[:, :-1]).flatten()
    val = np.uint64(0)
    for b in bits:
        val = (val << np.uint64(1)) | np.uint64(bool(b))
    iv = int(val)
    return iv - (1 << 64) if iv >= (1 << 63) else iv


class ImagePHashStage:
    """Actor-pool stage: decode → 8×9 grayscale → 64-bit dHash
    (difference hash: sign of the horizontal gradient), the standard
    perceptual fingerprint for image dedup — near-identical images
    (recompressed / lightly edited) land within a few bits of hamming
    distance under a REAL decoder; under the deterministic fake only
    byte-identical payloads collide, which still exercises the full
    banding/verify plan.  Emits ``phash`` as an int64 bit pattern
    (NULL for non-image rows), ready for
    :func:`stages.dedup.near_dup_fingerprints` — filter to
    ``kind == 'image'`` (or drop null ``phash``) first.

    Use: ``ds.filter(lambda r: r['kind'] == 'image').map_batches(
    ImagePHashStage, batch_size=32, concurrency=(2, 8), num_cpus=1,
    batch_format='pyarrow')``."""

    def __init__(self, backend: DecoderBackend | None = None):
        self.backend = backend or FakeDecoderBackend()

    def __call__(self, batch: pa.Table) -> pa.Table:
        # non-image rows get a NULL phash (a constant like 0 would make
        # every pair of unfiltered audio/video rows a hamming-0 "dup")
        hashes: list[int | None] = []
        ok = []
        for i in range(len(batch)):
            if batch.column("kind")[i].as_py() != "image":
                hashes.append(None)
                ok.append(False)
                continue
            img = self.backend.decode_image(
                batch.column("payload")[i].as_py(),
                batch.column("width")[i].as_py() or 1,
                batch.column("height")[i].as_py() or 1,
            )
            hashes.append(dhash64(img))
            ok.append(True)
        return batch.append_column(
            "phash", pa.array(hashes, pa.int64())
        ).append_column("phash_ok", pa.array(ok, pa.bool_()))


class VideoFrameHashStage:
    """Actor-pool stage: per video, sample ``num_frames`` frames at the
    SAME uniform midpoints as ``VideoFrameSampleStage`` and emit one
    EXPLODED row per (video, frame): ``(media_id, frame_idx,
    frame_phash)`` — the input shape for frame-level video dedup (two
    videos are near-dups when most same-index frame hashes agree).
    Non-video rows emit nothing."""

    def __init__(self, num_frames: int = 4, backend: DecoderBackend | None = None):
        self.num_frames = num_frames
        self.backend = backend or FakeDecoderBackend()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        fidx: list[int] = []
        ph: list[int] = []
        for i in range(len(batch)):
            if batch.column("kind")[i].as_py() != "video":
                continue
            dur = batch.column("duration_ms")[i].as_py() or 0
            w = batch.column("width")[i].as_py() or 1
            h = batch.column("height")[i].as_py() or 1
            payload = batch.column("payload")[i].as_py()
            mid = batch.column("media_id")[i].as_py()
            ts = [
                int(dur * (2 * j + 1) / (2 * self.num_frames))
                for j in range(self.num_frames)
            ]
            for j, t in enumerate(ts):
                frame = self.backend.decode_video_frame(payload, t, w, h)
                ids.append(mid)
                fidx.append(j)
                ph.append(dhash64(frame))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int64()),
                "frame_phash": pa.array(ph, pa.int64()),
            }
        )


class AudioFeatureStage:
    """Actor-pool stage: decode → frame → per-frame RMS envelope."""

    def __init__(self, frame_ms: int = 100, backend: DecoderBackend | None = None):
        self.frame_ms = frame_ms
        self.backend = backend or FakeDecoderBackend()

    def __call__(self, batch: pa.Table) -> pa.Table:
        envs = []
        for i in range(len(batch)):
            if batch.column("kind")[i].as_py() != "audio":
                envs.append(None)
                continue
            sr = batch.column("sample_rate")[i].as_py() or 16000
            samples = self.backend.decode_audio(
                batch.column("payload")[i].as_py(), sr, batch.column("duration_ms")[i].as_py() or 0
            )
            frame = max(1, sr * self.frame_ms // 1000)
            n = len(samples) // frame
            if n == 0:
                envs.append([])
                continue
            rms = np.sqrt((samples[: n * frame].reshape(n, frame) ** 2).mean(axis=1))
            envs.append(rms.astype(np.float64).tolist())
        return batch.append_column("rms_envelope", pa.array(envs, pa.list_(pa.float64())))


class AudioFingerprintStage:
    """Actor-pool stage: decode → 65-segment RMS envelope → 64-bit
    fingerprint (sign of the envelope's segment-to-segment change — the
    shape of the loudness curve, robust to uniform gain under a real
    decoder; the deterministic fake collides only identical payloads).
    Emits ``audio_fp`` as an int64 bit pattern (NULL for non-audio),
    ready for :func:`stages.dedup.near_dup_fingerprints` after
    filtering to ``kind == 'audio'``."""

    def __init__(self, backend: DecoderBackend | None = None):
        self.backend = backend or FakeDecoderBackend()

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps: list[int | None] = []
        for i in range(len(batch)):
            if batch.column("kind")[i].as_py() != "audio":
                fps.append(None)
                continue
            sr = batch.column("sample_rate")[i].as_py() or 16000
            samples = self.backend.decode_audio(
                batch.column("payload")[i].as_py(),
                sr,
                batch.column("duration_ms")[i].as_py() or 0,
            )
            n = len(samples)
            if n < 65:
                samples = np.pad(samples, (0, 65 - n))
                n = 65
            # 65 equal segments → 64 adjacent RMS comparisons
            edges = (np.arange(66) * n) // 65
            seg = np.add.reduceat(samples.astype(np.float64) ** 2, edges[:-1])
            widths = np.diff(edges)
            rms = np.sqrt(seg / np.maximum(widths, 1))
            bits = rms[1:] > rms[:-1]
            val = np.uint64(0)
            for b in bits:
                val = (val << np.uint64(1)) | np.uint64(bool(b))
            iv = int(val)
            fps.append(iv - (1 << 64) if iv >= (1 << 63) else iv)
        return batch.append_column("audio_fp", pa.array(fps, pa.int64()))


class VideoFrameSampleStage:
    """Actor-pool stage: sample N frames uniformly across the clip's
    duration, decode each, emit per-frame feature vectors + the sampled
    timestamps.  Frame decode is the expensive unit of work at scale —
    ``concurrency × batch_size × num_frames`` bounds in-flight decoded
    frames, so video batches stay SMALL (8-16 rows).

    Use: ``ds.map_batches(VideoFrameSampleStage, batch_size=8,
    concurrency=(2, 8), num_cpus=1, batch_format='pyarrow')``."""

    def __init__(
        self,
        num_frames: int = 4,
        target_size: int = 32,
        backend: DecoderBackend | None = None,
    ):
        self.num_frames = num_frames
        self.size = target_size
        self.backend = backend or FakeDecoderBackend()

    def _resize(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        ys = (np.arange(self.size) * h // self.size).clip(0, h - 1)
        xs = (np.arange(self.size) * w // self.size).clip(0, w - 1)
        return img[ys][:, xs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        all_ts, all_feats = [], []
        for i in range(len(batch)):
            if batch.column("kind")[i].as_py() != "video":
                all_ts.append(None)
                all_feats.append(None)
                continue
            dur = batch.column("duration_ms")[i].as_py() or 0
            w = batch.column("width")[i].as_py() or 1
            h = batch.column("height")[i].as_py() or 1
            payload = batch.column("payload")[i].as_py()
            # uniform sample: midpoints of num_frames equal spans
            ts = [int(dur * (2 * j + 1) / (2 * self.num_frames)) for j in range(self.num_frames)]
            feats = []
            for t in ts:
                frame = self.backend.decode_video_frame(payload, t, w, h)
                small = self._resize(frame).astype(np.float64) / 255.0
                feats.append(
                    np.concatenate([small.mean(axis=(0, 1)), small.std(axis=(0, 1))]).tolist()
                )
            all_ts.append(ts)
            all_feats.append(feats)
        return batch.append_column(
            "frame_ts_ms", pa.array(all_ts, pa.list_(pa.int64()))
        ).append_column(
            "frame_features", pa.array(all_feats, pa.list_(pa.list_(pa.float64())))
        )


def generate_media(num_rows: int, seed: int = 42, dup_frac: float = 0.0) -> pa.Table:
    """Deterministic synthetic media table in MEDIA_SCHEMA.

    ``dup_frac`` > 0 plants duplicate images: that fraction of image
    rows get the payload+dimensions of an earlier image row (chosen by
    the same seeded RNG), giving the image-dedup pipeline ground truth
    while default callers stay byte-stable."""
    rng = np.random.RandomState(seed)
    kinds, payloads, mimes, ws, hs, srs, durs = [], [], [], [], [], [], []
    for i in range(num_rows):
        kind = ["image", "audio", "video"][int(rng.randint(3))]
        kinds.append(kind)
        payloads.append(rng.bytes(int(rng.randint(200, 2000))))
        if kind == "image":
            mimes.append("image/png")
            ws.append(int(rng.randint(32, 512)))
            hs.append(int(rng.randint(32, 512)))
            srs.append(0)
            durs.append(0)
        elif kind == "audio":
            mimes.append("audio/wav")
            ws.append(0)
            hs.append(0)
            srs.append(16000)
            durs.append(int(rng.randint(500, 10000)))
        else:
            mimes.append("video/mp4")
            ws.append(int(rng.randint(64, 1920)))
            hs.append(int(rng.randint(64, 1080)))
            srs.append(0)
            durs.append(int(rng.randint(1000, 60000)))
    if dup_frac > 0:
        img_idx = [i for i, k in enumerate(kinds) if k == "image"]
        n_dups = int(len(img_idx) * dup_frac)
        for j in range(n_dups):
            # deterministic: j-th dup target copies from an earlier image
            dst = img_idx[len(img_idx) - 1 - j]
            src = img_idx[int(rng.randint(max(1, len(img_idx) - n_dups)))]
            if src == dst:
                continue
            payloads[dst] = payloads[src]
            ws[dst], hs[dst] = ws[src], hs[src]
        # video dups: copy payload + dims + duration so frame timestamps
        # (and thus every sampled frame) match the source exactly.
        # NOTE: these rng draws come AFTER the image draws, so image
        # planting (and its committed goldens) is unchanged
        vid_idx = [i for i, k in enumerate(kinds) if k == "video"]
        n_vdups = int(len(vid_idx) * dup_frac)
        for j in range(n_vdups):
            dst = vid_idx[len(vid_idx) - 1 - j]
            src = vid_idx[int(rng.randint(max(1, len(vid_idx) - n_vdups)))]
            if src == dst:
                continue
            payloads[dst] = payloads[src]
            ws[dst], hs[dst] = ws[src], hs[src]
            durs[dst] = durs[src]
        # audio dups: payload + sample_rate + duration (decode inputs).
        # rng draws come after the video draws → earlier planting stable
        aud_idx = [i for i, k in enumerate(kinds) if k == "audio"]
        n_adups = int(len(aud_idx) * dup_frac)
        for j in range(n_adups):
            dst = aud_idx[len(aud_idx) - 1 - j]
            src = aud_idx[int(rng.randint(max(1, len(aud_idx) - n_adups)))]
            if src == dst:
                continue
            payloads[dst] = payloads[src]
            srs[dst] = srs[src]
            durs[dst] = durs[src]
    return pa.table(
        {
            "media_id": pa.array(list(range(num_rows)), pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "sample_rate": pa.array(srs, pa.int32()),
            "duration_ms": pa.array(durs, pa.int64()),
        }
    )
