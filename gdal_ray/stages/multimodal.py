"""Multimodal column stages: opaque binary payloads + typed metadata.

Image decode is REAL for png/raw/jpeg/webp-lossless — pure-numpy codecs in
core.codecs / core.jpeg (baseline T.81) / core.vp8l (lossless VP8L).  Audio
decode is real for WAV — PCM/float/A-law/mu-law/IMA-ADPCM via core.audio;
perceptual codecs (mp3/ogg/flac) raise (no codec libs in this container).
Video frame sampling handles MJPEG-in-AVI via the JPEG core; other
containers/codecs raise.

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
    embedding stage would take (model load would go here in __init__).

    ``on_error="quarantine"`` routes rows whose payload is outside codec
    capability (``codecs.CapabilityError`` — e.g. interchange lossy
    ``VP8 `` WebP) to null features + a ``decode_error`` reason column
    instead of failing the batch, matching the reference driver layer's
    per-file "cannot open" semantics (a web-scraped catalog at 100 TB
    always contains a few).  Corrupt payloads still raise."""

    def __init__(self, on_error: str = "raise"):
        if on_error not in ("raise", "quarantine"):
            raise ValueError("on_error must be 'raise' or 'quarantine'")
        self.on_error = on_error
        # real model-backed variant would load weights here, once per actor
        self.hist_bins = np.linspace(0, 256, 17)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"image_id": batch.column("image_id").to_pylist(),
               "mean": [], "std": [], "hist": [], "ahash": []}
        errs: list[str] = []
        bts = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        for i in range(batch.num_rows):
            try:
                img = codecs.decode(bts[i], fmts[i])
            except codecs.CapabilityError as e:
                if self.on_error != "quarantine":
                    raise
                errs.append(e.reason or str(e))
                out["mean"].append(None)
                out["std"].append(None)
                out["hist"].append(None)
                out["ahash"].append(None)
                continue
            errs.append("")
            g = img if img.ndim == 2 else img.mean(axis=2)
            out["mean"].append(float(g.mean()))
            out["std"].append(float(g.std()))
            out["hist"].append(np.histogram(g, bins=self.hist_bins)[0].astype(np.int64).tolist())
            # 8×8 average hash (the classic phash-lite)
            from ..core.resample import resize
            small = resize(g.astype(np.float64), 8, 8, method="average")
            bits = (small > small.mean()).ravel()
            out["ahash"].append(int((bits.astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum()) - (1 << 63))
        cols = {"image_id": pa.array(out["image_id"]),
                "mean": pa.array(out["mean"], pa.float64()),
                "std": pa.array(out["std"], pa.float64()),
                "hist": pa.array(out["hist"], pa.list_(pa.int64(), 16)),
                "ahash": pa.array(out["ahash"], pa.int64())}
        if self.on_error == "quarantine":
            cols["decode_error"] = pa.array(errs, pa.string())
        return pa.table(cols)


class AudioDecodeStage:
    """REAL WAV decode — PCM 8/16/24/32-bit, IEEE float, A-law, mu-law and
    IMA-ADPCM (the common compressed WAV), all pure numpy via
    ``core.audio``: (audio_id, bytes) → (audio_id, sample_rate, n_samples,
    duration_s, rms).  Perceptual codecs (mp3/ogg/flac) still raise
    NotImplementedError — they need codec libs absent from this container;
    the actor plumbing is identical."""

    def __init__(self, target_sample_rate: int | None = None):
        # a model-backed stage would load its resampler/model here
        self.target_sample_rate = target_sample_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..core.audio import decode_wav
        ids, srs, ns, durs, rms = [], [], [], [], []
        for i in range(batch.num_rows):
            data = batch.column("bytes")[i].as_py()
            if not data.startswith(b"RIFF") or data[8:12] != b"WAVE":
                raise NotImplementedError(
                    "only WAV containers decode without codec libs; swap "
                    "in audio bindings for mp3/ogg/flac")
            xs, sr = decode_wav(data)
            x = xs.mean(axis=1) if xs.ndim == 2 and xs.shape[1] > 1 else xs.ravel()
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


# ---------- MJPEG-in-AVI (RIFF) — pure stdlib/numpy, no codec libs ----------
# Container layout per the public AVI RIFF spec (reference: frmts/ AVI
# handling is delegated to GDAL's raster drivers; the MJPEG frames reuse the
# same baseline T.81 core as core/jpeg.py).

def build_mjpeg_avi(frames, fps: float = 10.0, quality: int = 90) -> bytes:
    """Assemble an MJPEG AVI from a list of HxWx3 (or HxW) uint8 frames.
    Deterministic (fixed JPEG tables) — used as the synthetic video fixture
    and as a minimal video sink."""
    import struct
    from ..core import jpeg as _jpeg
    assert frames, "need at least one frame"
    h, w = frames[0].shape[:2]
    jpegs = [_jpeg.encode_jpeg(np.ascontiguousarray(f, dtype=np.uint8),
                               quality=quality) for f in frames]
    scale, rate = 1000, int(round(fps * 1000))

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    maxsz = max(len(j) for j in jpegs)
    avih = struct.pack("<14I", int(1e6 / fps), maxsz * int(fps), 0, 0x10,
                       len(jpegs), 0, 1, maxsz, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII4h",
            0, 0, 0, 0, scale, rate, 0, len(jpegs), maxsz, 0xFFFFFFFF, 0,
            0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) +
               lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_items = [chunk(b"00dc", j) for j in jpegs]
    movi = lst(b"movi", b"".join(movi_items))
    # idx1: (fourcc, flags=KEYFRAME, offset from 'movi' fourcc, size)
    idx, off = [], 4
    for j, it in zip(jpegs, movi_items):
        idx.append(b"00dc" + struct.pack("<III", 0x10, off, len(j)))
        off += len(it)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", b"".join(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_mjpeg_avi(data: bytes):
    """Walk an AVI RIFF container → (fps, [jpeg_bytes per frame]).  Accepts
    MJPG video streams ('00dc'/'00db' chunks); anything else raises."""
    import struct
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise NotImplementedError("not an AVI container (RIFF/'AVI ')")
    fps, jpegs, handler = None, [], None

    def walk(buf: bytes, pos: int, end: int):
        nonlocal fps, handler
        while pos + 8 <= end:
            fourcc = buf[pos:pos + 4]
            size = struct.unpack_from("<I", buf, pos + 4)[0]
            body0, body1 = pos + 8, pos + 8 + size
            if fourcc == b"LIST":
                walk(buf, body0 + 4, body1)
            elif fourcc == b"avih" and fps is None:
                us = struct.unpack_from("<I", buf, body0)[0]
                fps = 1e6 / us if us else None
            elif fourcc == b"strh" and buf[body0:body0 + 4] == b"vids":
                handler = buf[body0 + 4:body0 + 8]
                scale, rate = struct.unpack_from("<II", buf, body0 + 20)
                if scale:
                    fps = rate / scale
            elif fourcc in (b"00dc", b"00db"):
                jpegs.append(buf[body0:body1])
            pos = body1 + (size & 1)

    walk(data, 12, 8 + struct.unpack_from("<I", data, 4)[0])
    if handler not in (b"MJPG", b"mjpg", b"\x00\x00\x00\x00", None):
        raise NotImplementedError(
            f"AVI video handler {handler!r} needs codec libs; only MJPG "
            "decodes pure-numpy")
    for j in jpegs:
        if j[:2] != b"\xff\xd8":
            raise NotImplementedError("non-JPEG frame payload in AVI stream")
    return (fps or 30.0), jpegs


class VideoFrameSampleStage:
    """Video frame sampling (1 frame / n seconds) over MJPEG-in-AVI binary
    columns: (video_id, bytes) → (video_id, frame_idx, t_seconds,
    frame_png).  Real decode via the pure-numpy T.81 JPEG core; other
    containers/codecs raise NotImplementedError (no codec libs in this
    container).  Actor-pool stage: construct once per actor."""

    def __init__(self, every_n_seconds: float = 1.0, png_level: int = 1):
        self.every = float(every_n_seconds)
        self.png_level = png_level

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..core import jpeg as _jpeg
        vids, idxs, ts, pngs = [], [], [], []
        for i in range(batch.num_rows):
            vid = batch.column("video_id")[i].as_py()
            fps, jpegs = parse_mjpeg_avi(batch.column("bytes")[i].as_py())
            stride = max(1, int(round(self.every * fps)))
            for fi in range(0, len(jpegs), stride):
                img = _jpeg.decode_jpeg(jpegs[fi])
                vids.append(vid)
                idxs.append(fi)
                ts.append(fi / fps)
                pngs.append(codecs.encode_png(img, level=self.png_level))
        return pa.table({
            "video_id": pa.array(vids),
            "frame_idx": pa.array(idxs, pa.int32()),
            "t_seconds": pa.array(ts, pa.float64()),
            "frame_png": pa.array(pngs, pa.binary()),
        })


# ---------- perceptual hash (DCT pHash) ----------

_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (computed once per process)."""
    global _DCT32
    if _DCT32 is None or _DCT32.shape[0] != n:
        k = np.arange(n)
        m = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
        m[0] *= 1.0 / np.sqrt(2)
        _DCT32 = m * np.sqrt(2.0 / n)
    return _DCT32


def phash64(img: np.ndarray) -> int:
    """Classic DCT perceptual hash: 32x32 area-average luminance ->
    2-D DCT-II -> top-left 8x8 coefficients excluding DC -> bits =
    coefficient > median.  Returns a signed int64 (two's complement of
    the 64-bit hash; bit 63 is the last coefficient)."""
    from ..core.resample import resize
    g = img if img.ndim == 2 else \
        np.dot(img[:, :, :3].astype(np.float64), [0.299, 0.587, 0.114])
    small = resize(np.asarray(g, np.float64), 32, 32, method="average")
    m = _dct_matrix(32)
    coef = m @ small @ m.T
    block = coef[:8, :8].ravel()[1:]          # 63 ACs, DC dropped
    med = np.median(block)
    bits = np.concatenate([block > med, [False]])   # pad to 64
    h = int((bits.astype(np.uint64)
             << np.arange(64, dtype=np.uint64)).sum())
    return h - (1 << 63) if h >= (1 << 63) else h


def perceptual_hash(batch: pa.Table, *, bytes_col: str = "bytes",
                    fmt_col: str = "fmt",
                    id_col: str = "image_id") -> pa.Table:
    """Decode each payload and emit its 64-bit DCT pHash — feeds the
    hamming-bucket near-dup machinery (`dedup_phash`) with hashes
    computed from REAL pixels instead of a precomputed column."""
    bts = batch.column(bytes_col).to_pylist()
    fmts = batch.column(fmt_col).to_pylist()
    ids = batch.column(id_col).to_pylist()
    hashes = []
    for b, f in zip(bts, fmts):
        hashes.append(phash64(codecs.decode(b, f)))
    return pa.table({id_col: pa.array(ids),
                     "phash": pa.array(hashes, pa.int64())})
