"""WAV audio decode — pure numpy/stdlib, no codec libraries.

Extends the engine's audio surface beyond stdlib ``wave`` (which only
accepts PCM): RIFF/WAVE container walk + decoders for

  fmt tag 1   PCM           8/16/24/32-bit integer
  fmt tag 3   IEEE float    float32 / float64
  fmt tag 6   A-law         ITU-T G.711 expansion table
  fmt tag 7   mu-law        ITU-T G.711 expansion table
  fmt tag 17  IMA ADPCM     (DVI/IMA 4-bit; the common compressed WAV)

All decoders return float64 samples in [-1, 1), shape (n, channels).

Scale note: IMA-ADPCM's sample recursion is sequential WITHIN a block but
blocks are independent (each starts with its own predictor/step header), so
the decoder vectorizes ACROSS blocks — the Python loop is over nibble
positions within one block (~505 iterations), each step a numpy op over all
blocks at once.  A 1-hour mono file (~28k blocks) decodes in one pass of
that loop, not 64M Python iterations.
"""

from __future__ import annotations

import struct

import numpy as np

# IMA/DVI ADPCM tables (public IMA reference algorithm, also in the
# Microsoft WAVE format spec for wFormatTag 0x0011).
IMA_INDEX_TABLE = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)
IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484,
    7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818,
    18500, 20350, 22385, 24623, 27086, 29794, 32767], dtype=np.int32)


def parse_wav_chunks(data: bytes) -> dict:
    """RIFF/WAVE walk → {'fmt': (tag, ch, rate, block_align, bits, extra),
    'data': bytes, 'fact_samples': int|None}."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    out: dict = {"fact_samples": None}
    pos, end = 12, 8 + struct.unpack_from("<I", data, 4)[0]
    end = min(end, len(data))
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            tag, ch, rate = struct.unpack_from("<HHI", body, 0)
            block_align, bits = struct.unpack_from("<HH", body, 12)
            extra = body[18:] if size > 16 else b""
            out["fmt"] = (tag, ch, rate, block_align, bits, extra)
        elif cid == b"data":
            out["data"] = body
        elif cid == b"fact" and size >= 4:
            out["fact_samples"] = struct.unpack_from("<I", body, 0)[0]
        pos += 8 + size + (size & 1)
    if "fmt" not in out or "data" not in out:
        raise ValueError("WAVE missing fmt/data chunk")
    return out


def _decode_pcm(raw: bytes, bits: int, ch: int) -> np.ndarray:
    if bits == 8:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif bits == 16:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 24:
        b = np.frombuffer(raw, dtype=np.uint8)
        b = b[: (len(b) // 3) * 3].reshape(-1, 3).astype(np.int32)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        x = v.astype(np.float64) / float(1 << 23)
    elif bits == 32:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / float(1 << 31)
    else:
        raise NotImplementedError(f"{bits}-bit PCM")
    return x[: (x.size // ch) * ch].reshape(-1, ch)


def _g711_mulaw_table() -> np.ndarray:
    u = np.arange(256, dtype=np.int64) ^ 0xFF
    sign = u >> 7
    exp = (u >> 4) & 7
    mant = u & 0x0F
    mag = ((mant << 3) + 0x84 << exp) - 0x84
    return np.where(sign == 1, -mag, mag).astype(np.float64) / 32768.0


def _g711_alaw_table() -> np.ndarray:
    a = np.arange(256, dtype=np.int64) ^ 0x55
    sign = a >> 7
    exp = (a >> 4) & 7
    mant = a & 0x0F
    mag = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << (exp - 1))
    # G.711 A-law: sign bit SET means positive (opposite of mu-law)
    return np.where(sign == 1, mag, -mag).astype(np.float64) / 32768.0


def decode_ima_adpcm(raw: bytes, ch: int, block_align: int) -> np.ndarray:
    """IMA ADPCM (WAVE tag 0x11) → float64 (n, ch).  Block layout per the
    WAVE spec: per channel a 4-byte header (int16 predictor, uint8 step
    index, uint8 pad), then nibble data interleaved in 4-byte groups per
    channel; low nibble is the earlier sample.  Vectorized across blocks."""
    nblocks = len(raw) // block_align
    if nblocks == 0:
        return np.empty((0, ch))
    blk = np.frombuffer(raw[: nblocks * block_align], dtype=np.uint8)
    blk = blk.reshape(nblocks, block_align)
    hdr = blk[:, : 4 * ch].reshape(nblocks, ch, 4)
    pred = (hdr[:, :, 0].astype(np.int32)
            | (hdr[:, :, 1].astype(np.int32) << 8))
    pred = np.where(pred >= 1 << 15, pred - (1 << 16), pred)  # (nb, ch)
    index = np.clip(hdr[:, :, 2].astype(np.int32), 0, 88)

    body = blk[:, 4 * ch:]                       # (nb, block_align - 4ch)
    ngroups = body.shape[1] // (4 * ch)
    body = body[:, : ngroups * 4 * ch].reshape(nblocks, ngroups, ch, 4)
    # nibble order within a channel's 4-byte group: b0lo b0hi b1lo ... b3hi
    nibs = np.empty((nblocks, ngroups, ch, 8), dtype=np.uint8)
    nibs[..., 0::2] = body & 0x0F
    nibs[..., 1::2] = body >> 4
    # time-major: (nsteps, nb, ch) where nsteps = ngroups*8
    nibs = nibs.transpose(1, 3, 0, 2).reshape(ngroups * 8, nblocks, ch)

    samples_per_block = 1 + ngroups * 8
    out = np.empty((samples_per_block, nblocks, ch), dtype=np.int32)
    out[0] = pred
    for t in range(nibs.shape[0]):
        n = nibs[t].astype(np.int32)
        step = IMA_STEP_TABLE[index]
        diff = step >> 3
        diff += np.where(n & 1, step >> 2, 0)
        diff += np.where(n & 2, step >> 1, 0)
        diff += np.where(n & 4, step, 0)
        pred = np.clip(np.where(n & 8, pred - diff, pred + diff),
                       -32768, 32767)
        index = np.clip(index + IMA_INDEX_TABLE[n], 0, 88)
        out[t + 1] = pred
    # (nsteps+1, nb, ch) → (nb*(nsteps+1), ch) in stream order
    x = out.transpose(1, 0, 2).reshape(-1, ch).astype(np.float64) / 32768.0
    return x


def encode_ima_adpcm(samples: np.ndarray, block_samples: int = 505) -> tuple[bytes, int]:
    """Mono IMA-ADPCM encoder (fixture/sink side) → (payload, block_align).
    block_samples must be 1 + 8k.  Vectorized across blocks like the
    decoder: the Python loop is per in-block sample position."""
    x = np.clip(np.round(np.asarray(samples, np.float64) * 32768.0),
                -32768, 32767).astype(np.int32)
    assert (block_samples - 1) % 8 == 0
    nsteps = block_samples - 1
    nblocks = (len(x) + block_samples - 1) // block_samples
    pad = nblocks * block_samples - len(x)
    if pad:
        x = np.concatenate([x, np.repeat(x[-1:] if len(x) else [0], pad)])
    xb = x.reshape(nblocks, block_samples)
    pred = xb[:, 0].copy()
    # per-block starting step index sized to the block's typical delta —
    # the header carries it, so this avoids the slew-up a zero index costs
    # while keeping blocks independent (and the encode vectorized)
    typ = np.median(np.abs(np.diff(xb, axis=1)), axis=1) if block_samples > 1 \
        else np.zeros(nblocks)
    index = np.clip(np.searchsorted(IMA_STEP_TABLE, typ).astype(np.int32), 0, 88)
    index0 = index.copy()
    nibs = np.empty((nblocks, nsteps), dtype=np.uint8)
    for t in range(nsteps):
        target = xb[:, t + 1]
        step = IMA_STEP_TABLE[index]
        diff = target - pred
        n = np.where(diff < 0, 8, 0).astype(np.int32)
        ad = np.abs(diff)
        b4 = (ad >= step).astype(np.int32)
        ad -= b4 * step
        b2 = (ad >= step >> 1).astype(np.int32)
        ad -= b2 * (step >> 1)
        b1 = (ad >= step >> 2).astype(np.int32)
        n |= (b4 << 2) | (b2 << 1) | b1
        # reconstruct exactly like the decoder
        dec = step >> 3
        dec += np.where(n & 1, step >> 2, 0)
        dec += np.where(n & 2, step >> 1, 0)
        dec += np.where(n & 4, step, 0)
        pred = np.clip(np.where(n & 8, pred - dec, pred + dec), -32768, 32767)
        index = np.clip(index + IMA_INDEX_TABLE[n], 0, 88)
        nibs[:, t] = n.astype(np.uint8)
    # pack: header (pred0 int16, index0=0, pad) + low-nibble-first bytes
    packed = (nibs[:, 0::2] | (nibs[:, 1::2] << 4)).astype(np.uint8)
    block_align = 4 + nsteps // 2
    out = bytearray()
    for b in range(nblocks):
        out += struct.pack("<hBB", int(xb[b, 0]), int(index0[b]), 0)
        out += packed[b].tobytes()
    return bytes(out), block_align


def make_wav(payload: bytes, *, tag: int, ch: int, rate: int,
             block_align: int, bits: int, fact_samples: int | None = None,
             extra: bytes = b"") -> bytes:
    """Assemble a RIFF/WAVE file around an encoded payload."""
    avg_bytes = rate * block_align if tag == 1 else max(1, rate * block_align // 1000)
    fmt = struct.pack("<HHIIHH", tag, ch, rate, avg_bytes,
                      block_align, bits) + (struct.pack("<H", len(extra)) + extra
                                            if (extra or tag != 1) else b"")
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt + (b"\x00" if len(fmt) & 1 else b"")
    if fact_samples is not None:
        chunks += b"fact" + struct.pack("<II", 4, fact_samples)
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Any supported WAV → (float64 samples (n, ch) in [-1,1), sample_rate)."""
    info = parse_wav_chunks(data)
    tag, ch, rate, block_align, bits, extra = info["fmt"]
    raw = info["data"]
    if tag == 1:
        x = _decode_pcm(raw, bits, ch)
    elif tag == 3:
        dt = "<f4" if bits == 32 else "<f8"
        v = np.frombuffer(raw, dtype=dt).astype(np.float64)
        x = v[: (v.size // ch) * ch].reshape(-1, ch)
    elif tag == 6:
        x = _g711_alaw_table()[np.frombuffer(raw, dtype=np.uint8)]
        x = x[: (x.size // ch) * ch].reshape(-1, ch)
    elif tag == 7:
        x = _g711_mulaw_table()[np.frombuffer(raw, dtype=np.uint8)]
        x = x[: (x.size // ch) * ch].reshape(-1, ch)
    elif tag in (17, 0x11):
        x = decode_ima_adpcm(raw, ch, block_align)
    else:
        raise NotImplementedError(
            f"WAVE format tag {tag} needs codec libs absent from this "
            "container (supported: PCM/float/A-law/mu-law/IMA-ADPCM)")
    n = info["fact_samples"]
    if n is not None and 0 < n <= len(x):
        x = x[:n]
    return x, rate
