"""core.audio: WAV container + PCM/float/G.711/IMA-ADPCM decoders.

Pins follow the public specs: G.711 (ITU) expansion values from the
classic Sun g711.c reference tables; IMA-ADPCM per the IMA/Microsoft
WAVE tag-0x11 block layout.  No Ray needed — pure core tests.
"""

import struct

import numpy as np
import pytest

from gdal_ray.core import audio as A


def _sine(sr=8000, secs=0.5, freq=440.0, amp=0.5):
    t = np.arange(int(sr * secs)) / sr
    return amp * np.sin(2 * np.pi * freq * t)


def test_pcm_widths_roundtrip():
    x = _sine()
    for bits, conv in [
        (8, lambda v: (np.round(v * 128) + 128).clip(0, 255).astype(np.uint8).tobytes()),
        (16, lambda v: np.round(v * 32768).clip(-32768, 32767).astype("<i2").tobytes()),
        (32, lambda v: np.round(v * (1 << 31)).clip(-(1 << 31), (1 << 31) - 1).astype("<i4").tobytes()),
    ]:
        wav = A.make_wav(conv(x), tag=1, ch=1, rate=8000,
                         block_align=bits // 8, bits=bits)
        y, sr = A.decode_wav(wav)
        assert sr == 8000 and y.shape == (len(x), 1)
        tol = {8: 1 / 128, 16: 1 / 32768, 32: 1e-9}[bits]
        assert np.abs(y[:, 0] - x).max() <= tol + 1e-12


def test_pcm24_signed():
    vals = np.array([0, 1, -1, (1 << 23) - 1, -(1 << 23)], dtype=np.int64)
    b = bytearray()
    for v in vals:
        b += int(v & 0xFFFFFF).to_bytes(3, "little")
    wav = A.make_wav(bytes(b), tag=1, ch=1, rate=8000, block_align=3, bits=24)
    y, _ = A.decode_wav(wav)
    np.testing.assert_allclose(y[:, 0] * (1 << 23), vals, atol=0)


def test_float32_and_stereo():
    x = _sine()
    inter = np.column_stack([x, -x]).astype("<f4")
    wav = A.make_wav(inter.tobytes(), tag=3, ch=2, rate=8000,
                     block_align=8, bits=32)
    y, _ = A.decode_wav(wav)
    assert y.shape == (len(x), 2)
    np.testing.assert_allclose(y[:, 0], x, atol=1e-7)
    np.testing.assert_allclose(y[:, 1], -x, atol=1e-7)


def test_g711_reference_pins():
    """Exact expansion values from the Sun g711.c reference decoder."""
    mu = A._g711_mulaw_table() * 32768.0
    assert mu[0xFF] == 0 and mu[0x7F] == 0          # +0 / -0
    assert mu[0x80] == 32124 and mu[0x00] == -32124  # extremes
    al = A._g711_alaw_table() * 32768.0
    assert al[0xD5] == 8 and al[0x55] == -8          # smallest magnitudes
    assert al[0xAA] == 32256 and al[0x2A] == -32256  # extremes
    # odd symmetry: flipping the sign bit negates (mu-law: bit7 of ~byte)
    b = np.arange(256, dtype=np.int64)
    np.testing.assert_array_equal(mu[b], -mu[b ^ 0x80])
    np.testing.assert_array_equal(al[b], -al[b ^ 0x80])


def test_g711_wav_rms():
    x = _sine()
    # encode crudely: pick nearest table entry (exhaustive 256-way argmin)
    for tag, table in [(7, A._g711_mulaw_table()), (6, A._g711_alaw_table())]:
        idx = np.abs(x[:, None] - table[None, :]).argmin(axis=1).astype(np.uint8)
        wav = A.make_wav(idx.tobytes(), tag=tag, ch=1, rate=8000,
                         block_align=1, bits=8)
        y, _ = A.decode_wav(wav)
        err = np.sqrt(((y[:, 0] - x) ** 2).mean())
        assert err < 0.01  # log-companded 8-bit: ~38 dB SNR on a sine


def test_ima_adpcm_roundtrip_snr():
    x = _sine(secs=1.0)
    payload, ba = A.encode_ima_adpcm(x, block_samples=505)
    wav = A.make_wav(payload, tag=17, ch=1, rate=8000, block_align=ba,
                     bits=4, fact_samples=len(x),
                     extra=struct.pack("<H", 505))
    y, sr = A.decode_wav(wav)
    assert sr == 8000 and y.shape == (len(x), 1)
    err = y[:, 0] - x
    snr = 10 * np.log10((x ** 2).mean() / max((err ** 2).mean(), 1e-30))
    assert snr > 25.0  # IMA 4-bit on a sine: typically 30+ dB


def test_ima_adpcm_block_independence():
    """Each block restarts from its own header: decoding a stream equals
    decoding its blocks separately."""
    x = _sine(secs=0.4, freq=997.0)
    payload, ba = A.encode_ima_adpcm(x, block_samples=105)
    full = A.decode_ima_adpcm(payload, 1, ba)
    parts = [A.decode_ima_adpcm(payload[i:i + ba], 1, ba)
             for i in range(0, len(payload), ba)]
    np.testing.assert_array_equal(full, np.vstack(parts))


def test_ima_adpcm_stereo_interleave():
    """Stereo blocks: per-channel 4-byte headers then alternating 4-byte
    nibble groups.  Build from two mono streams; channels decode
    independently."""
    L = _sine(secs=0.2, freq=300.0)
    R = _sine(secs=0.2, freq=700.0, amp=0.3)
    pl, ba = A.encode_ima_adpcm(L, block_samples=105)
    pr, _ = A.encode_ima_adpcm(R, block_samples=105)
    nblocks = len(pl) // ba
    out = bytearray()
    for b in range(nblocks):
        lb, rb = pl[b * ba:(b + 1) * ba], pr[b * ba:(b + 1) * ba]
        out += lb[:4] + rb[:4]
        for g in range(4, ba, 4):
            out += lb[g:g + 4] + rb[g:g + 4]
    y = A.decode_ima_adpcm(bytes(out), 2, 2 * ba)
    mono_l = A.decode_ima_adpcm(pl, 1, ba)[:, 0]
    mono_r = A.decode_ima_adpcm(pr, 1, ba)[:, 0]
    np.testing.assert_array_equal(y[:, 0], mono_l)
    np.testing.assert_array_equal(y[:, 1], mono_r)


def test_decode_wav_unknown_tag_raises():
    wav = A.make_wav(b"\x00" * 16, tag=85, ch=1, rate=8000,
                     block_align=1, bits=8)  # 0x55 = MPEG Layer 3
    with pytest.raises(NotImplementedError):
        A.decode_wav(wav)


def test_stage_decodes_adpcm_and_float(ray_session):
    import pyarrow as pa
    import ray.data

    from gdal_ray.stages.multimodal import AudioDecodeStage
    x = _sine(secs=0.25)
    payload, ba = A.encode_ima_adpcm(x, block_samples=505)
    adpcm = A.make_wav(payload, tag=17, ch=1, rate=8000, block_align=ba,
                       bits=4, fact_samples=len(x),
                       extra=struct.pack("<H", 505))
    f32 = A.make_wav(x.astype("<f4").tobytes(), tag=3, ch=1, rate=8000,
                     block_align=4, bits=32)
    tbl = pa.table({"audio_id": pa.array(["adpcm", "f32"]),
                    "bytes": pa.array([adpcm, f32], pa.binary())})
    rows = {r["audio_id"]: r for r in ray.data.from_arrow(tbl).map_batches(
        AudioDecodeStage, batch_format="pyarrow", concurrency=1).take_all()}
    ref_rms = 0.5 / np.sqrt(2)
    for k in ("adpcm", "f32"):
        assert rows[k]["sample_rate"] == 8000
        assert rows[k]["n_samples"] == len(x)
        assert abs(rows[k]["rms"] - ref_rms) < 5e-3
