"""BSB/KAP codec tests (frmts/bsb analog)."""

import numpy as np
import pytest

from gdal_ray.core import bsb as BSB


def _pal(n):
    rng = np.random.default_rng(1)
    return rng.integers(0, 256, (n, 3), np.uint8)


def test_bsb_roundtrip_runs_and_noise():
    rng = np.random.default_rng(2)
    a = np.zeros((20, 300), np.uint8)
    a[3, :] = rng.integers(0, 7, 300)               # noisy row
    a[5, 10:250] = 4                                # long run (ext bytes)
    a[7, ::2] = 6                                   # alternating
    pal = _pal(7)
    blob = BSB.encode_bsb(a, pal)
    back, bpal = BSB.decode_bsb(blob)
    assert np.array_equal(back, a)
    assert np.array_equal(bpal, pal)
    # runs actually compress vs one byte per pixel
    assert len(blob) < 20 * 300


def test_bsb_header_layout():
    a = np.zeros((2, 3), np.uint8)
    blob = BSB.encode_bsb(a, _pal(2))
    text = blob[:blob.find(b"\x1a\x00")].decode()
    assert "BSB/NA=UNKNOWN" in text and "RA=3,2" in text
    assert "RGB/1," in text and "RGB/2," in text
    assert "VER/3.0" in text


def test_bsb_depth7_zero_countbits():
    """127-entry palette -> depth 7, zero count bits: every run count
    travels in extension bytes."""
    rng = np.random.default_rng(3)
    a = rng.integers(0, 127, (6, 40), np.uint8)
    a[2, :] = 100
    pal = _pal(127)
    back, _ = BSB.decode_bsb(BSB.encode_bsb(a, pal))
    assert np.array_equal(back, a)


def test_bsb_rejects_oversized_palette():
    with pytest.raises(ValueError, match="127"):
        BSB.encode_bsb(np.zeros((2, 2), np.uint8), _pal(128))


def test_bsb_missing_terminator():
    with pytest.raises(ValueError, match="0x1A"):
        BSB.decode_bsb(b"BSB/RA=2,2\r\n")
