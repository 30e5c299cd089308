"""PDS3 + FARSITE LCP codec tests."""

import numpy as np
import pytest

from gdal_ray.core import pds as PDS
from gdal_ray.core import rawgrids as RG


@pytest.mark.parametrize("dt", [np.uint8, np.int16, np.uint16, np.int32,
                                np.float32, np.float64])
def test_pds_roundtrip_dtypes(dt):
    rng = np.random.default_rng(3)
    a = rng.integers(0, 100, size=(6, 9)).astype(dt)
    back, gt, nd = PDS.decode_pds(PDS.encode_pds(a))
    assert back.dtype == dt and np.array_equal(back, a)
    assert nd is None


def test_pds_multiband_and_label():
    cube = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    blob = PDS.encode_pds(cube)
    assert blob[:21] == b"PDS_VERSION_ID = PDS3"
    assert b"BAND_STORAGE_TYPE = BAND_SEQUENTIAL" in blob
    back, _, _ = PDS.decode_pds(blob)
    assert np.array_equal(back, cube)
    # data is big-endian band-sequential after the 2048-byte label
    v = np.frombuffer(blob, ">i2", count=1, offset=2048)[0]
    assert v == 0


def test_pds_record_pointer_variant():
    a = np.arange(6, dtype=np.uint8).reshape(2, 3)
    blob = PDS.encode_pds(a)
    # rewrite as record-number pointer: RECORD_BYTES=2048, ^IMAGE=2
    lbl = blob[:2048].decode().rstrip().replace(
        "^IMAGE = 2049 <BYTES>", "RECORD_BYTES = 2048\r\n^IMAGE = 2")
    blob2 = lbl.encode().ljust(2048) + blob[2048:]
    back, _, _ = PDS.decode_pds(blob2)
    assert np.array_equal(back, a)


def test_pds_rejects_foreign():
    with pytest.raises(ValueError, match="PDS_VERSION_ID"):
        PDS.decode_pds(b"CCSD3ZF0000100000001NJPL3IF0PDS200000001 = SFDU")


@pytest.mark.parametrize("nb", [5, 7, 8, 10])
def test_lcp_roundtrip_schemas(nb):
    rng = np.random.default_rng(nb)
    cube = rng.integers(-100, 3000, size=(nb, 4, 6)).astype(np.int16)
    gt = (500000.0, 30.0, 0.0, 4100000.0, 0.0, -30.0)
    blob = RG.encode_lcp(cube, gt=gt)
    assert len(blob) == 7316 + nb * 4 * 6 * 2
    back, bgt, _ = RG.decode_lcp(blob)
    assert np.array_equal(back, cube)
    np.testing.assert_allclose(bgt, gt)


def test_lcp_bip_interleave_and_flags():
    cube = np.arange(5 * 2 * 3, dtype=np.int16).reshape(5, 2, 3)
    blob = RG.encode_lcp(cube)
    import struct
    assert struct.unpack_from("<i", blob, 0)[0] == 20   # no crown fuels
    # first pixel: all 5 band values interleaved
    first = np.frombuffer(blob, "<i2", count=5, offset=7316)
    np.testing.assert_array_equal(first, cube[:, 0, 0])
    with pytest.raises(ValueError, match="5/7/8/10"):
        RG.encode_lcp(np.zeros((3, 2, 2), np.int16))
