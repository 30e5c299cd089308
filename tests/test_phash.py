"""DCT perceptual-hash tests."""

import numpy as np

from gdal_ray.core import codecs
from gdal_ray.stages.multimodal import _dct_matrix, phash64


def test_dct_matrix_is_orthonormal():
    m = _dct_matrix(32)
    np.testing.assert_allclose(m @ m.T, np.eye(32), atol=1e-12)


def test_phash_brightness_invariance_and_sensitivity():
    rng = np.random.default_rng(5)
    base = rng.integers(0, 200, (64, 64), np.uint8)
    h0 = phash64(base)
    # uniform brightness shift: AC coefficients unchanged -> same hash
    h1 = phash64(np.clip(base.astype(np.int64) + 40, 0, 255)
                 .astype(np.uint8))
    assert h0 == h1
    # small noise: small hamming distance
    noisy = np.clip(base.astype(np.int64)
                    + rng.integers(-6, 7, base.shape), 0, 255).astype(np.uint8)
    d = bin((h0 - (-(1 << 63)) if False else h0 ^ phash64(noisy))
            & (2**64 - 1)).count("1")
    assert d <= 10
    # structurally different image: large distance
    other = rng.integers(0, 200, (64, 64), np.uint8)
    d2 = bin((h0 ^ phash64(other)) & (2**64 - 1)).count("1")
    assert d2 > 16


def test_phash_rgb_and_codec_path():
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 255, (40, 40, 3), np.uint8)
    h_direct = phash64(rgb)
    # through a LOSSLESS codec: identical pixels -> identical hash
    blob = codecs.encode(rgb, "webp")
    h_codec = phash64(codecs.decode(blob, "webp"))
    assert h_direct == h_codec


def test_phash_stage(ray_session):
    import pyarrow as pa
    import ray

    from gdal_ray.stages.multimodal import perceptual_hash

    rng = np.random.default_rng(9)
    imgs = [rng.integers(0, 255, (24, 24), np.uint8) for _ in range(3)]
    tab = pa.table({
        "image_id": pa.array(["a", "b", "c"]),
        "bytes": pa.array([codecs.encode(i, "png") for i in imgs],
                          pa.binary()),
        "fmt": pa.array(["png"] * 3)})
    out = ray.data.from_arrow(tab).map_batches(
        perceptual_hash, batch_format="pyarrow").to_pandas()
    assert sorted(out["image_id"]) == ["a", "b", "c"]
    assert out["phash"].nunique() == 3
