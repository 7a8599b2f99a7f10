"""Float codec, ICF quantization, CRC32C tests."""

from __future__ import annotations

import numpy as np

from gridfour_spark import floatcodec as FC


def test_float_codec_round_trip_smooth():
    r, c = np.meshgrid(np.arange(40), np.arange(50), indexing="ij")
    v = (1000 * np.sin(r * 0.1) * np.cos(c * 0.07) + 0.125).astype(np.float32)
    packed = FC.encode_float_tile(v, 40, 50)
    back = FC.decode_float_tile(packed, 40, 50)
    np.testing.assert_array_equal(back, v)  # bit-exact lossless
    assert len(packed) < v.size * 4  # compresses vs raw float32


def test_float_codec_special_values():
    v = np.array(
        [0.0, -0.0, 1.5, -1.5, np.nan, np.inf, -np.inf, np.float32(1e-42), 3.4e38],
        dtype=np.float32,
    )
    grid = np.tile(v, 9)[:81].reshape(9, 9)
    back = FC.decode_float_tile(FC.encode_float_tile(grid, 9, 9), 9, 9)
    np.testing.assert_array_equal(back.view(np.uint32), grid.view(np.uint32))  # NaN-safe


def test_icf_round_trip_tolerance():
    """|decode(encode(v)) - v| <= 1.01/scale (PackageData.java:619-629)."""
    rng = np.random.default_rng(11)
    v = (rng.uniform(-8000, 8000, 10000)).astype(np.float32)
    for scale in (1.0, 10.0, 100.0):
        i = FC.icf_encode(v, scale)
        back = FC.icf_decode(i, scale)
        assert np.abs(back.astype(np.float64) - v.astype(np.float64)).max() <= 1.01 / scale


def test_crc32c_known_vectors():
    # RFC 3720 test vectors for CRC32C (Castagnoli)
    assert FC.crc32c(b"123456789") == 0xE3069283
    assert FC.crc32c(b"") == 0x0
    assert FC.crc32c(bytes(32)) == 0x8A9136AA  # 32 zero bytes
