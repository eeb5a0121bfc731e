"""Morton code tests, keyed to the reference's examples (src/sph/morton.rs:186-252)."""

import numpy as np

from yasph2d_tpu.ops import morton


def test_encode_examples():
    assert morton.encode(np.uint32(2), np.uint32(2)) == 12
    assert morton.encode(np.uint32(3), np.uint32(6)) == 45
    assert morton.encode(np.uint32(4), np.uint32(0)) == 16
    assert morton.encode(
        np.uint32(0b1111_0001_0010_0000), np.uint32(0b1001_1101_1000_1100)
    ) == np.uint32(0b1101_0111_1010_0011_1000_0100_1010_0000)


def test_decode_examples():
    assert morton.decode_x(np.uint32(12)) == 2
    assert morton.decode_y(np.uint32(12)) == 2
    assert morton.decode_x(np.uint32(45)) == 3
    assert morton.decode_y(np.uint32(45)) == 6
    assert morton.decode_x(np.uint32(16)) == 4
    assert morton.decode_y(np.uint32(16)) == 0
    big = np.uint32(0b1101_0111_1010_0011_1000_0100_1010_0000)
    assert morton.decode_x(big) == 0b1111_0001_0010_0000
    assert morton.decode_y(big) == 0b1001_1101_1000_1100


def test_encode_decode_roundtrip_vectorized():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 16, size=1000).astype(np.uint32)
    y = rng.integers(0, 1 << 16, size=1000).astype(np.uint32)
    code = morton.encode(x, y)
    np.testing.assert_array_equal(morton.decode_x(code), x)
    np.testing.assert_array_equal(morton.decode_y(code), y)


def test_find_bigmin_jumps_to_next_pos_in_rect():
    # Wikipedia Z-order curve example (reference: morton.rs:231-252)
    assert morton.find_bigmin(16, 12, 45) == 36
    assert morton.find_bigmin(19, 12, 45) == 36
    assert morton.find_bigmin(29, 12, 45) == 36
    assert morton.find_bigmin(35, 12, 45) == 36


def test_find_bigmin_within_rect_gives_next_in_rect():
    assert morton.find_bigmin(14, 12, 45) == 15


def test_find_bigmin_at_border_gives_next_in_rect():
    assert morton.find_bigmin(15, 12, 45) == 36


def test_is_in_rect():
    # rect spanned by morton codes 12 (x=2,y=2) .. 45 (x=3,y=6)
    assert morton.is_in_rect(np.uint32(13), 2, 2, 3, 6)
    assert not morton.is_in_rect(np.uint32(16), 2, 2, 3, 6)  # x=4 outside
