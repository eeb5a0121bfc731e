"""Morton (Z-order) codes for 2D cell coordinates.

TPU-native counterpart of the reference's morton layer (reference: src/sph/morton.rs).
The reference interleaves two 16-bit coordinates into a 32-bit Z-order key via a
256-entry lookup table (morton.rs:85-110) or bit-fiddling (morton.rs:38-51), plus
LITMAX/BIGMIN range-query helpers (morton.rs:151-182) used to skip empty key ranges.

Here the encode/decode are written as branch-free bit-fiddling that vectorizes on the
TPU VPU (a lookup table would be a gather — slower than 4 shift/mask ops on vector
units). They accept jnp or numpy int arrays of any shape.

`find_bigmin` is a host-side scalar helper (numpy ints): it exists for parity and for
the compressed-cell-list variant of the neighbor search; the default TPU neighbor
search (ops/neighborhood.py) uses contiguous row-major keys where range skipping is
unnecessary.
"""

import numpy as np
import jax.numpy as jnp

MORTON_XBITS = 0x5555_5555  # even bits carry x (reference: morton.rs:1-2)
MORTON_YBITS = 0xAAAA_AAAA  # odd bits carry y


def _part_1by1(x):
    """Spread the low 16 bits of x so there is a zero bit between each.

    Same bit-trick as reference morton.rs:38-45, vectorized.
    """
    x = x & 0x0000_FFFF
    x = (x | (x << 8)) & 0x00FF_00FF
    x = (x | (x << 4)) & 0x0F0F_0F0F
    x = (x | (x << 2)) & 0x3333_3333
    x = (x | (x << 1)) & 0x5555_5555
    return x


def _compact_1by1(x):
    """Inverse of _part_1by1 (reference: morton.rs:57-65)."""
    x = x & 0x5555_5555
    x = (x | (x >> 1)) & 0x3333_3333
    x = (x | (x >> 2)) & 0x0F0F_0F0F
    x = (x | (x >> 4)) & 0x00FF_00FF
    x = (x | (x >> 8)) & 0x0000_FFFF
    return x


def encode(x, y):
    """Interleave 16-bit x (even bits) and y (odd bits) into a 32-bit Morton key.

    Matches reference `morton::encode` (morton.rs:25-31, 47-51). Works on scalars or
    arrays (jnp or numpy). Inputs must be in [0, 2^16).
    """
    return (_part_1by1(y) << 1) | _part_1by1(x)


def decode_x(code):
    """Extract x from a Morton key (reference: morton.rs:68-71)."""
    return _compact_1by1(code)


def decode_y(code):
    """Extract y from a Morton key (reference: morton.rs:73-77)."""
    return _compact_1by1(code >> 1)


def is_in_rect_presplit(code, min_xbits, min_ybits, max_xbits, max_ybits):
    """Inclusive rect membership on a pre-split rect (reference: morton.rs:123-128).

    min/max are given as already-interleaved x/y bit masks (i.e. `part_1by1(coord)`
    or `part_1by1(coord) << 1`).
    """
    xbits = code & MORTON_XBITS
    ybits = code & MORTON_YBITS
    return (
        (xbits >= min_xbits)
        & (xbits <= max_xbits)
        & (ybits >= min_ybits)
        & (ybits <= max_ybits)
    )


def is_in_rect(code, min_x, min_y, max_x, max_y):
    """Inclusive rect membership for plain coordinates."""
    return is_in_rect_presplit(
        code,
        _part_1by1(min_x),
        _part_1by1(min_y) << 1,
        _part_1by1(max_x),
        _part_1by1(max_y) << 1,
    )


def find_bigmin(code_beyond_rect, rect_min_code, rect_max_code):
    """BIGMIN: smallest Morton code > `code_beyond_rect` that lies inside the rect.

    Host-side scalar implementation of the LITMAX/BIGMIN split algorithm (reference:
    morton.rs:130-182, after Tropf & Herzog 1981 via the Wikipedia Z-order-curve
    article). All arguments and the return value are python/numpy uint32 scalars.
    """
    code = np.uint32(code_beyond_rect)
    rmin = np.uint32(rect_min_code)
    rmax = np.uint32(rect_max_code)
    bigmin = np.uint32(0)

    # Walk bits from most significant to least; at each step classify (code, min, max)
    # bits and refine the search rectangle, same case table as morton.rs:151-182.
    for bit_pos in range(31, -1, -1):
        bit = np.uint32(1) << np.uint32(bit_pos)
        # mask of the remaining lower bits belonging to the same dimension as bit_pos
        dim_mask = np.uint32(MORTON_XBITS if bit_pos % 2 == 0 else MORTON_YBITS)
        low_mask = (bit - np.uint32(1)) & dim_mask

        code_bit = bool(code & bit)
        min_bit = bool(rmin & bit)
        max_bit = bool(rmax & bit)

        if not code_bit and not min_bit and not max_bit:
            continue
        if not code_bit and not min_bit and max_bit:
            # BIGMIN candidate: load min with "1000..." pattern in this dimension
            bigmin = np.uint32((rmin & ~low_mask & ~bit) | bit)
            # max gets "0111..." pattern
            rmax = np.uint32((rmax & ~bit) | low_mask)
        elif not code_bit and min_bit and max_bit:
            return rmin
        elif code_bit and not min_bit and not max_bit:
            return bigmin
        elif code_bit and not min_bit and max_bit:
            # min gets "1000..." pattern
            rmin = np.uint32((rmin & ~low_mask & ~bit) | bit)
        elif code_bit and min_bit and max_bit:
            continue
        else:
            # (min_bit and not max_bit) cannot happen for a valid rect
            raise ValueError("invalid morton rect: min bit set where max bit unset")
    return bigmin


def cell_key_morton(cx, cy):
    """Morton sort key for int32 cell coordinates, staying non-negative in int32.

    Coordinates are clamped to [0, 2^15) so the interleaved key never sets the sign
    bit; `jax.lax.sort` on int32 then orders keys correctly.
    """
    cx = jnp.clip(cx, 0, (1 << 15) - 1).astype(jnp.int32)
    cy = jnp.clip(cy, 0, (1 << 15) - 1).astype(jnp.int32)
    return encode(cx, cy)
