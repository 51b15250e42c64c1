"""Packed-operand GEMM: container round-trips and kernel exactness.

Validates the SWAR-unpack GEMM (``ops/packmm.py``) — the TPU
equivalent of the reference's packed-consuming BMMA kernels
(``kernel.h:245-391``) — by exact integer equality vs the NumPy
golden model.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from qgtc_ppopp22_tpu.ops.digits import digit_pack, digit_unpack
from qgtc_ppopp22_tpu.ops.packmm import (
    PackedTensor,
    build_tile_map_packed,
    pack_digit_tensor,
    pack_rows,
    pack_rows_np,
    packmm_to_digits,
    packmm_to_f32,
    packmm_to_packed,
    unpack_rows,
)
from tests.golden import bitmm_np, effective_levels


@pytest.mark.parametrize("bits", [1, 2, 3, 4, 5, 8])
def test_pack_rows_roundtrip(rng, bits):
    q = rng.integers(0, 1 << bits, (300, 150)).astype(np.int32)
    pt = pack_rows(jnp.asarray(q), bits)
    assert pt.padded_rows % 256 == 0 and pt.padded_cols % 128 == 0
    np.testing.assert_array_equal(np.asarray(unpack_rows(pt)), q)


@pytest.mark.parametrize("bits", [1, 2, 4, 8])
def test_pack_rows_np_matches_device(rng, bits):
    q = rng.integers(0, 1 << bits, (270, 140)).astype(np.int32)
    host = pack_rows_np(q, bits)
    dev = pack_rows(jnp.asarray(q), bits)
    np.testing.assert_array_equal(host, np.asarray(dev.words))


def test_pack_digit_tensor_roundtrip(rng):
    q = rng.integers(0, 16, (130, 200)).astype(np.int32)
    dt = digit_pack(jnp.asarray(q), 4)
    pt = pack_digit_tensor(dt)
    np.testing.assert_array_equal(np.asarray(unpack_rows(pt)), q)


@pytest.mark.parametrize(
    "a_bits,b_bits,out_bits",
    [(1, 1, 1), (1, 2, 2), (2, 2, 2), (4, 4, 4), (8, 8, 8), (3, 5, 4)],
)
def test_packmm_to_digits_exact(rng, a_bits, b_bits, out_bits):
    M, K, N = 300, 200, 70
    qa = rng.integers(0, 1 << a_bits, (M, K)).astype(np.int32)
    qb = rng.integers(0, 1 << b_bits, (K, N)).astype(np.int32)
    a = pack_rows(jnp.asarray(qa), a_bits)
    b = digit_pack(jnp.asarray(qb), b_bits)
    c = packmm_to_digits(a, b, out_bits)
    got = np.asarray(digit_unpack(c))
    want = bitmm_np(qa, qb, a_bits, b_bits, out_bits)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("a_bits,b_bits", [(1, 1), (2, 4), (8, 8)])
def test_packmm_to_f32_exact(rng, a_bits, b_bits):
    M, K, N = 290, 150, 90
    qa = rng.integers(0, 1 << a_bits, (M, K)).astype(np.int32)
    qb = rng.integers(0, 1 << b_bits, (K, N)).astype(np.int32)
    a = pack_rows(jnp.asarray(qa), a_bits)
    b = digit_pack(jnp.asarray(qb), b_bits)
    got = np.asarray(packmm_to_f32(a, b))
    want = bitmm_np(qa, qb, a_bits, b_bits, None)
    np.testing.assert_array_equal(got, want.astype(np.float32))


@pytest.mark.parametrize("a_bits,out_bits", [(1, 1), (2, 2), (4, 4), (8, 8)])
def test_packmm_to_packed_exact(rng, a_bits, out_bits):
    """Bit-in bit-out: the reference ``bitMM2Bit_profile`` shape."""
    M, K, N = 256, 256, 16
    qa = rng.integers(0, 1 << a_bits, (M, K)).astype(np.int32)
    qb = rng.integers(0, 1 << a_bits, (K, N)).astype(np.int32)
    a = pack_rows(jnp.asarray(qa), a_bits)
    b = digit_pack(jnp.asarray(qb), a_bits)
    c = packmm_to_packed(a, b, out_bits)
    assert isinstance(c, PackedTensor)
    got = np.asarray(unpack_rows(c))
    want = bitmm_np(qa, qb, a_bits, a_bits, out_bits)
    np.testing.assert_array_equal(got, want)


def test_packmm_shift_matches_golden(rng):
    M, K, N = 256, 256, 64
    qa = rng.integers(0, 4, (M, K)).astype(np.int32)
    qb = rng.integers(0, 4, (K, N)).astype(np.int32)
    a = pack_rows(jnp.asarray(qa), 2)
    b = digit_pack(jnp.asarray(qb), 2)
    c = packmm_to_digits(a, b, 2, shift=3)
    want = bitmm_np(qa, qb, 2, 2, 2, shift=3)
    np.testing.assert_array_equal(np.asarray(digit_unpack(c)), want)


def test_packmm_sparse_matches_dense(rng):
    M = K = 1024
    N = 64
    qa = rng.integers(0, 2, (M, K)).astype(np.int32)
    qa[:, :512] = 0
    qa[512:] = 0
    qb = rng.integers(0, 4, (K, N)).astype(np.int32)
    a = pack_rows(jnp.asarray(qa), 1)
    b = digit_pack(jnp.asarray(qb), 2)
    tm = build_tile_map_packed(a, tile_m=256, tile_k=256)
    assert int(np.sum(np.asarray(tm.kcnt))) < tm.kidx.size
    dense = packmm_to_digits(a, b, 2, tiles=(256, 256, 128))
    sparse = packmm_to_digits(a, b, 2, tile_map=tm)
    np.testing.assert_array_equal(
        np.asarray(digit_unpack(dense)), np.asarray(digit_unpack(sparse))
    )
    densef = packmm_to_f32(a, b, tiles=(256, 256, 128))
    sparsef = packmm_to_f32(a, b, tile_map=tm)
    np.testing.assert_array_equal(np.asarray(densef), np.asarray(sparsef))


@pytest.mark.parametrize("N", [13, 16, 64])
def test_packmm_lane_stacked_rhs_exact(rng, N):
    """8-bit B at real width <= 64 rides ONE lane tile inside the
    packed-operand kernel (``ops/digits.lane_stack``): digits, f32,
    packed output, and the sparse grid all stay bit-exact vs golden."""
    M, K = 512, 512
    qa = rng.integers(0, 1 << 8, (M, K)).astype(np.int32)
    qa[256:] = 0
    qa[:, 256:] = 0  # zero tiles so the sparse map skips
    qb = rng.integers(0, 1 << 8, (K, N)).astype(np.int32)
    a = pack_rows(jnp.asarray(qa), 8)
    b = digit_pack(jnp.asarray(qb), 8)
    assert b.digits.shape[0] == 2  # the stacked path is actually taken

    got = np.asarray(digit_unpack(packmm_to_digits(a, b, 4, shift=2)))
    want = bitmm_np(qa, qb, 8, 8, 4, shift=2)
    np.testing.assert_array_equal(got, want)

    gotf = np.asarray(packmm_to_f32(a, b))
    np.testing.assert_array_equal(
        gotf, bitmm_np(qa, qb, 8, 8, None).astype(np.float32)
    )

    gotp = np.asarray(unpack_rows(packmm_to_packed(a, b, 8)))
    np.testing.assert_array_equal(gotp, bitmm_np(qa, qb, 8, 8, 8))

    tmap = build_tile_map_packed(a, tile_m=256, tile_k=256)
    assert int(np.sum(np.asarray(tmap.kcnt))) < tmap.kidx.size
    sparse = packmm_to_digits(a, b, 4, shift=2, tile_map=tmap)
    np.testing.assert_array_equal(
        np.asarray(digit_unpack(sparse)), want
    )


def test_packmm_chain_composes(rng):
    """packed-out feeds the next GEMM's A; digit-out feeds its B."""
    bits = 2
    qa = rng.integers(0, 2, (256, 256)).astype(np.int32)
    qx = rng.integers(0, 4, (256, 128)).astype(np.int32)
    qw = rng.integers(0, 4, (128, 128)).astype(np.int32)
    a = pack_rows(jnp.asarray(qa), 1)
    x = pack_rows(jnp.asarray(qx), bits)
    w = digit_pack(jnp.asarray(qw), bits)
    xw_digits = packmm_to_digits(x, w, bits)  # rhs of the next GEMM
    axw = packmm_to_digits(a, xw_digits, bits)
    want = bitmm_np(qa, bitmm_np(qx, qw, bits, bits, bits), 1, bits, bits)
    np.testing.assert_array_equal(np.asarray(digit_unpack(axw)), want)
    # and packed output as the next lhs
    xw_packed = packmm_to_packed(x, w, bits)
    np.testing.assert_array_equal(
        np.asarray(unpack_rows(xw_packed))[:256, :128],
        bitmm_np(qx, qw, bits, bits, bits),
    )


def test_packmm_vs_digitmm_same_results(rng):
    from qgtc_ppopp22_tpu.ops.digitmm import digitmm_to_digits

    qa = rng.integers(0, 2, (512, 512)).astype(np.int32)
    qb = rng.integers(0, 4, (512, 64)).astype(np.int32)
    pa = pack_rows(jnp.asarray(qa), 1)
    da = digit_pack(jnp.asarray(qa), 1)
    b = digit_pack(jnp.asarray(qb), 2)
    via_pack = np.asarray(digit_unpack(packmm_to_digits(pa, b, 2)))
    via_digit = np.asarray(digit_unpack(digitmm_to_digits(da, b, 2)))
    np.testing.assert_array_equal(via_pack, via_digit)
