"""Digit-domain working format: int8 base-16 digit planes.

Two-format architecture (the TPU answer to the reference's single
packed format):

* **Storage / transfer format** — packed uint32 bit-planes
  (:class:`~qgtc_ppopp22_tpu.ops.bitpack.BitTensor`): 8-32x smaller on
  HBM and over host->device / ICI links. This matches the reference's
  packed layouts (``kernel.h:75-242``) and its epoch-timing boundary,
  which transfers packed tensors per step (``main_qgtc.py:115``).
* **Compute format** — int8 *digit* planes (this module):
  ``digits[d]`` holds base-16 digit ``d`` of the quantized levels, so
  a w-bit x a-bit GEMM is ``ceil(w/4) * ceil(a/4)`` native int8 MXU
  passes: ``C = sum_{d,e} dot(A_d, B_e) << 4*(d+e)`` — exact integer
  arithmetic (digit values < 16, products < 256, int32 accumulation).

Why not compute straight from the packed form? Unpacking uint32
bit-planes inside the GEMM kernel costs ~3 VPU ops per operand
element; at the reference's benchmark shapes that is 2-3x more time
than simply DMA-ing the 8x-larger int8 digits from HBM (measured on
this chip: in-kernel-unpack GEMM ~41 us vs int8-operand GEMM ~27 us at
M=K=4096). The reference faces no such trade-off because Ampere BMMA
*consumes* packed bits natively (``bmma_sync`` b1 fragments,
``kernel.h:301-335``); the MXU consumes int8. So: bit-planes when
bytes move, digits when the MXU runs, one conversion per tensor
amortized across all its GEMM uses (the adjacency participates in 3-6
multiplies per model forward, ``main_qgtc.py:127-154``).

All digit tensors are zero-padded to multiples of 128 in both
dimensions (lane width / MXU tile); zero padding is exact (level 0
rows/cols contribute nothing and requantize to 0).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from qgtc_ppopp22_tpu.ops.bitpack import (
    DIGIT_BITS,
    LANE,
    BitTensor,
    num_digits,
    round_up,
    unpack_plane_words,
)

__all__ = [
    "DigitTensor",
    "to_digit_tensor",
    "digit_pack",
    "digit_unpack",
    "planes_stack_to_digits",
    "lane_stackable",
    "lane_stack",
    "lane_unstack",
]


def lane_stackable(ndigits: int, rw, padded_cols: int) -> bool:
    """True when a 2-digit-plane matrix of real width ``rw`` fits both
    planes side by side in ONE 128-lane tile. Wider matrices never
    win: beyond 128 padded columns a dot already spans multiple N
    tiles, so stacking would not reduce MXU passes."""
    return (
        ndigits == 2
        and rw is not None
        and padded_cols == LANE
        and 2 * round_up(int(rw), 8) <= LANE
    )


def lane_stack(d0, d1, s: int, roll):
    """Two base-16 digit planes -> ONE plane, digit 1 parked ``s``
    lanes to the right (``s = round_up(rw, 8)``). Lanes are disjoint
    (planes are zero beyond their real width ``rw <= s``), so values
    stay < 16 and the sum is lossless. A dot against the stacked plane
    computes both digits' partial products in one MXU pass, in
    separate output lanes. ``roll(v, k)`` must rotate the minor axis
    right by ``k`` (``jnp.roll`` outside kernels, ``pltpu.roll``
    inside)."""
    return d0 + roll(d1, s)


def lane_unstack(acc, s: int, rw: int, roll):
    """Fold a stacked dot's output lanes back: lanes [s, s+rw) hold
    digit 1's partials, worth 16x (``DIGIT_BITS``) more than digit
    0's in lanes [0, rw). Garbage lanes >= rw are zeroed so the
    result is indistinguishable from summing two separate dots with
    the 4-bit shift — exact int32 algebra."""
    u = acc + (roll(acc, acc.shape[-1] - s) << 4)
    lane = jax.lax.broadcasted_iota(jnp.int32, u.shape, u.ndim - 1)
    return jnp.where(lane < rw, u, 0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DigitTensor:
    """A logically (M, K) integer-level matrix as int8 digit planes.

    ``digits``: int8[ndigits, Mp, Kp] with Mp/Kp = next multiple of
    128; digit ``d`` holds bits ``4d .. 4d+3`` of each level.
    """

    digits: jax.Array
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    bits: int = dataclasses.field(metadata=dict(static=True))

    @property
    def ndigits(self) -> int:
        return self.digits.shape[0]

    @property
    def padded_rows(self) -> int:
        return self.digits.shape[1]

    @property
    def padded_cols(self) -> int:
        return self.digits.shape[2]

    def nbytes(self) -> int:
        return self.digits.size


def to_digit_tensor(bt: BitTensor) -> DigitTensor:
    """Packed bit-planes -> digit planes (device op, one VPU pass).

    The padded 256-multiple extents of the packed container are
    trimmed to 128 multiples (the trimmed region is zero padding).
    """
    M, K = bt.shape
    Mp, Kp = round_up(M, LANE), round_up(K, LANE)
    ones = unpack_plane_words(bt.planes)  # [bits, Mw*32, Kp256]
    nd = num_digits(bt.bits)
    out = []
    for d in range(nd):
        lo = d * DIGIT_BITS
        hi = min(lo + DIGIT_BITS, bt.bits)
        acc = ones[lo]
        for b in range(lo + 1, hi):
            acc = acc | (ones[b] << jnp.uint32(b - lo))
        out.append(acc[:Mp, :Kp].astype(jnp.int8))
    return DigitTensor(digits=jnp.stack(out), shape=(M, K), bits=bt.bits)


def planes_stack_to_digits(
    planes: jnp.ndarray, shape, bits: int
) -> jnp.ndarray:
    """Batched packed planes [B, bits, Mw, Kp] -> int8 digits
    [B, ndigits, Mp128, Kp128] in one vectorized pass (used to stage a
    whole epoch's batches with a single device round-trip)."""
    M, K = shape
    Mp, Kp = round_up(M, LANE), round_up(K, LANE)
    ones = unpack_plane_words(planes)  # [B, bits, Mw*32, Kp256]
    nd = num_digits(bits)
    out = []
    for d in range(nd):
        lo = d * DIGIT_BITS
        hi = min(lo + DIGIT_BITS, bits)
        acc = ones[:, lo]
        for b in range(lo + 1, hi):
            acc = acc | (ones[:, b] << jnp.uint32(b - lo))
        out.append(acc[:, :Mp, :Kp].astype(jnp.int8))
    return jnp.stack(out, axis=1)


def digit_pack(q: jnp.ndarray, bits: int) -> DigitTensor:
    """Integer levels (M, K) -> digit planes directly (no bit packing).

    Like the packers (``kernel.h:204-242``), only the low ``bits``
    bits of each level are kept (level ``2^bits`` wraps to 0).
    """
    M, K = q.shape
    Mp, Kp = round_up(max(M, 1), LANE), round_up(max(K, 1), LANE)
    q = jnp.pad(
        q.astype(jnp.uint32) & jnp.uint32((1 << bits) - 1),
        ((0, Mp - M), (0, Kp - K)),
    )
    nd = num_digits(bits)
    out = []
    for d in range(nd):
        width = min(DIGIT_BITS, bits - d * DIGIT_BITS)
        dig = (q >> jnp.uint32(d * DIGIT_BITS)) & jnp.uint32(
            (1 << width) - 1
        )
        out.append(dig.astype(jnp.int8))
    return DigitTensor(digits=jnp.stack(out), shape=(M, K), bits=bits)


def digit_unpack(dt: DigitTensor) -> jnp.ndarray:
    """Digit planes -> int32 levels (M, K)."""
    M, K = dt.shape
    vals = jnp.zeros(dt.digits.shape[1:], jnp.int32)
    for d in range(dt.ndigits):
        vals = vals + (
            dt.digits[d].astype(jnp.int32) << (d * DIGIT_BITS)
        )
    return vals[:M, :K]
