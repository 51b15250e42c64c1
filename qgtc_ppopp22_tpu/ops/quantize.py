"""Scalar quantization semantics, bit-for-bit faithful to the reference.

The reference quantizes floats to *unsigned* integer levels in
``[0, 2^bits]`` (reference ``QGTC_module/kernel.h:31-71``):

* ``clip(x, 0, 2^bits)`` with a quirky edge rule: values below the
  lower bound return ``lb + 1`` (i.e. 1, not 0) and values above the
  upper bound return ``ub - 1`` (``kernel.h:39-44``).
* round-to-nearest-even (CUDA ``__float2int_rn``, ``kernel.h:68``).
* A value exactly equal to ``2^bits`` survives clipping, rounds to
  ``2^bits``, and then *wraps to 0* when the low ``bits`` bit-planes
  are packed (the reference packer keeps only bits ``0..bits-1``,
  ``kernel.h:226-229``). We reproduce that wrap exactly.

The in-GEMM requantizer (``kernel.h:347-351`` calling
``quantize(val, out_bit, 1<<out_bit, 0)`` from ``kernel.h:31-37``)
algebraically reduces to: clamp values above ``2^out_bit`` to
``2^out_bit - 1``, clamp negatives to 1, pass everything else through
(the scale factor ``(1<<b)/(1<<b)`` cancels). ``requantize`` below is
that reduction; GEMM accumulators are always non-negative here (all
operand levels are >= 0) but the negative branch is kept for fidelity.
"""

from __future__ import annotations

import jax.numpy as jnp


def quantize(x: jnp.ndarray, bits: int) -> jnp.ndarray:
    """float -> int32 quantization levels, reference ``Quantize_val`` semantics.

    Mirrors ``kernel.h:49-71``: ``clip(x, 0, 2^bits)`` (with the lb+1 /
    ub-1 edge rule of ``kernel.h:39-44``) then round-to-nearest-even.
    Output values lie in ``[0, 2^bits]`` (inclusive upper edge wraps to
    0 at pack time, see module docstring).
    """
    if not (1 <= bits <= 8):
        raise ValueError(f"bits must be in [1, 8], got {bits}")
    ub = float(1 << bits)
    x = x.astype(jnp.float32)
    clipped = jnp.where(x < 0.0, 1.0, jnp.where(x > ub, ub - 1.0, x))
    # jnp.round is round-half-to-even, matching CUDA __float2int_rn.
    return jnp.round(clipped).astype(jnp.int32)


def requantize(
    acc: jnp.ndarray, out_bits: int, shift: int = 0
) -> jnp.ndarray:
    """int32 GEMM accumulator -> int32 levels, reference epilogue semantics.

    Mirrors ``quantize(val, out_bit, 1<<out_bit, 0)`` at
    ``kernel.h:347-351``: values above ``2^out_bits`` clamp to
    ``2^out_bits - 1``; a value exactly ``2^out_bits`` passes through
    (and wraps to 0 when packed to ``out_bits`` planes); negatives
    clamp to 1.

    ``shift`` is an OPTIONAL extension beyond the reference: the
    accumulator is right-shifted (floor-divided by ``2^shift``) before
    clamping — still exact integer arithmetic. The reference's
    unscaled requantizer saturates on any realistic neighbor sum
    (accumulators are sums of ~degree terms but the clamp ceiling is
    ``2^out_bits``), which is why its accuracy was never measurable;
    a calibrated power-of-two scale makes low-bit accuracy real while
    ``shift=0`` (default) preserves bit-exact reference semantics.
    """
    if not (1 <= out_bits <= 8):
        raise ValueError(f"out_bits must be in [1, 8], got {out_bits}")
    ub = 1 << out_bits
    acc = acc.astype(jnp.int32)
    if shift:
        acc = acc >> shift
    return jnp.where(acc > ub, ub - 1, jnp.where(acc < 0, 1, acc))


def requantize_wrapped(
    acc: jnp.ndarray, out_bits: int, shift: int = 0
) -> jnp.ndarray:
    """:func:`requantize` plus the pack-time wrap (level ``2^bits``
    -> 0, ``kernel.h:226-229``) — the effective levels the packed
    container would hold."""
    return requantize(acc, out_bits, shift) & ((1 << out_bits) - 1)


def dequantize_levels(q: jnp.ndarray) -> jnp.ndarray:
    """Integer levels -> float32.

    The reference never rescales on the way out: ``bitMM2Int`` stores
    the raw integer accumulator as float (``kernel.h:920-930``), so
    dequantization is a plain cast.
    """
    return q.astype(jnp.float32)
