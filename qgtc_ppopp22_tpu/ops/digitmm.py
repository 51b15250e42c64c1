"""Arbitrary-bit GEMM on int8 digit planes — the hot compute kernel.

TPU-native equivalent of the reference's BMMA GEMM family
(``QGTC_layer_hidden`` / ``_col`` / ``QGTC_layer_output_*``,
``kernel.h:245-391, 651-1054``), operating on the
:class:`~qgtc_ppopp22_tpu.ops.digits.DigitTensor` compute format:

* ``C = sum_{d<nd_a, e<nd_b} dot(A_d, B_e) << 4*(d+e)`` — native int8
  MXU passes with int32 accumulation, exact integer math (at most 4
  passes for 8-bit x 8-bit vs the reference's 64 1-bit BMMA passes).
* Fused epilogue, exactly as the reference fuses it in-kernel
  (``kernel.h:347-389``): requantize the accumulator to ``out_bits``
  and split back into digit planes (bit-domain intermediates never
  round-trip through HBM in value form), or emit raw float32 for the
  output layer (``bitMM2Int`` semantics, ``kernel.h:920-930``).
* Zero-tile jumping over the left operand as a block-sparse
  scalar-prefetch grid (the reference's intended-but-dead skip logic,
  ``kernel.h:572-592``): skipped K-steps clamp the block index to the
  previously-resident tile, eliding both the DMA and the MXU work.

Layout note: both operands use one orientation (``[nd, rows, cols]``,
contraction = lhs cols x rhs rows), so any output composes as either
operand of a following multiply — the row/col-major split of the
reference (``bitMM2Bit`` vs ``bitMM2Bit_col``, ``QGTC_device.cu:223,
456``) exists only because BMMA demands a col-major B fragment.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qgtc_ppopp22_tpu.ops.bitgemm import TileMap
from qgtc_ppopp22_tpu.ops.bitpack import DIGIT_BITS, num_digits, round_up
from qgtc_ppopp22_tpu.ops.digits import (
    DigitTensor,
    lane_stack,
    lane_stackable,
    lane_unstack,
)

__all__ = [
    "digitmm_to_digits",
    "digitmm_to_f32",
    "digitmm_to_i32",
    "digit_lhs_tiles",
    "build_tile_map_digits",
    "zero_tile_stats_digits",
]


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _pick_tile(total: int, candidates) -> int:
    for c in candidates:
        if total % c == 0:
            return c
    raise ValueError(f"no tile in {candidates} divides {total}")


def digit_lhs_tiles(a: DigitTensor):
    """(tile_m, tile_k) granularity for sparse (zero-tile) schedules.

    Finer than the dense-path tiles on purpose: cluster-batch
    adjacencies skip ~0% of 512x512 tiles but ~20% of 256x256 ones
    (any single edge voids a skip, so smaller tiles find more holes —
    the reference skips 8x128-bit tiles for the same reason,
    ``kernel.h:572-592``).
    """
    _, mp, kp = a.digits.shape
    return _pick_tile(mp, (256, 128)), _pick_tile(kp, (256, 128))


def build_tile_map_digits(
    a: DigitTensor,
    tile_m: Optional[int] = None,
    tile_k: Optional[int] = None,
) -> TileMap:
    """Occupancy map over ``a``'s (tile_m x tile_k) digit tiles.

    Same schedule structure as the packed-domain
    :func:`~qgtc_ppopp22_tpu.ops.bitgemm.build_tile_map`: occupied
    K-tile indices first (in order), then the last valid index
    repeated so the pipeline revisits a resident block (no DMA) while
    the kernel skips the compute.
    """
    if tile_m is None or tile_k is None:
        am, ak = digit_lhs_tiles(a)
        tile_m = tile_m or am
        tile_k = tile_k or ak
    nd, mp, kp = a.digits.shape
    nm, nk = mp // tile_m, kp // tile_k
    tiles = a.digits.reshape(nd, nm, tile_m, nk, tile_k)
    occ = jnp.any(tiles != 0, axis=(0, 2, 4))
    kcnt = jnp.sum(occ, axis=1).astype(jnp.int32)
    order = jnp.argsort(~occ, axis=1, stable=True).astype(jnp.int32)
    t = jnp.arange(nk, dtype=jnp.int32)[None, :]
    clamp = jnp.minimum(t, jnp.maximum(kcnt - 1, 0)[:, None])
    kidx = jnp.take_along_axis(order, clamp, axis=1)
    return TileMap(kidx=kidx, kcnt=kcnt, tile_m=tile_m, tile_k=tile_k)


def zero_tile_stats_digits(
    a: DigitTensor,
    tile_m: Optional[int] = None,
    tile_k: Optional[int] = None,
) -> dict:
    """Zero-tile statistics (reference Fig. 8b counters, §2 N8)."""
    tm = build_tile_map_digits(a, tile_m, tile_k)
    total = int(tm.kidx.shape[0] * tm.kidx.shape[1])
    processed = int(jnp.sum(tm.kcnt))
    return {
        "total": total,
        "processed": processed,
        "ratio": processed / max(total, 1),
    }


def _make_kernel(
    nd_a, nd_b, out_bits, nk, tm, tk, tn, sparse, shift=0, raw_i32=False,
    b_stk=None,
):
    dot_dims = (((1,), (0,)), ((), ()))

    def kernel(kidx_ref, kcnt_ref, a_ref, b_ref, o_ref, acc_ref):
        i = pl.program_id(0)
        t = pl.program_id(2)

        @pl.when(t == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        def compute():
            acc = acc_ref[:]
            for d in range(nd_a):
                for e in range(nd_b):
                    part = jax.lax.dot_general(
                        a_ref[d],
                        b_ref[e],
                        dot_dims,
                        preferred_element_type=jnp.int32,
                    )
                    dig_shift = DIGIT_BITS * (d + e)
                    acc = acc + (part << dig_shift if dig_shift else part)
            acc_ref[:] = acc

        if sparse:
            @pl.when(t < kcnt_ref[i])
            def _guarded():
                compute()
        else:
            compute()

        @pl.when(t == nk - 1)
        def _epilogue():
            acc = acc_ref[:]
            if b_stk is not None:
                # B's two digit planes rode one lane tile (see
                # ops/digits.lane_stack); fold digit 1's partials
                # (lanes [s, s+rw)) back onto lanes [0, rw) with the
                # 16x digit weight and zero the garbage lanes.
                s, rw = b_stk
                acc = lane_unstack(
                    acc, s, rw,
                    lambda v, k: pltpu.roll(v, shift=k, axis=v.ndim - 1),
                )
            if out_bits is None:
                o_ref[:] = acc if raw_i32 else acc.astype(jnp.float32)
            else:
                ub = 1 << out_bits
                # Reference requantizer reduction (kernel.h:347-351):
                # clamp >ub to ub-1, negatives to 1, keep low out_bits.
                # Optional power-of-two pre-scale (see quantize.py).
                if shift:
                    acc = acc >> shift
                r = jnp.where(acc > ub, ub - 1, jnp.where(acc < 0, 1, acc))
                r = r & (ub - 1)
                for d in range(num_digits(out_bits)):
                    width = min(DIGIT_BITS, out_bits - d * DIGIT_BITS)
                    o_ref[d] = (
                        (r >> (d * DIGIT_BITS)) & ((1 << width) - 1)
                    ).astype(jnp.int8)

    return kernel


def _digitmm(
    a: DigitTensor,
    b: DigitTensor,
    out_bits: Optional[int],
    tile_map: Optional[TileMap],
    interpret: Optional[bool],
    tiles: Optional[tuple] = None,
    shift: int = 0,
    raw_i32: bool = False,
):
    M, Ka = a.shape
    Kb, N = b.shape
    if Ka != Kb:
        raise ValueError(f"contraction mismatch: {a.shape} @ {b.shape}")
    nd_a, mp, kp = a.digits.shape
    nd_b, kp_b, np_ = b.digits.shape
    if kp != kp_b:
        raise ValueError(f"padded K mismatch: lhs {kp} vs rhs {kp_b}")
    # int32 accumulator bound: the worst-case shifted digit product is
    # sum_{d,e} 15*15 * kp << 4(d+e); it must stay below 2^31 or the
    # exact-integer contract silently breaks (only reachable for 8-bit
    # x 8-bit operands once padded K exceeds ~33k).
    worst = sum(
        225 * (1 << (DIGIT_BITS * (d + e)))
        for d in range(nd_a)
        for e in range(nd_b)
    )
    if worst * kp >= (1 << 31):
        raise ValueError(
            f"padded K={kp} at {nd_a}x{nd_b} digit planes can "
            "overflow the int32 accumulator; split the contraction"
        )

    if tiles is not None:
        tm, tk, tn = tiles
        if tile_map is not None and (
            tile_map.tile_m != tm or tile_map.tile_k != tk
        ):
            raise ValueError(
                f"tile_map built for {(tile_map.tile_m, tile_map.tile_k)}, "
                f"tiles override says {(tm, tk)}"
            )
    elif tile_map is not None:
        # Sparse path: tiles follow the occupancy map's granularity —
        # finer K-tiles skip more zero blocks (see digit_lhs_tiles).
        tm, tk = tile_map.tile_m, tile_map.tile_k
        tn = _pick_tile(np_, (256, 128))
    else:
        # Dense path: large K-tiles amortize pipeline overheads; the
        # 1-bit M=K=4096 headline measures 39 us at tk=512 vs 26 us at
        # tk=2048 on v5e (HBM floor ~20 us).
        tm = _pick_tile(mp, (512, 256, 128))
        tk = _pick_tile(kp, (2048, 1024, 512, 256, 128))
        tn = _pick_tile(np_, (256, 128))
    if mp % tm or kp % tk or np_ % tn:
        raise ValueError(
            f"tiles {(tm, tk, tn)} do not divide padded dims "
            f"{(mp, kp, np_)}"
        )
    nm, nn, nk = mp // tm, np_ // tn, kp // tk

    if tile_map is not None:
        kidx, kcnt = tile_map.kidx, tile_map.kcnt
    else:
        kidx = jnp.broadcast_to(jnp.arange(nk, dtype=jnp.int32), (nm, nk))
        kcnt = jnp.full((nm,), nk, jnp.int32)

    # Lane-stack a 2-digit-plane RHS whose real width fits one lane
    # tile (8-bit B at the benchmark's N <= 64): each (d, e) pass pair
    # collapses to one MXU pass, with digit 1's partials recovered in
    # the epilogue (exact — see ops/digits.lane_stack/lane_unstack).
    b_dig = b.digits
    b_stk = None
    if lane_stackable(nd_b, N, np_) and tn == np_:
        s = round_up(N, 8)
        b_dig = lane_stack(
            b.digits[0], b.digits[1], s,
            lambda v, k: jnp.roll(v, k, axis=-1),
        )[None]
        b_stk = (s, N)
        nd_b = 1

    kernel = _make_kernel(
        nd_a, nd_b, out_bits, nk, tm, tk, tn,
        sparse=tile_map is not None, shift=shift, raw_i32=raw_i32,
        b_stk=b_stk,
    )

    def a_map(i, j, t, kidx_ref, kcnt_ref):
        return (0, i, kidx_ref[i, t])

    def b_map(i, j, t, kidx_ref, kcnt_ref):
        return (0, kidx_ref[i, t], j)

    if out_bits is None:
        out_shape = jax.ShapeDtypeStruct(
            (mp, np_), jnp.int32 if raw_i32 else jnp.float32
        )
        out_spec = pl.BlockSpec(
            (tm, tn), lambda i, j, t, *_: (i, j), memory_space=pltpu.VMEM
        )
    else:
        nd_o = num_digits(out_bits)
        out_shape = jax.ShapeDtypeStruct((nd_o, mp, np_), jnp.int8)
        out_spec = pl.BlockSpec(
            (nd_o, tm, tn),
            lambda i, j, t, *_: (0, i, j),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((nd_a, tm, tk), a_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((nd_b, tk, tn), b_map, memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
    )

    cost = pl.CostEstimate(
        flops=2 * mp * np_ * kp * nd_a * nd_b,
        bytes_accessed=a.digits.size + b.digits.size,
        transcendentals=0,
    )

    run = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=_interpret_default() if interpret is None else interpret,
    )
    out = run(kidx, kcnt, a.digits, b_dig)

    if out_bits is None:
        return out[:M, :N]
    return DigitTensor(digits=out, shape=(M, N), bits=out_bits)


def digitmm_to_digits(
    a: DigitTensor,
    b: DigitTensor,
    out_bits: int,
    tile_map: Optional[TileMap] = None,
    interpret: Optional[bool] = None,
    tiles: Optional[tuple] = None,
    shift: int = 0,
) -> DigitTensor:
    """Digit-domain GEMM, digit-domain output (``bitMM2Bit`` role).

    ``C_levels = requantize(A_levels @ B_levels >> shift, out_bits)``,
    returned as digit planes (requant + split fused in the kernel
    epilogue; ``shift=0`` is the exact reference semantics).
    ``tiles=(tm, tk, tn)`` overrides the tile heuristic (each must
    divide the corresponding padded extent).
    """
    return _digitmm(a, b, out_bits, tile_map, interpret, tiles, shift)


def digitmm_to_f32(
    a: DigitTensor,
    b: DigitTensor,
    tile_map: Optional[TileMap] = None,
    interpret: Optional[bool] = None,
    tiles: Optional[tuple] = None,
) -> jnp.ndarray:
    """Digit-domain GEMM, float32 output (``bitMM2Int`` role)."""
    return _digitmm(a, b, None, tile_map, interpret, tiles)


def digitmm_to_i32(
    a: DigitTensor,
    b: DigitTensor,
    tile_map: Optional[TileMap] = None,
    interpret: Optional[bool] = None,
    tiles: Optional[tuple] = None,
) -> jnp.ndarray:
    """Digit-domain GEMM, raw int32 accumulator output.

    For partial sums that are combined *outside* the kernel (ring
    aggregation shards, ``parallel/sharded.py``): int32 end to end, so
    exactness never depends on the f32 24-bit mantissa bound.
    """
    return _digitmm(a, b, None, tile_map, interpret, tiles, raw_i32=True)
