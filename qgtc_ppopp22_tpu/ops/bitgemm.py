"""Arbitrary-bit GEMM on the MXU, with fused requantize+repack epilogue.

Equivalent of the reference's hot kernels (``QGTC_layer_hidden`` /
``QGTC_layer_hidden_col`` / ``QGTC_layer_output_*``,
``QGTC_module/kernel.h:245-391, 651-1054``), re-designed for TPU:

* The reference computes ``C = sum_{i<a_bit, j<w_bit} (A_i AND B_j)
  << (i+j)`` as ``a_bit*w_bit`` 1-bit BMMA passes, because Ampere
  tensor cores only expose a 1-bit ``bmma_sync``. The TPU MXU
  multiplies int8 natively, so we regroup bit-planes into base-16
  *digits* (values < 16 fit int8 exactly) and compute
  ``C = sum_{d,e} dot(A_d, B_e) << 4*(d+e)`` -- at most 4 MXU passes
  for 8-bit x 8-bit instead of 64 bit-passes, exact integer math.
* The requantize + bit-repack epilogue is fused in-kernel, exactly as
  the reference fuses it (``kernel.h:347-389``): intermediates never
  round-trip through HBM in value form.
* Zero-tile jumping (reference ``kernel.h:572-592`` -- dead code in the
  reference's production kernels, see ``kernel.h:304``) is a real
  block-sparse grid here: a precomputed per-(row-tile, k-tile)
  occupancy list drives a scalar-prefetch index map. Skipped steps
  clamp the block index to the previous tile, so Mosaic's pipeline
  revisit logic elides both the DMA and the MXU work.

Both operands are packed :class:`BitTensor`\\ s (the left packs its M
rows, the right packs its K rows); there is no row/col layout split --
that asymmetry existed only because BMMA requires a col-major B
fragment (reference ``kernel.h:75-106`` vs ``kernel.h:204-242``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qgtc_ppopp22_tpu.ops.bitpack import (
    DIGIT_BITS,
    ROWS_PER_WORD,
    BitTensor,
    num_digits,
)

__all__ = [
    "bitmm_to_bits",
    "bitmm_to_int",
    "TileMap",
    "build_tile_map",
    "zero_tile_stats",
    "flops_convention",
]


def flops_convention(m: int, n: int, k: int) -> int:
    """Logical FLOPs of a bit-GEMM, reference convention.

    The reference reports ``2*M*N*K`` regardless of bit width
    (``QGTC_device.cu:420-422``); kept for comparability.
    """
    return 2 * m * n * k


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Tile occupancy (zero-tile jumping)
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TileMap:
    """Block-sparse schedule over the left operand's (M-tile, K-tile) grid.

    ``kidx[i, t]`` is the t-th K-tile to visit for row-tile ``i``;
    entries past ``kcnt[i]`` repeat the last valid index so the Pallas
    pipeline re-uses the already-resident block (no DMA) while the
    kernel's ``pl.when`` guard skips the MXU work.
    """

    kidx: jax.Array  # int32[nm, nk]
    kcnt: jax.Array  # int32[nm]
    tile_m: int = dataclasses.field(metadata=dict(static=True))
    tile_k: int = dataclasses.field(metadata=dict(static=True))


def lhs_tiles(a: BitTensor):
    """(tile_m, tile_k) the GEMM will use for this left operand."""
    _, mw, kp = a.planes.shape
    tmw = _pick_tile(mw, (16, 8))
    tk = _pick_tile(kp, (512, 256))
    return tmw * ROWS_PER_WORD, tk


def build_tile_map(
    a: BitTensor, tile_m: Optional[int] = None, tile_k: Optional[int] = None
) -> TileMap:
    """Occupancy map of ``a``'s (tile_m x tile_k) tiles (jittable).

    A tile is "zero" when every packed word of every bit-plane inside
    it is zero -- the same criterion as the reference's uint4 OR-reduce
    + ballot over an 8x128 bit-tile (``kernel.h:572-586``), at TPU tile
    granularity.
    """
    if tile_m is None or tile_k is None:
        auto_m, auto_k = lhs_tiles(a)
        tile_m = auto_m if tile_m is None else tile_m
        tile_k = auto_k if tile_k is None else tile_k
    bits, mw, kp = a.planes.shape
    tmw = tile_m // ROWS_PER_WORD
    assert mw % tmw == 0 and kp % tile_k == 0, (a.planes.shape, tile_m, tile_k)
    nm, nk = mw // tmw, kp // tile_k
    tiles = a.planes.reshape(bits, nm, tmw, nk, tile_k)
    occ = jnp.any(tiles != 0, axis=(0, 2, 4))  # [nm, nk] bool
    kcnt = jnp.sum(occ, axis=1).astype(jnp.int32)

    # Stable argsort of (!occ) puts occupied tile indices first, in order.
    order = jnp.argsort(~occ, axis=1, stable=True).astype(jnp.int32)
    t = jnp.arange(nk, dtype=jnp.int32)[None, :]
    clamp = jnp.minimum(t, jnp.maximum(kcnt - 1, 0)[:, None])
    kidx = jnp.take_along_axis(order, clamp, axis=1)
    return TileMap(kidx=kidx, kcnt=kcnt, tile_m=tile_m, tile_k=tile_k)


def zero_tile_stats(
    a: BitTensor, tile_m: Optional[int] = None, tile_k: Optional[int] = None
) -> dict:
    """Zero-tile-jumping statistics (reference Figure 8b study).

    Equivalent of ``bitMM2Bit_base_cnt`` / ``bitMM2Bit_zerojump_cnt``
    (``kernel.h:394-648``): ``total`` counts every K-tile visit,
    ``processed`` only non-zero tiles. The reference's counters also
    multiply by the bit-pair and N-tile loop trip counts; those factors
    cancel in the processed/total ratio, which is what the study
    reports (``parse_counter.py:32-34``).
    """
    tm = build_tile_map(a, tile_m, tile_k)
    total = int(tm.kidx.shape[0] * tm.kidx.shape[1])
    processed = int(jnp.sum(tm.kcnt))
    return {
        "total": total,
        "processed": processed,
        "ratio": processed / max(total, 1),
    }


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _unpack_digits(planes_tile, bits: int, tile_rows_w: int, tile_cols: int):
    """uint32[bits, TMw, TK] planes tile -> list of int8[TM, TK] digits.

    In-kernel inverse of the row-packing in ``bitpack.pack_bits``:
    a sublane-only broadcast + reshape, no lane shuffles.
    """
    j_idx = jax.lax.broadcasted_iota(
        jnp.uint32, (tile_rows_w, ROWS_PER_WORD, tile_cols), 1
    )
    ones = []
    for b in range(bits):
        w = planes_tile[b]  # [TMw, TK] uint32
        bits_b = (w[:, None, :] >> j_idx) & jnp.uint32(1)
        ones.append(bits_b.reshape(tile_rows_w * ROWS_PER_WORD, tile_cols))
    digits = []
    for d in range(num_digits(bits)):
        lo = d * DIGIT_BITS
        hi = min(lo + DIGIT_BITS, bits)
        acc = ones[lo]
        for b in range(lo + 1, hi):
            acc = acc | (ones[b] << jnp.uint32(b - lo))
        digits.append(acc.astype(jnp.int8))
    return digits


def _make_kernel(
    a_bits: int,
    b_bits: int,
    out_bits: Optional[int],
    nk: int,
    tmw: int,
    tk: int,
    tkw: int,
    tn: int,
    sparse: bool,
):
    """Build the fused bit-GEMM kernel body.

    ``out_bits is None`` selects the float32 output variant (reference
    ``bitMM2Int``, ``kernel.h:816-1054``: raw integer accumulator
    stored as float, no requantization). Otherwise the epilogue
    requantizes to ``out_bits`` and repacks bit-planes in-kernel
    (reference ``kernel.h:347-389``).
    """
    tm = tmw * ROWS_PER_WORD
    dot_dims = (((1,), (0,)), ((), ()))

    def kernel(kidx_ref, kcnt_ref, a_ref, b_ref, o_ref, acc_ref):
        i = pl.program_id(0)
        t = pl.program_id(2)

        @pl.when(t == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        def compute():
            a_digits = _unpack_digits(a_ref, a_bits, tmw, tk)
            b_digits = _unpack_digits(b_ref, b_bits, tkw, tn)
            acc = acc_ref[:]
            for d, ad in enumerate(a_digits):
                for e, bd in enumerate(b_digits):
                    part = jax.lax.dot_general(
                        ad, bd, dot_dims, preferred_element_type=jnp.int32
                    )
                    shift = DIGIT_BITS * (d + e)
                    acc = acc + (part << shift if shift else part)
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
            if out_bits is None:
                o_ref[:] = acc.astype(jnp.float32)
            else:
                ub = 1 << out_bits
                # Reference requantizer reduction (kernel.h:347-351):
                # clamp >ub to ub-1, negatives to 1, keep low out_bits.
                r = jnp.where(acc > ub, ub - 1, jnp.where(acc < 0, 1, acc))
                r = r & (ub - 1)
                rr = r.reshape(tmw, ROWS_PER_WORD, tn)
                j_idx = jax.lax.broadcasted_iota(
                    jnp.int32, (tmw, ROWS_PER_WORD, tn), 1
                )
                # Pack in int32 (Mosaic can't reduce unsigned): each row
                # contributes a distinct power of two, so the int32 sum
                # wraps to the exact uint32 bit pattern; bitcast at the
                # end.
                for b in range(out_bits):
                    plane = (rr >> b) & 1
                    word = jnp.sum(plane << j_idx, axis=1, dtype=jnp.int32)
                    o_ref[b] = jax.lax.bitcast_convert_type(word, jnp.uint32)

    return kernel


def _pick_tile(total: int, candidates) -> int:
    for c in candidates:
        if total % c == 0:
            return c
    raise ValueError(f"no tile in {candidates} divides {total}")


def _bitmm(
    a: BitTensor,
    b: BitTensor,
    out_bits: Optional[int],
    tile_map: Optional[TileMap],
    interpret: Optional[bool],
):
    M, Ka = a.shape
    Kb, N = b.shape
    if Ka != Kb:
        raise ValueError(f"contraction mismatch: {a.shape} @ {b.shape}")
    a_bits, mw, kp = a.planes.shape
    b_bits, kw, np_ = b.planes.shape
    if kp != kw * ROWS_PER_WORD:
        raise ValueError(
            f"padded K mismatch: lhs {kp} vs rhs {kw * ROWS_PER_WORD}"
        )

    tmw = _pick_tile(mw, (16, 8))
    tm = tmw * ROWS_PER_WORD
    tk = _pick_tile(kp, (512, 256))
    tkw = tk // ROWS_PER_WORD
    tn = _pick_tile(np_, (256, 128))
    nm, nn, nk = mw // tmw, np_ // tn, kp // tk

    if tile_map is not None:
        if tile_map.tile_m != tm or tile_map.tile_k != tk:
            raise ValueError(
                f"tile_map built for {(tile_map.tile_m, tile_map.tile_k)}, "
                f"kernel uses {(tm, tk)}"
            )
        kidx, kcnt = tile_map.kidx, tile_map.kcnt
    else:
        kidx = jnp.broadcast_to(jnp.arange(nk, dtype=jnp.int32), (nm, nk))
        kcnt = jnp.full((nm,), nk, jnp.int32)

    kernel = _make_kernel(
        a_bits, b_bits, out_bits, nk, tmw, tk, tkw, tn,
        sparse=tile_map is not None,
    )

    def a_map(i, j, t, kidx_ref, kcnt_ref):
        return (0, i, kidx_ref[i, t])

    def b_map(i, j, t, kidx_ref, kcnt_ref):
        return (0, kidx_ref[i, t], j)

    def o_map(i, j, t, kidx_ref, kcnt_ref):
        return (0, i, j)

    if out_bits is None:
        out_shape = jax.ShapeDtypeStruct((mw * ROWS_PER_WORD, np_), jnp.float32)
        out_spec = pl.BlockSpec(
            (tm, tn),
            lambda i, j, t, *_: (i, j),
            memory_space=pltpu.VMEM,
        )
    else:
        out_shape = jax.ShapeDtypeStruct((out_bits, mw, np_), jnp.uint32)
        out_spec = pl.BlockSpec((out_bits, tmw, tn), o_map, memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((a_bits, tmw, tk), a_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_bits, tkw, tn), b_map, memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
    )

    n_digit_passes = num_digits(a_bits) * num_digits(b_bits)
    cost = pl.CostEstimate(
        flops=2 * (mw * ROWS_PER_WORD) * np_ * kp * n_digit_passes,
        bytes_accessed=a.planes.size * 4 + b.planes.size * 4,
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
    out = run(kidx, kcnt, a.planes, b.planes)

    if out_bits is None:
        return out[:M, :N]
    return BitTensor(planes=out, shape=(M, N), bits=out_bits)


def bitmm_to_bits(
    a: BitTensor,
    b: BitTensor,
    out_bits: int,
    tile_map: Optional[TileMap] = None,
    interpret: Optional[bool] = None,
) -> BitTensor:
    """Bit-domain GEMM, bit-domain output (reference ``bitMM2Bit``).

    ``C_levels = requantize(A_levels @ B_levels, out_bits)``, returned
    packed. Unifies the reference's row-major-out ``bitMM2Bit``
    (``QGTC_device.cu:211-266``) and col-major-out ``bitMM2Bit_col``
    (``QGTC_device.cu:441-489``): the TPU container is layout-free, so
    the output composes as either operand of a following multiply.
    Pass ``tile_map`` (from :func:`build_tile_map`) to enable zero-tile
    jumping over the left operand.
    """
    return _bitmm(a, b, out_bits, tile_map, interpret)


def bitmm_to_int(
    a: BitTensor,
    b: BitTensor,
    tile_map: Optional[TileMap] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Bit-domain GEMM, float32 output (reference ``bitMM2Int``).

    Raw integer accumulator cast to float32, no requantization
    (reference ``kernel.h:920-930``). Used for the output layer.
    """
    return _bitmm(a, b, None, tile_map, interpret)
