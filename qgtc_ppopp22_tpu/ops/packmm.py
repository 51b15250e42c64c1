"""Packed-operand GEMM: bit-packed A consumed directly by the kernel.

TPU-native equivalent of the reference's packed-operand BMMA kernels
(``QGTC_layer_hidden`` family, ``kernel.h:245-391``): where Ampere's
``bmma_sync`` consumes packed 1-bit fragments natively, the MXU eats
int8 — so the left operand is stored *bit-packed along M* and unpacked
in-kernel with SWAR ops that Mosaic overlaps completely with the MXU
passes (measured: unpack adds 0 ns over an unpack-free ablation).

Why this beats the int8-digit path at the reference's benchmark
shapes: at N<=32 the digit GEMM (``ops/digitmm.py``) is HBM-bound on
the M x K int8 left operand (16 MB at M=K=4096 ~ 20 us of DMA on
v5e); the packed form is ``8/field_bits``x smaller (2 MB at 1-bit),
turning the kernel MXU-bound (~12.8 us, 42 TFLOPs at 1-bit
M=K=4096/N=16 vs the reference's 40.6 on sm_86).

Layout (``PackedTensor``): per digit plane, values are packed
``P = 8 // f`` rows per byte (f = field bits: 1 for 1-bit, 2 for
2-bit, 4 otherwise), 4 bytes per int32 word, rows permuted within
fixed 256-row groups so that the in-kernel extraction

    slab_q = bitcast_i32_to_i8((W >> f*q) & repeat_mask(f))

lands logical rows in order after a sublane concat: Mosaic's
int32->int8 bitcast sends byte k of word-row i to int8-row 4i+k, so
group row ``q*(4*gw) + 4*i + k`` lives in bits ``[8k + f*q, 8k +
f*(q+1))`` of word row ``i`` (gw = group words = 256 / (32/f)).

The same trick in reverse packs the requantized output in the
epilogue (the reference's fused repack, ``kernel.h:357-389``), so
chained layers can stay in the packed domain end to end.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
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
    "PackedTensor",
    "PreparedRHS",
    "prepare_rhs",
    "field_width",
    "packed_signed",
    "pack_rows",
    "pack_rows_np",
    "pack_digit_tensor",
    "unpack_rows",
    "packmm_to_f32",
    "packmm_to_i32",
    "packmm_to_digits",
    "packmm_to_packed",
    "build_tile_map_packed",
]

PACK_GROUP = 256  # rows per permutation group (fixed, layout contract)
_MASKS = {1: 0x01010101, 2: 0x03030303, 4: 0x0F0F0F0F}

_OFFSET = 128  # signed-plane offset: stored byte = level - 128


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def field_width(bits: int) -> int:
    """Packed field bits per value within one digit plane.

    Bits 5-8 use ONE full-byte *signed* plane (``packed_signed``)
    instead of two base-16 digit planes: stored byte =
    ``level ^ 0x80`` = two's-complement ``level - 128``. A GEMM
    against it is a single int8 MXU pass plus an exact rank-1
    correction ``+ 128 * colsum(B_levels)`` applied in the epilogue
    (``A @ B = (A - 128J) @ B + 128 * colsum(B)``; padding rows are
    level 0 = -128 and cancel exactly against the correction). This
    is the TPU answer to the reference paying ``a_bit x w_bit``
    bit-serial BMMA passes (``kernel.h:292-342``): 8-bit drops from
    4 digit passes to 1.
    """
    if bits <= 2:
        return bits
    if bits <= DIGIT_BITS:
        return DIGIT_BITS
    return 8


def packed_signed(bits: int) -> bool:
    """True when the packed layout for ``bits`` is the single
    offset-signed byte plane (bits 5-8)."""
    return field_width(bits) == 8


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PackedTensor:
    """(M, K) integer levels, bit-packed along M per digit plane.

    ``words``: int32[nd, Mp // (32//f), Kp]; Mp = round_up(M, 256),
    Kp = round_up(K, 128). Each word packs ``32 // f`` rows of one
    digit plane (f = field_width(bits)), permuted within 256-row
    groups per the extraction layout above.

    Bits 5-8 (``packed_signed``) instead store ONE plain
    **int8[1, Mp, Kp]** plane of offset-signed bytes
    (``level ^ 0x80`` = ``level - 128``): at a byte per value there is
    nothing left to pack, and a plain int8 array feeds the MXU with
    zero in-kernel extraction work (the int32 word form would pay a
    bitcast shuffle per tile).
    """

    words: jax.Array
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    bits: int = dataclasses.field(metadata=dict(static=True))

    @property
    def ndigits(self) -> int:
        return self.words.shape[0]

    @property
    def rows_per_word(self) -> int:
        return 1 if packed_signed(self.bits) else 32 // field_width(self.bits)

    @property
    def padded_rows(self) -> int:
        return self.words.shape[1] * self.rows_per_word

    @property
    def padded_cols(self) -> int:
        return self.words.shape[2]

    def nbytes(self) -> int:
        return self.words.size * self.words.dtype.itemsize


def _group_perm(f: int) -> np.ndarray:
    """Logical row (within a 256-row group) stored at word-bit slot s.

    Slot ``s = q*(4*gw) + 4*i + k`` (extraction output order) holds
    logical row ``s`` — i.e. the PACKER must place logical row
    ``q*4*gw + 4*i + k`` into bits ``8k + f*q`` of word row ``i``.
    Returns ``rows[q, i, k] = q*4*gw + 4*i + k``.
    """
    P = 8 // f
    rpw = 32 // f
    gw = PACK_GROUP // rpw
    q, i, k = np.meshgrid(
        np.arange(P), np.arange(gw), np.arange(4), indexing="ij"
    )
    return q * (4 * gw) + 4 * i + k


def pack_rows_np(q: np.ndarray, bits: int) -> np.ndarray:
    """Host-side packer: int levels (M, K) -> int32 words
    [nd, Mp//rpw, Kp] (the :class:`PackedTensor` payload)."""
    f = field_width(bits)
    M, K = q.shape
    Mp, Kp = round_up(max(M, 1), PACK_GROUP), round_up(max(K, 1), 128)
    lv = np.zeros((Mp, Kp), np.uint32)
    lv[:M, :K] = q.astype(np.int64) & np.int64((1 << bits) - 1)
    if packed_signed(bits):
        # One offset-signed int8 plane: byte = level - 128.
        return (lv ^ np.uint32(_OFFSET)).astype(np.uint8).view(np.int8)[
            None
        ]
    P, rpw = 8 // f, 32 // f
    gw = PACK_GROUP // rpw
    nd = num_digits(bits)
    out = np.zeros((nd, Mp // rpw, Kp), np.uint32)
    shifts = (8 * np.arange(4)[None, None, :] + f * np.arange(P)[:, None, None])
    for d in range(nd):
        width = min(DIGIT_BITS, bits - d * DIGIT_BITS)
        dig = (lv >> np.uint32(d * DIGIT_BITS)) & np.uint32(
            (1 << width) - 1
        )
        # group rows -> [ngroups, P, gw, 4, Kp] in extraction order
        g = dig.reshape(Mp // PACK_GROUP, PACK_GROUP, Kp)
        g = g.reshape(-1, P, 4 * gw, Kp)[:, :, :, :]  # row = q*4gw + (4i+k)
        g = g.reshape(-1, P, gw, 4, Kp)
        words = np.bitwise_or.reduce(
            (g << shifts[None, :, :, :, None].astype(np.uint32)),
            axis=(1, 3),
        )
        out[d] = words.reshape(Mp // rpw, Kp)
    return out.view(np.int32)


def pack_rows(q: jnp.ndarray, bits: int) -> PackedTensor:
    """Device packer: int levels (M, K) -> :class:`PackedTensor`."""
    f = field_width(bits)
    M, K = q.shape
    Mp, Kp = round_up(max(M, 1), PACK_GROUP), round_up(max(K, 1), 128)
    lv = jnp.pad(
        q.astype(jnp.uint32) & jnp.uint32((1 << bits) - 1),
        ((0, Mp - M), (0, Kp - K)),
    )
    if packed_signed(bits):
        sb = (lv ^ jnp.uint32(_OFFSET)).astype(jnp.uint8)
        return PackedTensor(
            words=jax.lax.bitcast_convert_type(sb, jnp.int8)[None],
            shape=(M, K),
            bits=bits,
        )
    P, rpw = 8 // f, 32 // f
    gw = PACK_GROUP // rpw
    nd = num_digits(bits)
    shifts = jnp.asarray(
        8 * np.arange(4)[None, None, :] + f * np.arange(P)[:, None, None],
        jnp.uint32,
    )
    planes = []
    for d in range(nd):
        width = min(DIGIT_BITS, bits - d * DIGIT_BITS)
        dig = (lv >> jnp.uint32(d * DIGIT_BITS)) & jnp.uint32(
            (1 << width) - 1
        )
        g = dig.reshape(-1, P, gw, 4, Kp)
        words = jnp.sum(
            g << shifts[None, :, :, :, None],
            axis=(1, 3),
            dtype=jnp.uint32,
        )
        planes.append(words.reshape(Mp // rpw, Kp))
    words = jax.lax.bitcast_convert_type(jnp.stack(planes), jnp.int32)
    return PackedTensor(words=words, shape=(M, K), bits=bits)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PreparedRHS:
    """Pack-time RHS form for the signed-plane GEMM (bits 5-8 A).

    ``plane``: int8[Kp, Np] = B levels - 128 (padding rows/cols are
    level 0 = -128), with lane ``Np - 1`` overwritten by the constant
    1 — a dot against it emits ``rowsum(A_signed)`` in that output
    lane from the SAME MXU pass, so the rank-1 offset correction
    costs no extra compute. ``corr``: int32[8, Np], row 0 =
    ``128 * colsum(plane) + 128^2 * Kp`` — the remaining correction
    terms of ``A@B = (A-128)(B-128) + 128 rowsum(A-128) +
    128 colsum(B-128) + 128^2 K``, preassembled at pack time exactly
    as the reference packs weights once outside the epoch loop
    (``main_qgtc.py:108-110``).
    """

    plane: jax.Array
    corr: jax.Array
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    bits: int = dataclasses.field(metadata=dict(static=True))


def prepare_rhs(b: DigitTensor) -> PreparedRHS:
    """Build the :class:`PreparedRHS` form of a weight-like RHS.

    Requires a free lane (real width < padded width) for the ones
    column; callers with 128-multiple widths use the DigitTensor path.
    """
    K, N = b.shape
    nd, kp, np_ = b.digits.shape
    if round_up(max(N, 1), 8) >= np_:
        raise ValueError(
            f"prepare_rhs needs a free lane: N={N} fills the "
            f"{np_}-lane tile"
        )
    lv = jnp.zeros((kp, np_), jnp.int32)
    for e in range(nd):
        lv = lv + (b.digits[e].astype(jnp.int32) << (DIGIT_BITS * e))
    sb = lv - _OFFSET
    lane = jax.lax.broadcasted_iota(jnp.int32, sb.shape, 1)
    sb = jnp.where(lane == np_ - 1, 1, sb)
    corr0 = (jnp.sum(sb, axis=0, keepdims=True) << 7) + jnp.int32(
        _OFFSET * _OFFSET * kp
    )
    corr = jnp.concatenate(
        [corr0, jnp.zeros((7, np_), jnp.int32)], axis=0
    )
    return PreparedRHS(
        plane=sb.astype(jnp.int8), corr=corr, shape=(K, N), bits=b.bits
    )


def pack_digit_tensor(dt: DigitTensor) -> PackedTensor:
    """DigitTensor -> PackedTensor (device op)."""
    from qgtc_ppopp22_tpu.ops.digits import digit_unpack

    return pack_rows(digit_unpack(dt), dt.bits)


def unpack_rows(pt: PackedTensor) -> jnp.ndarray:
    """PackedTensor -> int32 levels (M, K) (host/test decoder)."""
    M, K = pt.shape
    if packed_signed(pt.bits):
        sb = jax.lax.bitcast_convert_type(pt.words[0], jnp.uint8)
        return (
            (sb ^ jnp.uint8(_OFFSET)).astype(jnp.int32)[:M, :K]
        )
    f = field_width(pt.bits)
    P, rpw = 8 // f, 32 // f
    gw = PACK_GROUP // rpw
    w = jax.lax.bitcast_convert_type(pt.words, jnp.uint32)
    nd, mw, Kp = w.shape
    vals = jnp.zeros((nd, mw * rpw, Kp), jnp.uint32)
    shifts = 8 * np.arange(4)[None, None, :] + f * np.arange(P)[:, None, None]
    g = w.reshape(nd, -1, gw, Kp)
    parts = (
        g[:, :, None, :, None, :] >> jnp.asarray(shifts, jnp.uint32)[
            None, None, :, :, :, None
        ]
    ) & jnp.uint32((1 << f) - 1)
    # parts: [nd, ngroups, P, gw, 4, Kp] -> group rows q*4gw + 4i + k
    vals = parts.reshape(nd, -1, P, 4 * gw, Kp).reshape(nd, mw * rpw, Kp)
    out = jnp.zeros((mw * rpw, Kp), jnp.int32)
    for d in range(nd):
        out = out + (vals[d].astype(jnp.int32) << (d * DIGIT_BITS))
    return out[:M, :K]


def build_tile_map_packed_np(
    words: np.ndarray,
    bits: int,
    tile_m: int = PACK_GROUP,
    tile_k: int = 256,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side (NumPy) zero-tile schedule over M-packed words.

    Built ONCE at pack time and shipped with the batch (the reference
    builds its occupancy inline in the kernel, ``kernel.h:572-586``;
    round 1 built it per step on device, whose argsort cost made the
    whole mechanism net-negative). Returns ``(kidx, kcnt)`` with the
    same clamped-tail schedule as :func:`build_tile_map_packed`.
    """
    rpw = 1 if packed_signed(bits) else 32 // field_width(bits)
    nd, mw, kp = words.shape
    mp = mw * rpw
    if tile_m % PACK_GROUP or mp % tile_m or kp % tile_k:
        raise ValueError((tile_m, tile_k, mp, kp))
    nm, nk = mp // tile_m, kp // tile_k
    tiles = words.reshape(nd, nm, tile_m // rpw, nk, tile_k)
    # signed planes encode level 0 as byte -128 (0x80)
    zw = np.int8(-128) if packed_signed(bits) else np.int32(0)
    occ = np.any(tiles != zw, axis=(0, 2, 4))
    kcnt = np.sum(occ, axis=1).astype(np.int32)
    order = np.argsort(~occ, axis=1, kind="stable").astype(np.int32)
    t = np.arange(nk, dtype=np.int32)[None, :]
    clamp = np.minimum(t, np.maximum(kcnt - 1, 0)[:, None])
    kidx = np.take_along_axis(order, clamp, axis=1)
    return kidx, kcnt


def build_tile_map_packed(
    pt: PackedTensor,
    tile_m: Optional[int] = None,
    tile_k: Optional[int] = None,
) -> TileMap:
    """Occupancy map over (tile_m x tile_k) tiles of a PackedTensor.

    Same schedule structure as ``digitmm.build_tile_map_digits``
    (reference zero-tile mechanism, ``kernel.h:572-592``): occupied
    K-tile indices first, tail clamped to the last valid index.
    """
    nd, mw, kp = pt.words.shape
    rpw = pt.rows_per_word
    mp = mw * rpw
    tile_m = tile_m or max(PACK_GROUP, mp // max(mp // 512, 1))
    tile_k = tile_k or (256 if kp % 256 == 0 else 128)
    if tile_m % PACK_GROUP or mp % tile_m or kp % tile_k:
        raise ValueError((tile_m, tile_k, mp, kp))
    nm, nk = mp // tile_m, kp // tile_k
    tiles = pt.words.reshape(nd, nm, tile_m // rpw, nk, tile_k)
    zw = (
        jnp.int8(-128)  # signed planes encode level 0 as 0x80
        if packed_signed(pt.bits)
        else jnp.int32(0)
    )
    occ = jnp.any(tiles != zw, axis=(0, 2, 4))
    kcnt = jnp.sum(occ, axis=1).astype(jnp.int32)
    order = jnp.argsort(~occ, axis=1, stable=True).astype(jnp.int32)
    t = jnp.arange(nk, dtype=jnp.int32)[None, :]
    clamp = jnp.minimum(t, jnp.maximum(kcnt - 1, 0)[:, None])
    kidx = jnp.take_along_axis(order, clamp, axis=1)
    return TileMap(kidx=kidx, kcnt=kcnt, tile_m=tile_m, tile_k=tile_k)


# ---------------------------------------------------------------------------
# In-kernel SWAR unpack / repack
# ---------------------------------------------------------------------------


def _i32_to_i8(x, interpret: bool):
    """int32 (m, n) -> int8 (4m, n); row 4i+k = byte k of word i."""
    if not interpret:
        return pltpu.bitcast(x, jnp.int8)
    m, n = x.shape
    b = jax.lax.bitcast_convert_type(x, jnp.int8)  # (m, n, 4)
    return jnp.transpose(b, (0, 2, 1)).reshape(4 * m, n)


def _i8_to_i32(x, interpret: bool):
    """int8 (4m, n) -> int32 (m, n), inverse of :func:`_i32_to_i8`."""
    if not interpret:
        return pltpu.bitcast(x, jnp.int32)
    m4, n = x.shape
    b = jnp.transpose(x.reshape(m4 // 4, 4, n), (0, 2, 1))
    return jax.lax.bitcast_convert_type(b, jnp.int32)


def _extract_groups(w, f: int, interpret: bool):
    """int32 word rows (mw, tk) -> int8 (mw * (32//f), tk) in logical
    row order (per-256-row-group extraction + sublane concat)."""
    P = 8 // f
    rpw = 32 // f
    gw = PACK_GROUP // rpw
    mw, tk = w.shape
    mask = _MASKS[f]
    out = []
    for gi in range(mw // gw):
        wg = w[gi * gw:(gi + 1) * gw, :]
        slabs = []
        for qf in range(P):
            e = (wg >> (f * qf)) & mask if qf else (wg & mask)
            slabs.append(_i32_to_i8(e, interpret))
        out.append(jnp.concatenate(slabs, axis=0) if P > 1 else slabs[0])
    return jnp.concatenate(out, axis=0) if len(out) > 1 else out[0]


def _pack_groups(r8, f: int, interpret: bool):
    """int8 (tm, tn) field values -> int32 (tm // (32//f), tn) words,
    inverse of :func:`_extract_groups`."""
    P = 8 // f
    rpw = 32 // f
    gw = PACK_GROUP // rpw
    tm, tn = r8.shape
    out = []
    for gi in range(tm // PACK_GROUP):
        rg = r8[gi * PACK_GROUP:(gi + 1) * PACK_GROUP, :]
        word = None
        for qf in range(P):
            e = _i8_to_i32(rg[qf * (4 * gw):(qf + 1) * (4 * gw), :], interpret)
            e = e << (f * qf) if qf else e
            word = e if word is None else word | e
        out.append(word)
    return jnp.concatenate(out, axis=0) if len(out) > 1 else out[0]


# ---------------------------------------------------------------------------
# GEMM
# ---------------------------------------------------------------------------

_DOT = (((1,), (0,)), ((), ()))


def _requant(acc, out_bits: int, shift: int):
    ub = 1 << out_bits
    if shift:
        acc = acc >> shift
    r = jnp.where(acc > ub, ub - 1, jnp.where(acc < 0, 1, acc))
    return r & (ub - 1)


def _packmm_signed_stream(
    a: PackedTensor,
    bp: PreparedRHS,
    out_bits: Optional[int],
    out_form: str,
    shift: int,
    raw_i32: bool,
    out_cols: Optional[int],
    interpret: bool,
):
    """Signed-plane A x PreparedRHS: ONE MXU pass per row chunk.

    A streams through a depth-4 revolving chunk buffer (manual
    ``make_async_copy``, the mega kernel's pattern — measured faster
    than the auto-pipelined grid at every Fig-8a shape); the ones-lane
    of the RHS makes the same dot emit ``rowsum(A-128)``, and the
    epilogue applies the full rank-1 offset correction, requantizes,
    and masks the padding lanes back to level 0 (chain-safe).
    """
    M, Ka = a.shape
    Kb, N = bp.shape
    if Ka != Kb:
        raise ValueError(f"contraction mismatch: {a.shape} @ {bp.shape}")
    _, mp, kp = a.words.shape
    kpb, np_ = bp.plane.shape
    if kp != kpb:
        raise ValueError(f"padded K mismatch: lhs {kp} vs rhs {kpb}")
    # int32 bound: dot + rowsum + colsum + constant, each <= 128^2 * kp
    if 4 * 128 * 128 * kp >= (1 << 31):
        raise ValueError(
            f"padded K={kp} can overflow the int32 accumulator; "
            "split the contraction"
        )
    if out_cols is not None and out_form == "digits":
        raise ValueError("out_cols is for terminal outputs (f32/packed)")
    ocp = (
        np_
        if out_cols is None
        else min(round_up(max(int(out_cols), 1), 8), np_)
    )
    if out_bits is None:
        nd_o = 1
        out_signed = False
    else:
        out_signed = out_form == "packed" and packed_signed(out_bits)
        nd_o = 1 if out_signed else num_digits(out_bits)
        f_o = field_width(out_bits)

    # Chunk size: 128-row chunks pipeline best at large M (measured
    # 25.7 vs 26.0 us at M=K=4096) but pay per-chunk overhead at
    # small M (4.1 vs 3.7 us at 1024); the low-bit packed epilogue
    # repacks per 256-row group, pinning its chunk to 256.
    low_bit_packed = out_bits is not None and out_form == "packed" and (
        not out_signed
    )
    chunk = 256 if (low_bit_packed or mp < 4096) else 128
    depth = 4
    while depth > 2 and depth * chunk * kp > (6 << 20):
        depth //= 2
    if depth * chunk * kp > (8 << 20):
        raise ValueError(
            f"K={kp} too large for the streaming buffer; "
            "use the DigitTensor RHS path"
        )
    nch = mp // chunk
    # Garbage lanes (>= N: ones-lane junk + pad-column artifacts) are
    # masked back to level 0 only when they survive into the stored
    # region; an out_cols slice at round8(N) == N already removes them.
    need_mask = ocp > round_up(max(N, 1), 8) or (N % 8 != 0) or (
        out_cols is None and np_ > N
    )

    def kern(b_ref, corr_ref, a_hbm, o_ref, a_vmem, sem):
        def copy(c, slot):
            return pltpu.make_async_copy(
                a_hbm.at[0, pl.ds(c * chunk, chunk), :],
                a_vmem.at[slot],
                sem.at[slot],
            )

        for c in range(min(depth, nch)):
            copy(c, c % depth).start()
        for c in range(nch):
            slot = c % depth
            copy(c, slot).wait()
            acc = jax.lax.dot_general(
                a_vmem[slot], b_ref[...], _DOT,
                preferred_element_type=jnp.int32,
            )
            if c + depth < nch:
                copy(c + depth, slot).start()
            rs = acc[:, np_ - 1 : np_]
            acc = acc + (rs << 7) + corr_ref[0:1, :]

            def mask(v, zero=0, force=False):
                # garbage lanes (>= N: ones-lane junk, pad-column
                # artifacts) back to level `zero` when they survive
                # into the stored region
                if not (need_mask or force):
                    return v
                lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
                return jnp.where(lane < N, v, zero)

            lo = c * chunk
            if out_bits is None:
                v = mask(acc)[:, 0:ocp]
                o_ref[pl.ds(lo, chunk), :] = (
                    v if raw_i32 else v.astype(jnp.float32)
                )
                continue
            r = _requant(acc, out_bits, shift)
            if out_form == "digits":
                for d in range(nd_o):
                    width = min(DIGIT_BITS, out_bits - d * DIGIT_BITS)
                    dig = (r >> (d * DIGIT_BITS)) & ((1 << width) - 1)
                    o_ref[d, pl.ds(lo, chunk), :] = mask(
                        dig, force=True
                    ).astype(jnp.int8)
            elif out_signed:
                o_ref[0, pl.ds(lo, chunk), :] = (
                    mask(r)[:, 0:ocp] - _OFFSET
                ).astype(jnp.int8)
            else:  # packed digit fields (low-bit out from a signed A)
                rpw_o = 32 // f_o
                for d in range(nd_o):
                    width = min(DIGIT_BITS, out_bits - d * DIGIT_BITS)
                    dig = mask(
                        (r >> (d * DIGIT_BITS)) & ((1 << width) - 1)
                    )[:, 0:ocp].astype(jnp.int8)
                    o_ref[d, pl.ds(lo // rpw_o, chunk // rpw_o), :] = (
                        _pack_groups(dig, f_o, interpret)
                    )

    if out_bits is None:
        out_shape = jax.ShapeDtypeStruct(
            (mp, ocp), jnp.int32 if raw_i32 else jnp.float32
        )
        out_spec = pl.BlockSpec(
            (mp, ocp), lambda: (0, 0), memory_space=pltpu.VMEM
        )
    elif out_form == "digits":
        out_shape = jax.ShapeDtypeStruct((nd_o, mp, np_), jnp.int8)
        out_spec = pl.BlockSpec(
            (nd_o, mp, np_), lambda: (0, 0, 0), memory_space=pltpu.VMEM
        )
    elif out_signed:
        out_shape = jax.ShapeDtypeStruct((1, mp, ocp), jnp.int8)
        out_spec = pl.BlockSpec(
            (1, mp, ocp), lambda: (0, 0, 0), memory_space=pltpu.VMEM
        )
    else:
        rpw_o = 32 // f_o
        out_shape = jax.ShapeDtypeStruct(
            (nd_o, mp // rpw_o, ocp), jnp.int32
        )
        out_spec = pl.BlockSpec(
            (nd_o, mp // rpw_o, ocp), lambda: (0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    run = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec((kp, np_), lambda: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, np_), lambda: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # A streams from HBM
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((depth, chunk, kp), jnp.int8),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=a.nbytes() + bp.plane.size,
            transcendentals=0,
        ),
        interpret=interpret,
    )
    out = run(bp.plane, bp.corr, a.words)

    if out_bits is None:
        return out[:M, :N]
    if out_form == "digits":
        return DigitTensor(digits=out, shape=(M, N), bits=out_bits)
    return PackedTensor(words=out, shape=(M, N), bits=out_bits)


def _packmm(
    a: PackedTensor,
    b: DigitTensor,
    out_bits: Optional[int],
    out_form: str,
    tile_map: Optional[TileMap],
    interpret: Optional[bool],
    tiles: Optional[tuple],
    shift: int,
    raw_i32: bool = False,
    out_cols: Optional[int] = None,
):
    interpret = _interpret_default() if interpret is None else interpret
    if isinstance(b, PreparedRHS):
        if not packed_signed(a.bits):
            raise ValueError(
                "PreparedRHS pairs with a signed-plane A (bits 5-8)"
            )
        if tile_map is not None or tiles is not None:
            raise ValueError(
                "PreparedRHS runs the dense streaming kernel; pass a "
                "DigitTensor RHS for sparse/tiled schedules"
            )
        return _packmm_signed_stream(
            a, b, out_bits, out_form, shift, raw_i32, out_cols, interpret
        )
    M, Ka = a.shape
    Kb, N = b.shape
    if Ka != Kb:
        raise ValueError(f"contraction mismatch: {a.shape} @ {b.shape}")
    f = field_width(a.bits)
    a_signed = packed_signed(a.bits)
    rpw = 1 if a_signed else 32 // f
    nd_a, mw, kp = a.words.shape
    nd_b, kp_b, np_ = b.digits.shape
    mp = mw * rpw
    if kp != kp_b:
        raise ValueError(f"padded K mismatch: lhs {kp} vs rhs {kp_b}")
    # int32 accumulator bound (see digitmm.py): worst-case shifted
    # digit products must stay below 2^31 for exactness.
    if a_signed:
        # |a_s| <= 128, B levels <= 255, plus the same-magnitude
        # rank-1 correction term.
        worst = 2 * 128 * 255
    else:
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
    elif tile_map is not None:
        tm, tk = tile_map.tile_m, tile_map.tile_k
        tn = 256 if np_ % 256 == 0 else 128
    elif a_signed:
        # Signed-plane A moves 1 byte/value — at the benchmark shapes
        # the kernel is HBM-bound, so split K into >= 2 grid steps so
        # the next word block's DMA overlaps this block's MXU pass
        # (the whole-A single-step schedule serializes DMA and
        # compute; measured 2x slower at M=K=4096).
        tn = 256 if np_ % 256 == 0 else 128
        tm = mp
        while (
            tm > PACK_GROUP
            and tm * min(kp, 2048) > (6 << 20)
            and tm % 2 == 0
            and (tm // 2) % PACK_GROUP == 0
            and mp % (tm // 2) == 0
        ):
            tm //= 2
        tk = kp
        while (
            tk > 512
            and tm * tk > (6 << 20)
            and tk % 2 == 0
            and (tk // 2) % 128 == 0
            and kp % (tk // 2) == 0
        ):
            tk //= 2
    else:
        # Whole-M tiles when the VMEM budget allows: the unpacked
        # per-digit a-tile (tm x tk int8) is the dominant transient
        # (measured best at M=K=4096 1-bit: tm=tk=4096, 42 TFLOPs).
        # The 16M allowance is empirically at the scoped-VMEM edge and
        # only proven for single-digit A with 128-lane outputs;
        # multi-digit operands and wider N tiles carry bigger
        # word/B/acc blocks and get a conservative allowance (16M
        # tips the 16 MB scoped limit at 8-bit M=K=4096 and at
        # 1-bit N=256).
        tn = 256 if np_ % 256 == 0 else 128
        budget = (16 << 20) if (nd_a == 1 and tn <= 128) else (10 << 20)
        tm = mp
        while (
            tm > PACK_GROUP
            and nd_a * tm * min(kp, 4096) > budget
            and tm % 2 == 0
            and (tm // 2) % PACK_GROUP == 0
            and mp % (tm // 2) == 0
        ):
            tm //= 2
        tk = kp
        while (
            tk > 512
            and nd_a * tm * tk > budget
            and tk % 2 == 0
            and (tk // 2) % 128 == 0
            and kp % (tk // 2) == 0
        ):
            tk //= 2
    if mp % tm or kp % tk or np_ % tn or tm % PACK_GROUP:
        raise ValueError(
            f"tiles {(tm, tk, tn)} do not divide padded dims "
            f"{(mp, kp, np_)} (tm must be a multiple of {PACK_GROUP})"
        )
    if tile_map is not None and (tile_map.tile_m, tile_map.tile_k) != (tm, tk):
        raise ValueError(
            f"tile_map built for {(tile_map.tile_m, tile_map.tile_k)}, "
            f"kernel uses {(tm, tk)}"
        )
    nm, nn, nk = mp // tm, np_ // tn, kp // tk
    tmw = tm // rpw

    # Lane-stack a 2-digit-plane RHS whose real width fits one lane
    # tile (8-bit B at the sweep's N <= 64): each (d, e) pass pair
    # collapses to one MXU pass; digit 1's partials are folded back in
    # the epilogue (exact — ops/digits.lane_stack/lane_unstack).
    b_dig = b.digits
    b_stk = None
    if lane_stackable(nd_b, N, np_) and tn == np_:
        s_b = round_up(N, 8)
        b_dig = lane_stack(
            b.digits[0], b.digits[1], s_b,
            lambda v, k: jnp.roll(v, k, axis=-1),
        )[None]
        b_stk = (s_b, N)
        nd_b = 1

    # B stays fully VMEM-resident (loaded once) when small enough;
    # otherwise it streams per K-tile. The sparse path requires the
    # resident form (K-tile selection happens via dynamic slice).
    b_resident = nd_b * kp * tn <= (4 << 20) or tile_map is not None
    sparse = tile_map is not None
    if sparse:
        kidx, kcnt = tile_map.kidx, tile_map.kcnt

    if out_bits is None:
        nd_o, f_o, rpw_o = 0, 0, 0
        out_signed = False
    else:
        f_o = field_width(out_bits)
        out_signed = out_form == "packed" and packed_signed(out_bits)
        rpw_o = 1 if out_signed else 32 // f_o
        nd_o = 1 if out_signed else num_digits(out_bits)

    if out_cols is not None:
        if out_form == "digits":
            raise ValueError(
                "out_cols is for terminal outputs (f32/packed); digit "
                "outputs feed chained GEMMs and keep 128-lane padding"
            )
        ocp = min(round_up(max(int(out_cols), 1), 8), np_)
        if np_ > tn:
            raise ValueError(
                "out_cols requires a single output column tile "
                f"(np={np_} > tn={tn})"
            )
    else:
        ocp = np_

    def kernel_body(kidx_ref, kcnt_ref, a_ref, b_ref, o_ref, acc_ref,
                    *extra):
        cs_ref = extra[0] if a_signed else None
        i = pl.program_id(0)
        t = pl.program_id(2)

        @pl.when(t == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            if a_signed:
                cs_ref[:] = jnp.zeros_like(cs_ref)

        def compute():
            if b_resident:
                koff = kidx_ref[i, t] * tk if sparse else t * tk
                b_digits = [
                    b_ref[e, pl.ds(koff, tk), :] for e in range(nd_b)
                ]
            else:
                b_digits = [b_ref[e] for e in range(nd_b)]
            acc = acc_ref[:]
            for d in range(nd_a):
                # signed planes are plain int8 rows — no SWAR unpack
                a_tile = (
                    a_ref[d]
                    if a_signed
                    else _extract_groups(a_ref[d], f, interpret)
                )
                for e, bd in enumerate(b_digits):
                    part = jax.lax.dot_general(
                        a_tile, bd, _DOT, preferred_element_type=jnp.int32
                    )
                    dig_shift = DIGIT_BITS * (d + e)
                    acc = acc + (part << dig_shift if dig_shift else part)
            acc_ref[:] = acc
            if a_signed:
                # Rank-1 correction partials: colsum of this K-tile's
                # B levels (digit planes weighted 16^e; a lane-stacked
                # plane is summed as-is and unstacked with acc).
                # Skipped sparse tiles skip this too — their A levels
                # are all zero, so dot(-128, B_t) + 128*colsum_t(B)
                # cancels exactly only when BOTH terms are dropped.
                cs = cs_ref[0:1, :]
                for e, bd in enumerate(b_digits):
                    p = jnp.sum(
                        bd.astype(jnp.int32), axis=0, keepdims=True
                    )
                    cs = cs + (p << (DIGIT_BITS * e) if e else p)
                cs_ref[0:1, :] = cs

        if sparse:
            @pl.when(t < kcnt_ref[i])
            def _guarded():
                compute()
        else:
            compute()

        @pl.when(t == nk - 1)
        def _epilogue():
            acc = acc_ref[:]
            if a_signed:
                # A @ B = (A - 128J) @ B + 128 * colsum(B): exact
                # rank-1 correction for the signed-plane offset.
                acc = acc + (cs_ref[0:1, :] << 7)
            if b_stk is not None:
                acc = lane_unstack(
                    acc, b_stk[0], b_stk[1],
                    lambda v, k: pltpu.roll(v, shift=k, axis=v.ndim - 1),
                )
            def clip(v):
                # out_cols narrows the stored block; without it the
                # block is tn wide and must NOT be sliced (np_ > tn
                # at wide-N shapes)
                return v if out_cols is None else v[:, 0:ocp]

            if out_bits is None:
                v = clip(acc)
                o_ref[:] = v if raw_i32 else v.astype(jnp.float32)
                return
            r = _requant(acc, out_bits, shift)
            if out_form == "digits":
                for d in range(nd_o):
                    width = min(DIGIT_BITS, out_bits - d * DIGIT_BITS)
                    o_ref[d] = (
                        (r >> (d * DIGIT_BITS)) & ((1 << width) - 1)
                    ).astype(jnp.int8)
            elif out_signed:  # packed signed byte plane (bits 5-8)
                o_ref[0] = (clip(r) - _OFFSET).astype(jnp.int8)
            else:  # packed digit fields
                for d in range(nd_o):
                    width = min(DIGIT_BITS, out_bits - d * DIGIT_BITS)
                    dig = (
                        (clip(r) >> (d * DIGIT_BITS))
                        & ((1 << width) - 1)
                    ).astype(jnp.int8)
                    o_ref[d] = _pack_groups(dig, f_o, interpret)

    # Both paths ride the scalar-prefetch grid (measured FASTER than
    # a plain grid even for dense schedules — the prefetched indices
    # let Mosaic pipeline block DMAs deeper); dense simply feeds the
    # identity schedule.
    kernel = kernel_body

    def strip(index_map):
        return index_map

    def a_map(i, j, t, kidx_ref, kcnt_ref):
        return (0, i, kidx_ref[i, t] if sparse else t)

    if b_resident:
        b_spec = pl.BlockSpec(
            (nd_b, kp, tn), strip(lambda i, j, t, *_: (0, 0, j)),
            memory_space=pltpu.VMEM,
        )
    else:
        b_spec = pl.BlockSpec(
            (nd_b, tk, tn),
            strip(
                lambda i, j, t, kidx_ref, kcnt_ref: (
                    0, kidx_ref[i, t] if sparse else t, j,
                )
            ),
            memory_space=pltpu.VMEM,
        )

    # stored column-block width: tn per j-block normally; the
    # out_cols slice implies a single (narrower) block
    ow = tn if out_cols is None else ocp
    if out_bits is None:
        out_shape = jax.ShapeDtypeStruct(
            (mp, ocp), jnp.int32 if raw_i32 else jnp.float32
        )
        out_spec = pl.BlockSpec(
            (tm, ow), strip(lambda i, j, t, *_: (i, j)),
            memory_space=pltpu.VMEM,
        )
    elif out_form == "digits":
        out_shape = jax.ShapeDtypeStruct((nd_o, mp, np_), jnp.int8)
        out_spec = pl.BlockSpec(
            (nd_o, tm, tn), strip(lambda i, j, t, *_: (0, i, j)),
            memory_space=pltpu.VMEM,
        )
    else:
        out_shape = jax.ShapeDtypeStruct(
            (nd_o, mp // rpw_o, ocp),
            jnp.int8 if out_signed else jnp.int32,
        )
        out_spec = pl.BlockSpec(
            (nd_o, tm // rpw_o, ow),
            strip(lambda i, j, t, *_: (0, i, j)),
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        pl.BlockSpec(
            (nd_a, tmw, tk), strip(a_map), memory_space=pltpu.VMEM
        ),
        b_spec,
    ]
    scratch = [pltpu.VMEM((tm, tn), jnp.int32)] + (
        [pltpu.VMEM((8, tn), jnp.int32)] if a_signed else []
    )

    cost = pl.CostEstimate(
        flops=2 * mp * np_ * kp * nd_a * nd_b,
        bytes_accessed=a.nbytes() + b.digits.size,
        transcendentals=0,
    )
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
    )

    if not sparse:
        kidx = jnp.broadcast_to(jnp.arange(nk, dtype=jnp.int32), (nm, nk))
        kcnt = jnp.full((nm,), nk, jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nm, nn, nk),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch,
    )
    run = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=params,
        cost_estimate=cost,
        interpret=interpret,
    )
    out = run(kidx, kcnt, a.words, b_dig)

    if out_bits is None:
        return out[:M, :N]
    if out_form == "digits":
        return DigitTensor(digits=out, shape=(M, N), bits=out_bits)
    return PackedTensor(words=out, shape=(M, N), bits=out_bits)


def packmm_to_f32(
    a: PackedTensor,
    b: DigitTensor,
    tile_map: Optional[TileMap] = None,
    interpret: Optional[bool] = None,
    tiles: Optional[tuple] = None,
    out_cols: Optional[int] = None,
) -> jnp.ndarray:
    """Packed-A GEMM, float32 output (``bitMM2Int`` role,
    ``kernel.h:816-1054``). ``out_cols`` slices the store to the real
    class count (the reference emits dense M x N, not M x 128-padded,
    ``kernel.h:920-930``)."""
    return _packmm(a, b, None, "f32", tile_map, interpret, tiles, 0,
                   out_cols=out_cols)


def packmm_to_i32(
    a: PackedTensor,
    b: DigitTensor,
    tile_map: Optional[TileMap] = None,
    interpret: Optional[bool] = None,
    tiles: Optional[tuple] = None,
) -> jnp.ndarray:
    """Packed-A GEMM, raw int32 accumulator output.

    For partial sums combined *outside* the kernel (the packed ring
    aggregation shards, ``parallel/packed.py``): int32 end to end, so
    exactness never depends on the f32 24-bit mantissa bound."""
    return _packmm(a, b, None, "f32", tile_map, interpret, tiles, 0,
                   raw_i32=True)


def packmm_to_digits(
    a: PackedTensor,
    b: DigitTensor,
    out_bits: int,
    tile_map: Optional[TileMap] = None,
    interpret: Optional[bool] = None,
    tiles: Optional[tuple] = None,
    shift: int = 0,
) -> DigitTensor:
    """Packed-A GEMM, digit-plane output (``bitMM2Bit`` role with the
    fused requant epilogue, ``kernel.h:347-389``)."""
    return _packmm(a, b, out_bits, "digits", tile_map, interpret, tiles, shift)


def packmm_to_packed(
    a: PackedTensor,
    b: DigitTensor,
    out_bits: int,
    tile_map: Optional[TileMap] = None,
    interpret: Optional[bool] = None,
    tiles: Optional[tuple] = None,
    shift: int = 0,
    out_cols: Optional[int] = None,
) -> PackedTensor:
    """Packed-A GEMM, M-packed output — bit in, bit out, the exact
    shape of the reference's ``bitMM2Bit_profile`` benchmark op
    (``QGTC_device.cu:379-434``): requant + in-kernel repack.
    ``out_cols`` slices the store to the real column count — the
    reference's packed output also carries only ``N`` columns of
    fields, not a 128-lane pad."""
    return _packmm(a, b, out_bits, "packed", tile_map, interpret, tiles,
                   shift, out_cols=out_cols)
