"""Whole-model mega-kernel: the full GCN/GIN chain in one Pallas call.

The reference's fusion unit is one GEMM (requant+repack folded into
the epilogue, ``kernel.h:347-389``) because 100 KB of shared memory
cannot hold a cluster batch. A TPU core's ~16 MB VMEM can hold the
whole *model state* of a cluster batch (hidden matrices, weights) —
so this kernel runs all six chained GEMMs of a 3-layer GCN/GIN per
batch in-core, with requantization between layers and zero HBM
round-trips for intermediates. The adjacency (the one large operand,
6.5 MB at pn=2560) streams through a manually double-buffered
row-chunk pipeline from HBM for each aggregation, overlapping DMA
with the MXU work of the previous chunk. The grid iterates over the
stacked batches of an epoch, so ONE kernel launch executes the whole
epoch — per-batch dispatch costs more in launch latency than the
math (29 ms/epoch dispatched vs ~25 us/batch of DMA+MXU).

Dataflows (SURVEY §3, ``main_qgtc.py:127-154``):
  GCN: XW1 -> A(.) -> (.)W2 -> A(.) -> (.)W3 -> A(.) [f32 out]
  GIN: AX -> (.)W1 -> A(.) -> (.)W2 -> A(.) -> (.)W3 [f32 out]

The adjacency arrives **bit-packed along M** (the
:class:`~qgtc_ppopp22_tpu.ops.packmm.PackedTensor` word layout,
``32 rows/word``): 8x less HBM traffic and 8x less VMEM than int8
levels, unpacked per row-chunk with SWAR ops the MXU passes hide
completely (see ``ops/packmm.py``). This raises the resident-A bucket
ceiling from pn<=2560 to pn<=7168 and makes streaming mode pay 1/8th
of the round-1 bandwidth. Hidden levels are carried as base-16 digit
lists, the digit algebra of ``ops/digitmm.py``.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qgtc_ppopp22_tpu.ops.bitpack import DIGIT_BITS, num_digits
from qgtc_ppopp22_tpu.ops.digits import (
    DigitTensor,
    lane_stack,
    lane_stackable,
    lane_unstack,
)
from qgtc_ppopp22_tpu.ops.packmm import _extract_groups

__all__ = [
    "fused_model_epoch",
    "fused_baseline_epoch",
    "mega_colblock",
    "mega_vmem_plan",
    "mega_plan_probe",
]


def mega_colblock(pn: int) -> int:
    """Column-block width for the mega kernel's 2-D zero-block
    skipping: the smallest divisor of ``pn`` that is a multiple of
    256 and >= 512. At 512 the per-block MXU pass (512-row chunk x
    512 cols x 128 lanes) still runs ~3 us of int8 work — an order
    of magnitude above the measured cost of the predicated branch a
    skipped block pays (~4% for an all-occupied 2560-wide map) —
    while RCM-banded adjacencies (``ClusterBatcher(reorder="rcm")``)
    leave ~47% of 512-wide blocks empty on ogbn-arxiv vs ~2% at the
    1280-wide blocks this heuristic used to pick. Falls back to
    coarser widths when ``pn`` has no fine divisor; ``pn`` itself
    (one block per chunk) degenerates to row-chunk skipping."""
    for w in range(512, pn, 256):
        if pn % w == 0:
            return w
    if pn % 256 == 0 and pn > 256:
        return 256
    return pn

_DOT = (((1,), (0,)), ((), ()))
_CHUNK = 512  # adjacency rows per DMA chunk (2 buffers resident)
_RPW = 32  # adjacency rows per packed word (1-bit, field width 1)


def _round8(n: int) -> int:
    return (n + 7) // 8 * 8


def mega_vmem_plan(
    pn: int,
    nd_x: int,
    xp: int,
    ws,
    out_cols: Optional[int] = None,
    resident_a: Optional[bool] = None,
    unpack_once: Optional[bool] = None,
    model: Optional[str] = None,
    x_split_digits: int = 0,
):
    """Static VMEM budget for the mega kernel -> (resident_a,
    unpack_once).

    Resident packed A (pn^2/8 words) + double-buffered x block + int32
    accumulator + double-buffered f32 output + weights must fit the
    ~16 MB core VMEM with headroom for Mosaic transients (incl. the
    per-chunk unpacked a-tile). Raises when even the streaming kernel
    does not fit (callers fall back to the scan engine). Exposed so
    the runtime can tell — BEFORE staging — whether a bucket will
    stream: in the streaming regime zero-block jumping saves each
    skipped block's HBM crossing and is a measured win
    (results/zero_tile_streaming.csv), while in the resident regime A
    crosses HBM once anyway and predication only costs
    (results/zero_tile.csv).
    """
    a_res_bytes = (pn // _RPW) * pn * 4  # = pn*pn/8
    cp_est = ws[-1].digits.shape[2]
    oc_est = (
        cp_est
        if out_cols is None
        else min(_round8(out_cols), cp_est)
    )
    # Aggregation-accumulator width: GCN aggregates only AFTER the
    # first update, so its accumulator never carries feature-width
    # rows; only GIN's first aggregation does. Unknown model stays
    # conservative (this distinction unlocked reddit's xp=640 8-bit
    # bucket, which the xp-inclusive estimate pushed past VMEM).
    cols = [w.digits.shape[2] for w in ws] + [cp_est]
    if model != "gcn":
        cols.append(xp)
    hid_est = max(cols)
    # Levels-form X (x_split_digits > 0) ships nd_x=1 byte plane and
    # splits digits into a VMEM scratch of x_split_digits planes.
    fixed = (
        2 * nd_x * pn * xp
        + x_split_digits * pn * xp
        + 4 * pn * hid_est
        + 2 * 4 * pn * oc_est
        + 2 * sum(w.digits.size for w in ws)
        + _CHUNK * pn  # unpacked per-chunk a-tile transient
        + (2 << 20)
    )
    if resident_a is None:
        resident_a = fixed + a_res_bytes <= (15 << 20)
    need = fixed + (a_res_bytes if resident_a else 0)
    if need > (15 << 20):
        raise ValueError(
            f"bucket pn={pn} (x digits={nd_x}) needs ~{need >> 20} MB "
            "VMEM even for the streaming kernel; use the scan engine"
        )
    # unpack_once (an int8 copy of A written at the first aggregation,
    # re-read by later ones) is an ABLATION tier, not the default:
    # re-measured in r5 it LOSES to re-unpacking per aggregation at
    # every bucket size (pn=1024: 3.47 vs 2.95 us/batch; 512: +4%;
    # 2048/2560: +2%, results/grid_overhead_study.csv) — the SWAR
    # unpack overlaps the MXU passes while the pn^2 VMEM write+read
    # does not come for free.
    if unpack_once is None:
        unpack_once = False
    else:
        unpack_once = unpack_once and resident_a
    return resident_a, unpack_once


# Tier order, fastest first: resident, streaming (unpack-once is a
# measured regression at every bucket — see mega_vmem_plan — and is
# reachable only by explicit unpack_once=True).
_MEGA_TIERS = ((True, False), (False, False))
_PROBE_CACHE: dict = {}


def _vmem_error(e: Exception) -> bool:
    # Only Mosaic's VMEM / scoped-allocation rejections demote the
    # residency tier. Unrelated failures whose text merely mentions
    # memory (HBM RESOURCE_EXHAUSTED, tunnel errors) must surface —
    # a broader match silently swallowed them into a slower tier.
    s = str(e).lower()
    return any(
        m in s
        for m in ("vmem", "scoped allocation", "scratch memory")
    )


def mega_plan_probe(
    a_stack_shape,
    x_stack_shape,
    ws,
    out_bits: int,
    model: str = "gcn",
    shifts=None,
    with_occ: bool = False,
    out_cols: Optional[int] = None,
    x_cols: Optional[int] = None,
    x_levels_bits: Optional[int] = None,
):
    """Pick the mega kernel's residency tier by ACTUALLY lowering it.

    The static constants in :func:`mega_vmem_plan` (15 MB ceiling,
    2 MB transient headroom) are tuned on the benchmark bucket shapes;
    for out-of-matrix shapes they can mispredict in either direction.
    On TPU this probe compiles the kernel at each tier (fastest
    first — resident+unpack-once, resident, streaming) and returns the
    first that Mosaic accepts; the compile is the same one the real
    call needs, so with the persistent compile cache the probe's cost
    is almost entirely reclaimed. Off-TPU (interpret mode has no VMEM
    limits) it falls back to the static plan. Results are memoized per
    geometry for the process lifetime.
    """
    key = (
        tuple(a_stack_shape), tuple(x_stack_shape),
        tuple((w.digits.shape, w.shape, w.bits) for w in ws),
        out_bits, model, tuple(shifts) if shifts is not None else None,
        with_occ, out_cols, x_cols, x_levels_bits,
        jax.default_backend(),
    )
    if key in _PROBE_CACHE:
        return _PROBE_CACHE[key]
    B, pnw, pn = a_stack_shape
    _, nd_x, _, xp = x_stack_shape
    if jax.default_backend() != "tpu":
        # mirror the kernel's x_split condition: signed mode carries
        # no digit-split scratch
        x_signed_est = x_levels_bits is not None and all(
            w.shape[1] < w.digits.shape[2] for w in ws
        )
        plan = mega_vmem_plan(
            pn, nd_x, xp, ws, out_cols=out_cols, model=model,
            x_split_digits=(
                num_digits(x_levels_bits)
                if (x_levels_bits is not None and not x_signed_est)
                else 0
            ),
        )
        _PROBE_CACHE[key] = plan
        return plan
    chunk = next((c for c in (512, 256) if c <= pn and pn % c == 0), 512)
    nch = pn // chunk
    last_err = None
    for ra, uo in _MEGA_TIERS:
        # The static estimate only PRUNES hopeless tiers (dominant A
        # terms alone >1.5x the physical ~16 MB — compiling those
        # wastes 30-300 s cold); within that margin the compiler is
        # the arbiter.
        a_terms = ((pn // _RPW) * pn * 4 if ra else 0) + (
            pn * pn if uo else 0
        )
        if a_terms > int(1.5 * (16 << 20)):
            last_err = last_err or ValueError(
                f"tier (resident={ra}, unpack_once={uo}) pruned: A "
                f"terms alone ~{a_terms >> 20} MB"
            )
            continue

        def fn(a, x, occ=None):
            return fused_model_epoch(
                a, x, ws, out_bits, model=model, shifts=shifts,
                resident_a=ra, unpack_once=uo, chunk_occ=occ,
                out_cols=out_cols, x_cols=x_cols,
                x_levels_bits=x_levels_bits,
            )

        # Compile at the REAL batch count: buffer-assignment failures
        # can be B-dependent (observed: XLA stack-allocated a
        # [25, 2560, 48] f32 bucket output in VMEM and errored — a
        # B=1 probe compiled fine and the real program then crashed).
        # The real call hits the compile cache, so this costs nothing
        # extra.
        shapes = [
            jax.ShapeDtypeStruct((B, pnw, pn), jnp.int32),
            jax.ShapeDtypeStruct((B, nd_x, pn, xp), jnp.int8),
        ]
        if with_occ:
            shapes.append(jax.ShapeDtypeStruct((B, nch), jnp.int32))
        try:
            jax.jit(fn).lower(*shapes).compile()
            _PROBE_CACHE[key] = (ra, uo)
            return ra, uo
        except Exception as e:  # Mosaic VMEM rejection -> next tier
            if not _vmem_error(e):
                raise
            print(
                f"[mega-probe] pn={pn} tier (resident={ra}, "
                f"unpack_once={uo}) rejected: {str(e)[:160]}"
            )
            last_err = e
    raise ValueError(
        f"bucket pn={pn}: no mega residency tier compiles "
        f"({last_err}); use the scan engine"
    )


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _digit_dot(a_digits, b_digits):
    """sum_{d,e} dot(a_d, b_e) << 4(d+e) with int32 accumulation."""
    acc = None
    for d, ad in enumerate(a_digits):
        for e, bd in enumerate(b_digits):
            part = jax.lax.dot_general(
                ad, bd, _DOT, preferred_element_type=jnp.int32
            )
            shift = DIGIT_BITS * (d + e)
            part = part << shift if shift else part
            acc = part if acc is None else acc + part
    return acc


def _requant_raw(acc, out_bits: int, shift: int = 0) -> jnp.ndarray:
    """Reference requantizer (kernel.h:347-351) -> int32 levels."""
    ub = 1 << out_bits
    if shift:
        acc = acc >> shift
    r = jnp.where(acc > ub, ub - 1, jnp.where(acc < 0, 1, acc))
    return r & (ub - 1)


def _requant_digits(acc, out_bits: int, shift: int = 0) -> List[jnp.ndarray]:
    """Reference epilogue (kernel.h:347-351) -> base-16 digit list.
    ``shift``: optional power-of-two pre-scale (see ops/quantize.py)."""
    r = _requant_raw(acc, out_bits, shift)
    out = []
    for d in range(num_digits(out_bits)):
        width = min(DIGIT_BITS, out_bits - d * DIGIT_BITS)
        out.append(
            ((r >> (d * DIGIT_BITS)) & ((1 << width) - 1)).astype(jnp.int8)
        )
    return out


def fused_model_epoch(
    a_stack: jax.Array,  # int32[B, pn//32, pn] M-packed 1-bit adjacency
    x_stack: jax.Array,  # int8[B, nd_x, pn, xp] feature digits
    ws: Sequence[DigitTensor],  # weights, digit planes (replicated)
    out_bits: int,
    model: str = "gcn",
    interpret: Optional[bool] = None,
    shifts: Optional[Sequence[int]] = None,
    resident_a: Optional[bool] = None,
    chunk_occ: Optional[jax.Array] = None,  # int32[B, nch] or [B, nch, nj]
    out_cols: Optional[int] = None,
    x_cols: Optional[int] = None,
    x_levels_bits: Optional[int] = None,
    unpack_once: Optional[bool] = None,
    blk_sched: Optional[jax.Array] = None,  # int32[B, nch, nj+1]
) -> jax.Array:
    """Run the full model over every stacked batch in ONE pallas call.

    ``a_stack`` is the M-packed word form of each batch adjacency
    (``packmm.pack_rows`` layout, 1-bit). Returns float32 logits
    [B, pn, cls_padded], where cls_padded is the weight tensor's
    128-lane class dim, or ``round8(out_cols)`` when ``out_cols`` is
    given (slices the STORE only — the biggest HBM term of an epoch
    is otherwise logit padding; values are unchanged). ``shifts``: optional per-GEMM power-of-two
    requant scales, ordered as in ``qgcn_forward``/``qgin_forward``
    (None = reference semantics). ``resident_a`` selects the adjacency
    strategy: True keeps the packed A in VMEM across the layer stack
    (one HBM crossing per batch; needs pn^2/8 of VMEM), False streams
    A through a two-chunk double buffer on every aggregation (one
    crossing per aggregation; fits any pn). None picks resident when
    the VMEM budget allows.

    ``chunk_occ`` enables zero-tile jumping (the reference's Fig. 8b
    mechanism, ``kernel.h:572-592``, applied at the mega kernel's
    natural tile sizes). Two granularities:

    * ``[B, nch]`` — row-chunk skipping: chunks flagged 0 skip the
      MXU pass (and, in resident mode, the DMA too); their output
      rows are written as zeros (exact: all-zero adjacency rows
      aggregate nothing).
    * ``[B, nch, nj]`` — 2-D (row-chunk x col-block) skipping: each
      ``pn/nj``-wide column block is multiplied only when it contains
      a nonzero word. In STREAMING mode a skipped block also skips
      its DMA (saves HBM bandwidth and MXU work); in RESIDENT mode
      the chunk still unpacks whole but every empty block skips its
      MXU pass. Profitable when the adjacency is banded — pair with
      ``ClusterBatcher(reorder="rcm")``, which leaves ~47%+ of
      512-wide blocks empty on real cluster batches. Build with
      ``runtime.mega_block_occ`` using :func:`mega_colblock` for the
      block width.

    Build occupancy host-side at pack time (``runtime.mega_chunk_occ``
    / ``runtime.mega_block_occ``).

    ``blk_sched`` (RESIDENT mode only, exclusive with ``chunk_occ``):
    an occupancy-COMPACTED 2-D block schedule — per (batch,
    row-chunk): ``[count, j_0, j_1, ...]`` listing the occupied
    column-block indices (``runtime.mega_block_sched``). The kernel
    runs a ``fori_loop`` over only the occupied blocks, indexing the
    resident packed words and the RHS through dynamic ref slices, so
    a skipped block costs NOTHING (no predicated branch, no
    zero-accumulate) — the form that makes resident-mode zero-tile
    jumping profitable where the predicated ``chunk_occ`` form
    measured 0.80x (results/zero_tile.csv). Requires a single
    effective RHS plane (always true for the production 1/2/4-bit
    digit and >4-bit signed chains).

    ``x_levels_bits``: when set, ``x_stack`` is int8[B, 1, pn, xp]
    **levels** (the full multi-digit value in one byte, bit pattern of
    the 0..255 level) instead of separate digit planes, and the kernel
    splits the base-16 digits on the VPU after the DMA. A >4-bit X
    then crosses HBM once at 1 byte/value instead of twice at
    1 byte/digit — the dominant remaining HBM term of 8-bit epochs
    (the packed-everything analog of the reference hot loop,
    ``kernel.h:301-335``). Exact: the digit split is pure integer
    algebra.

    ``x_cols``: real (unpadded) feature width. 8-bit operands carry
    TWO base-16 digit planes; at the benchmark's narrow widths
    (hidden 16/64, classes <= 47) both planes of a matrix fit side by
    side in ONE 128-lane tile, so every dot against it runs half the
    MXU passes — the 16x digit weight is folded back after the dot by
    a lane roll (exact int32 algebra, see ``_lane_stack``/
    ``_lane_unstack``). Weight planes are stacked host-side from each
    weight's recorded real width; hidden planes are stacked in-kernel;
    ``x_cols`` extends this to the GIN first aggregation's feature
    operand (the only place X is a dot RHS). None disables only the X
    stacking. Multi-digit epochs drop from ``2x`` the single-digit MXU
    work per agg (and ``4x`` per update) to ``1x``/``2x``.
    """
    B, pnw, pn = a_stack.shape
    _, nd_x, pnx, xp = x_stack.shape
    if pnw * _RPW != pn or pn != pnx:
        raise ValueError(f"bad stacked shapes {a_stack.shape} {x_stack.shape}")
    if model not in ("gcn", "gin"):
        raise ValueError(model)
    interpret = _interpret_default() if interpret is None else interpret
    if x_levels_bits is not None and nd_x != 1:
        raise ValueError(
            f"x_levels_bits given but x_stack has {nd_x} planes"
        )
    # Signed single-plane mode for >4-bit chains: every operand is ONE
    # offset-signed int8 plane (byte = level - 128; ops/packmm.py has
    # the per-GEMM form). Each weight carries a constant ones-lane in
    # its last (padded) lane, so every dot's last output lane IS
    # rowsum(lhs_signed) — the rank-1 correction costs two vector adds,
    # and the algebra composes down the chain because weight/feature
    # PAD rows are level 0 (their shifted products cancel exactly; see
    # the identity in prepare_rhs). Every GEMM runs ONE MXU pass (the
    # digit path pays 2 per update even lane-stacked) with no digit
    # split and single-plane requant stores. Needs a free lane on
    # every WEIGHT (always holds at the reference configs: real
    # widths < 128); X needs none — see x_ones_lane below.
    x_signed = x_levels_bits is not None and all(
        w.shape[1] < w.digits.shape[2] for w in ws
    )
    # GIN's first aggregation uses X as the dot RHS. When the real
    # feature width leaves a free padded lane, that lane carries the
    # constant ones column and the degree correction rides the same
    # MXU pass for free. At 128-multiple widths (arxiv/soc feat=128)
    # there is no free lane: the degree is instead row-summed from the
    # unpacked 0/1 adjacency chunk on the VPU ("deg" mode below) —
    # ~8x cheaper than either an appended ones lane-tile (one extra
    # MXU pass) or the retired MIXED mode (2 digit passes for the
    # whole first aggregation).
    x_ones_lane = (
        x_signed
        and model == "gin"
        and x_cols is not None
        and _round8(int(x_cols)) < xp
    )
    resident_a, unpack_once = mega_vmem_plan(
        pn, nd_x, xp, ws, out_cols=out_cols, resident_a=resident_a,
        unpack_once=unpack_once, model=model,
        x_split_digits=(
            num_digits(x_levels_bits)
            if (x_levels_bits is not None and not x_signed)
            else 0
        ),
    )
    chunk = next(
        (c for c in (512, 256) if c <= pn and pn % c == 0), None
    )
    if chunk is None:
        raise ValueError(
            f"pn={pn} has no chunk divisor in (512, 256); packed "
            "adjacency rows come in 256-row groups"
        )
    chw = chunk // _RPW  # word rows per chunk
    nch = pn // chunk
    n_layers = len(ws)
    cp = ws[-1].digits.shape[2]
    # Stored logit columns. Weight digit tensors pad the class dim to
    # 128 lanes (digit_pack), but real class counts are 2-47: storing
    # all 128 padded lanes makes the logits the LARGEST HBM term of an
    # epoch (e.g. arxiv 98 MB/epoch of which ~2/3 is padding). The MXU
    # computes the full 128-lane tile either way; only the store is
    # sliced, so ``out_cols`` changes bytes written, not values.
    oc = cp if out_cols is None else min(_round8(out_cols), cp)
    sh = list(shifts) if shifts is not None else [0] * (2 * n_layers - 1)

    # Weight prep, host-side (amortized like the reference's
    # out-of-loop weight packing, main_qgtc.py:108-110).
    w_info: List[Optional[tuple]] = []
    kw_arrays = []
    corr_arrays = []
    if x_signed:
        # ONE offset-signed plane per weight + ones-lane + its
        # precomputed correction row (128*colsum + 128^2*K).
        for w in ws:
            nd_w, kpw, npw = w.digits.shape
            lv = jnp.zeros((kpw, npw), jnp.int32)
            for e in range(nd_w):
                lv = lv + (
                    w.digits[e].astype(jnp.int32) << (DIGIT_BITS * e)
                )
            s_w = lv - 128
            lane = jax.lax.broadcasted_iota(jnp.int32, s_w.shape, 1)
            s_w = jnp.where(lane == npw - 1, 1, s_w)
            corr0 = (
                jnp.sum(s_w, axis=0, keepdims=True) << 7
            ) + jnp.int32(128 * 128 * kpw)
            kw_arrays.append(s_w.astype(jnp.int8)[None])
            corr_arrays.append(
                jnp.concatenate(
                    [corr0, jnp.zeros((7, npw), jnp.int32)], axis=0
                )
            )
            w_info.append(None)
    else:
        # Lane-stack 2-digit-plane weights: the stacked array has ONE
        # plane, so _digit_dot against it pays half the MXU passes;
        # w_info records (stride, real width) for the in-kernel
        # unstack. DigitTensor.shape carries each weight's real
        # extent, so no extra caller plumbing is needed.
        for w in ws:
            rw = w.shape[1]
            if lane_stackable(w.digits.shape[0], rw, w.digits.shape[2]):
                s = _round8(rw)
                kw_arrays.append(
                    lane_stack(
                        w.digits[0], w.digits[1], s,
                        lambda v, k: jnp.roll(v, k, axis=-1),
                    )[None]
                )
                w_info.append((s, rw))
            else:
                kw_arrays.append(w.digits)
                w_info.append(None)

    # With no occupancy map the kernel compiles a straight-line chunk
    # loop (no pl.when guards, single direct emit per chunk): the
    # dense path must not pay branch overhead for a feature it isn't
    # using.
    guard = chunk_occ is not None
    if chunk_occ is None:
        # The dense kernel never reads occ_ref (no guards compiled),
        # but the scalar-prefetch array still occupies SMEM at ~1.4 KB
        # per row — a (B, nch) placeholder overflows the 1 MB SMEM
        # near B~1000 (ogbn-products' 1250-batch epochs). Prefetch a
        # 1-row dummy instead.
        chunk_occ = jnp.ones((1, nch), jnp.int32)
    occ_3d = chunk_occ.ndim == 3
    if occ_3d:
        nj = chunk_occ.shape[2]
        if chunk_occ.shape[:2] != (B, nch) or pn % nj or (pn // nj) % 128:
            raise ValueError(
                f"chunk_occ shape {chunk_occ.shape} incompatible with "
                f"B={B} nch={nch} pn={pn}"
            )
    else:
        nj = 1
        if guard and chunk_occ.shape != (B, nch):
            raise ValueError(
                f"chunk_occ shape {chunk_occ.shape} != {(B, nch)}"
            )
    cb = pn // nj
    # SMEM pads scalar-prefetch arrays to ~4 KB per ROW: a (B, ...)
    # occupancy blows the 1 MB scalar memory near B~250 (observed:
    # ogbn-products' 421-batch bucket = 421 x 4096 bytes = exactly
    # the failing allocation). Flatten to ONE row; the kernel indexes
    # with b * nch * nj + c * nj + j.
    occ_stride = nch * nj
    chunk_occ = chunk_occ.reshape(1, -1)

    # Occupancy-COMPACTED block schedule (resident zero-tile form):
    # the prefetch row carries [cnt, j_0, ...] per (batch, chunk) and
    # the kernel fori-loops over only the occupied blocks.
    compact = blk_sched is not None
    if compact:
        if guard:
            raise ValueError("blk_sched and chunk_occ are exclusive")
        if not resident_a:
            raise ValueError("blk_sched requires the resident kernel")
        if blk_sched.ndim != 3 or blk_sched.shape[:2] != (B, nch):
            raise ValueError(
                f"blk_sched shape {blk_sched.shape} incompatible "
                f"with B={B} nch={nch}"
            )
        nj = blk_sched.shape[2] - 1
        if nj < 1 or pn % nj or (pn // nj) % 128:
            raise ValueError(
                f"blk_sched nj={nj} incompatible with pn={pn}"
            )
        cb = pn // nj
        occ_stride = nch * (nj + 1)
        chunk_occ = blk_sched.reshape(1, -1)
        # compact aggs read packed words directly per block; the a8
        # copy would go stale/unused
        unpack_once = False
    # Compact fori scheduling variant (ablation knob, r5 study):
    #   ""       -> 2-wide masked fori (the committed r5 form)
    #   "unroll4"-> 4 blocks/iteration on full quads, 2-wide masked
    #               remainder fori (same tail waste as the 2-wide)
    #   "pipe4"  -> software pipeline: 4 VMEM slots hold pre-unpacked
    #               blocks; each iteration dots one pair while
    #               unpacking the next, so the VPU unpack of pair k+1
    #               runs under the MXU passes of pair k. 2-wide
    #               masked remainder fori.
    compact_pipe = (
        os.environ.get("QGTC_COMPACT_PIPE", "") if compact else ""
    )
    if compact_pipe not in ("", "unroll4", "pipe4"):
        raise ValueError(f"QGTC_COMPACT_PIPE={compact_pipe!r}")

    x_split = x_levels_bits is not None and not x_signed

    def kernel(occ_ref, x_ref, *rest):
        ws_refs = rest[:n_layers]
        corr_refs = rest[n_layers:2 * n_layers] if x_signed else None
        rest_s = list(rest[(2 if x_signed else 1) * n_layers:])
        a_hbm, o_ref, a_vmem = rest_s[0], rest_s[1], rest_s[2]
        idx = 3
        a8_vmem = xs_vmem = None
        if unpack_once:
            a8_vmem = rest_s[idx]; idx += 1
        if x_split:
            xs_vmem = rest_s[idx]; idx += 1
        h_scr = ap_scr = None
        if compact:
            h_scr = rest_s[idx]; idx += 1
        if compact_pipe == "pipe4":
            ap_scr = rest_s[idx]; idx += 1
        acc_ref, sem = rest_s[idx], rest_s[idx + 1]
        b = pl.program_id(0)
        seen_a = [False]  # becomes True once A is fully in VMEM

        def kroll(v, k):  # lane roll (Mosaic lane rotate)
            return pltpu.roll(v, shift=k, axis=v.ndim - 1)

        if x_signed:
            # byte LEVELS -> offset-signed plane (level - 128). With a
            # free padded lane (x_ones_lane), GIN's first aggregation
            # reads its degree from the constant ones column parked
            # there; without one, "deg" mode row-sums the adjacency
            # chunk instead and X ships unmodified.
            xs32 = (x_ref[0, 0].astype(jnp.int32) & 255) - 128
            if x_ones_lane:
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, xs32.shape, 1
                )
                xs32 = jnp.where(lane == xp - 1, 1, xs32)
            x_digits = [xs32.astype(jnp.int8)]
        elif not x_split:
            x_digits = [x_ref[0, d] for d in range(nd_x)]
        else:
            # Split base-16 digits from the byte levels on the VPU
            # (int32 temp — an int8 shift would sign-extend levels
            # >= 128), then round-trip through the i8 VMEM scratch:
            # Mosaic lowers i8 arithmetic (the lane-stack add, the
            # MXU feed) only on ref-loaded i8 vectors, not on values
            # still in the i32-chain layout (probed on HW).
            xl = x_ref[0, 0].astype(jnp.int32) & 255
            for d in range(num_digits(x_levels_bits)):
                width = min(DIGIT_BITS, x_levels_bits - d * DIGIT_BITS)
                xs_vmem[d] = (
                    (xl >> (d * DIGIT_BITS)) & ((1 << width) - 1)
                ).astype(jnp.int8)
            x_digits = [
                xs_vmem[d] for d in range(num_digits(x_levels_bits))
            ]
        w_digits = [
            [w_ref[d] for d in range(w_ref.shape[0])] for w_ref in ws_refs
        ]

        def sgn_store(r, ncols):
            # requantized levels -> offset-signed plane with the ones
            # column restored at lane ncols-1 (pad lanes are exactly 0
            # by the correction algebra, so r - 128 lands them on
            # level 0). ONLY for upd outputs: their lane ncols-1 is
            # the weight's ones out-column — a guaranteed-free pad
            # lane (x_signed requires every weight's real width <
            # npw) — and the following aggregation reads the ones
            # column for its degree. Aggregation outputs must NOT use
            # this store: they only feed weight multiplies (whose
            # rowsum comes from the weight's ones COLUMN), and at a
            # 128-multiple feature width lane ncols-1 is a REAL
            # column — overwriting it corrupted every MIXED-mode GIN
            # output until round 5.
            lane = jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
            return jnp.where(lane == ncols - 1, 1, r - 128).astype(
                jnp.int8
            )

        def copy(c):
            # packed-word chunk c of this batch's adjacency -> its
            # resident slice (word rows: chunk/32 per chunk).
            # Streaming mode copies per col-block via copy_block.
            return pltpu.make_async_copy(
                a_hbm.at[b, pl.ds(c * chw, chw), :],
                a_vmem.at[pl.ds(c * chw, chw), :],
                sem.at[c],
            )

        def copy_block(c, j, slot):
            # one (row-chunk x col-block) adjacency block -> its col
            # range of the double-buffer slot (streaming 2-D skipping)
            return pltpu.make_async_copy(
                a_hbm.at[b, pl.ds(c * chw, chw), pl.ds(j * cb, cb)],
                a_vmem.at[slot, :, pl.ds(j * cb, cb)],
                sem.at[slot, j],
            )

        def occ_block(c, j):
            return occ_ref[0, b * occ_stride + c * nj + j] != 0

        def occ_chunk(c):
            v = occ_ref[0, b * occ_stride + c * nj]
            for j in range(1, nj):
                v = v | occ_ref[0, b * occ_stride + c * nj + j]
            return v != 0

        def agg(h_digits, rw_h, final: bool, shift: int = 0,
                rhs_mode: Optional[str] = "ones" if x_signed else None):
            """acc_rows = A @ H.

            Resident mode: the FIRST aggregation streams A chunk by
            chunk into the full-size VMEM buffer (all DMAs in flight,
            each waited just before its chunk's MXU pass); later
            aggregations reuse the copy — A crosses HBM once per
            batch. Streaming mode: every aggregation re-streams A
            through a two-chunk double buffer (chunk c+1's DMA in
            flight while chunk c multiplies) — one crossing per
            aggregation, but only 2*chunk*pn bytes of VMEM. Chunk
            loops statically unrolled so Mosaic lowers each dot onto
            the MXU.

            When H carries two digit planes of real width ``rw_h``
            that fit one lane tile, they are lane-stacked into a
            single RHS so every chunk pays ONE MXU pass instead of
            two; stacked partials accumulate linearly in acc_ref /
            o_ref and are unstacked once at requant / store time.
            """
            ncols = h_digits[0].shape[1]
            stk = lane_stackable(len(h_digits), rw_h, ncols)
            if stk:
                s_h = _round8(int(rw_h))
                # Stack via int32: Mosaic lowers i8 vector adds only
                # on ref-loaded operands, and requantized h planes are
                # computed values — a direct i8 lane_stack fails to
                # compile on HW ("Only vector<i16> and vector<i32>
                # are supported"). ext + add + trunc all lower.
                h_eff = [
                    lane_stack(
                        h_digits[0].astype(jnp.int32),
                        h_digits[1].astype(jnp.int32),
                        s_h, kroll,
                    ).astype(jnp.int8)
                ]
            else:
                s_h = 0
                h_eff = h_digits

            def unstk(part):
                return (
                    lane_unstack(part, s_h, rw_h, kroll) if stk else part
                )

            def dotfix(part, a_src):
                # signed RHS: + 128*deg(A-rows) completes
                # A @ (h_s + 128). Two degree sources: "ones" reads
                # the RHS's constant ones-lane output (free — rides
                # the same MXU pass; upd outputs and free-lane X carry
                # it); "deg" row-sums the unpacked 0/1 chunk on the
                # VPU (first GIN aggregation when the feature width
                # leaves no free lane). Both are linear in the A
                # block, so 2-D block partials correct independently
                # and accumulate exactly (a skipped block's true deg
                # contribution is 0). None: unsigned digit RHS.
                if rhs_mode == "ones":
                    return part + (part[:, ncols - 1 : ncols] << 7)
                if rhs_mode == "deg":
                    deg = jnp.sum(
                        a_src.astype(jnp.int32), axis=1, keepdims=True
                    )
                    return part + (deg << 7)
                return part

            def emit(c, part):
                if final:
                    o_ref[0, c * chunk : (c + 1) * chunk, :] = unstk(
                        part
                    )[:, 0:oc].astype(jnp.float32)
                else:
                    acc_ref[c * chunk : (c + 1) * chunk, 0:ncols] = part

            def emit_zero(c):
                # skipped (all-zero) adjacency row-chunk: the exact
                # aggregation result is zero
                if final:
                    o_ref[0, c * chunk : (c + 1) * chunk, :] = jnp.zeros(
                        (chunk, o_ref.shape[2]), jnp.float32
                    )
                else:
                    acc_ref[c * chunk : (c + 1) * chunk, 0:ncols] = (
                        jnp.zeros((chunk, ncols), jnp.int32)
                    )

            def guarded(c, compute_c):
                if not guard:
                    compute_c()
                    return
                occ_c = occ_chunk(c)

                @pl.when(occ_c)
                def _do():
                    compute_c()

                @pl.when(jnp.logical_not(occ_c))
                def _skip():
                    emit_zero(c)

            use_compact = compact and len(h_eff) == 1
            if use_compact:
                # Occupancy-compacted resident aggregation: per row
                # chunk, fori_loop over ONLY the occupied column
                # blocks (indices prefetched in SMEM). A skipped
                # block costs nothing — no predicated branch, no
                # zero-accumulate — so the skip win is the full MXU
                # pass, unlike the predicated chunk_occ form
                # (results/zero_tile.csv 0.80x). The RHS lives in a
                # VMEM scratch so blocks can be sliced with dynamic
                # sublane offsets; packed words are sliced per block
                # with a dynamic lane offset (cb is a 128-multiple).
                first = not seen_a[0]
                if first:
                    for c in range(nch):
                        copy(c).start()
                h_scr[:, 0:ncols] = h_eff[0]
                for c in range(nch):
                    if first:
                        copy(c).wait()
                    emit_zero(c)
                    base = b * occ_stride + c * (nj + 1)
                    cnt = occ_ref[0, base]
                    lo = c * chunk

                    def one_block(j, c=c):
                        # independent unpack -> dot chain for block j
                        aw = a_vmem[
                            pl.ds(c * chw, chw), pl.ds(j * cb, cb)
                        ]
                        a_cj = _extract_groups(aw, 1, interpret)
                        hj = h_scr[pl.ds(j * cb, cb), 0:ncols]
                        return dotfix(
                            jax.lax.dot_general(
                                a_cj, hj, _DOT,
                                preferred_element_type=jnp.int32,
                            ),
                            a_cj,
                        )

                    def acc_add(part, lo=lo):
                        if final:
                            o_ref[0, lo:lo + chunk, :] = (
                                o_ref[0, lo:lo + chunk, :]
                                + unstk(part)[:, 0:oc].astype(
                                    jnp.float32
                                )
                            )
                        else:
                            acc_ref[lo:lo + chunk, 0:ncols] = (
                                acc_ref[lo:lo + chunk, 0:ncols] + part
                            )

                    def body(jj, carry, base=base, cnt=cnt):
                        # 2 blocks per iteration: their unpack->dot
                        # chains are independent, so Mosaic can run
                        # block 2jj+1's VPU unpack under block 2jj's
                        # MXU pass, and the accumulate chain halves.
                        # An odd tail re-computes the last block and
                        # masks it out (exact; one wasted pass per
                        # odd-count chunk).
                        jj2 = 2 * jj
                        part = one_block(occ_ref[0, base + 1 + jj2])
                        j1 = occ_ref[
                            0, base + 1 + jnp.minimum(jj2 + 1, cnt - 1)
                        ]
                        part = part + jnp.where(
                            jj2 + 1 < cnt, one_block(j1), 0
                        )
                        acc_add(part)
                        return carry

                    if compact_pipe == "":
                        jax.lax.fori_loop(0, (cnt + 1) // 2, body, 0)
                    elif compact_pipe == "unroll4":
                        # 4 independent unpack->dot chains per
                        # iteration on full quads (one exposed unpack
                        # per 4 blocks instead of per 2); the 2-wide
                        # masked body finishes the remainder with the
                        # same tail waste as the default form.
                        n4 = cnt // 4

                        def body4(jj, carry, base=base):
                            j4 = 4 * jj
                            part = one_block(occ_ref[0, base + 1 + j4])
                            for k in (1, 2, 3):
                                part = part + one_block(
                                    occ_ref[0, base + 1 + j4 + k]
                                )
                            acc_add(part)
                            return carry

                        jax.lax.fori_loop(0, n4, body4, 0)
                        jax.lax.fori_loop(
                            2 * n4, (cnt + 1) // 2, body, 0
                        )
                    else:  # pipe4: software-pipelined pairs
                        # Slots 0,1 hold the CURRENT pair's unpacked
                        # blocks (written by the previous iteration or
                        # the fill), slots 2,3 the pair unpacked THIS
                        # iteration under the first pair's MXU passes
                        # — every steady-state unpack runs under a
                        # dot; only the per-chunk fill is exposed.
                        def unpack_blk(j, c=c):
                            aw = a_vmem[
                                pl.ds(c * chw, chw), pl.ds(j * cb, cb)
                            ]
                            return _extract_groups(aw, 1, interpret)

                        def dot_slot(s, j):
                            a_cj = ap_scr[s]
                            hj = h_scr[pl.ds(j * cb, cb), 0:ncols]
                            return dotfix(
                                jax.lax.dot_general(
                                    a_cj, hj, _DOT,
                                    preferred_element_type=jnp.int32,
                                ),
                                a_cj,
                            )

                        n4 = cnt // 4

                        @pl.when(n4 > 0)
                        def _fill(base=base):
                            ap_scr[0] = unpack_blk(occ_ref[0, base + 1])
                            ap_scr[1] = unpack_blk(occ_ref[0, base + 2])

                        def pbody(jj, carry, base=base, n4=n4):
                            j4 = 4 * jj

                            def jat(k):
                                return occ_ref[0, base + 1 + j4 + k]

                            part = dot_slot(0, jat(0)) + dot_slot(
                                1, jat(1)
                            )
                            ap_scr[2] = unpack_blk(jat(2))
                            ap_scr[3] = unpack_blk(jat(3))
                            part = (
                                part
                                + dot_slot(2, jat(2))
                                + dot_slot(3, jat(3))
                            )

                            @pl.when(jj + 1 < n4)
                            def _prefetch():
                                ap_scr[0] = unpack_blk(
                                    occ_ref[0, base + 1 + j4 + 4]
                                )
                                ap_scr[1] = unpack_blk(
                                    occ_ref[0, base + 1 + j4 + 5]
                                )

                            acc_add(part)
                            return carry

                        jax.lax.fori_loop(0, n4, pbody, 0)
                        jax.lax.fori_loop(
                            2 * n4, (cnt + 1) // 2, body, 0
                        )
                seen_a[0] = True
            elif resident_a:
                first = not seen_a[0]
                if first:
                    for c in range(nch):
                        if guard:
                            @pl.when(occ_chunk(c))
                            def _start(c=c):
                                copy(c).start()
                        else:
                            copy(c).start()
                for c in range(nch):
                    def load_chunk(c=c, first=first):
                        if first:
                            copy(c).wait()
                            a_c = _extract_groups(
                                a_vmem[c * chw : (c + 1) * chw, :], 1,
                                interpret,
                            )
                            if unpack_once:
                                a8_vmem[
                                    c * chunk : (c + 1) * chunk, :
                                ] = a_c
                        elif unpack_once:
                            a_c = a8_vmem[c * chunk : (c + 1) * chunk, :]
                        else:
                            a_c = _extract_groups(
                                a_vmem[c * chw : (c + 1) * chw, :], 1,
                                interpret,
                            )
                        return a_c

                    if guard and occ_3d and nj > 1:
                        # 2-D (row-chunk x col-block) skipping on the
                        # RESIDENT adjacency: each all-zero block of
                        # the (RCM-banded) adjacency skips its MXU
                        # pass. The chunk still unpacks whole (the
                        # SWAR unpack is cheap and paid once in
                        # unpack-once mode); only the dots are
                        # predicated.
                        def compute_blocks(c=c, first=first):
                            a_c = load_chunk(c, first)
                            emit_zero(c)
                            lo, hi = c * chunk, (c + 1) * chunk
                            for j in range(nj):
                                def _acc(j=j, a_c=a_c, lo=lo, hi=hi):
                                    a_cj = a_c[:, j * cb:(j + 1) * cb]
                                    part = dotfix(_digit_dot(
                                        [a_cj],
                                        [hd[j * cb:(j + 1) * cb]
                                         for hd in h_eff],
                                    ), a_cj)
                                    if final:
                                        o_ref[0, lo:hi, :] = (
                                            o_ref[0, lo:hi, :]
                                            + unstk(part)[:, 0:oc].astype(
                                                jnp.float32
                                            )
                                        )
                                    else:
                                        acc_ref[lo:hi, 0:ncols] = (
                                            acc_ref[lo:hi, 0:ncols]
                                            + part
                                        )
                                pl.when(occ_block(c, j))(_acc)

                        guarded(c, compute_blocks)
                    else:
                        def compute_c(c=c, first=first):
                            a_c = load_chunk(c, first)
                            emit(
                                c,
                                dotfix(_digit_dot([a_c], h_eff), a_c),
                            )

                        guarded(c, compute_c)
                seen_a[0] = True
            else:
                # streaming with 2-D zero-block jumping: each
                # (row-chunk x col-block) of A is DMA'd and multiplied
                # only when occupied — a skipped block saves its HBM
                # crossing AND its MXU pass for the cost of one
                # predicated branch. Per-(slot, block) semaphores keep
                # start/wait pairs matched under the same predicate;
                # the pipeline still runs chunk c+1's copies behind
                # chunk c's compute.
                def start_blocks(c, slot):
                    for j in range(nj):
                        if guard:
                            @pl.when(occ_block(c, j))
                            def _s(c=c, j=j, slot=slot):
                                copy_block(c, j, slot).start()
                        else:
                            copy_block(c, j, slot).start()

                def wait_blocks(c, slot):
                    for j in range(nj):
                        if guard:
                            @pl.when(occ_block(c, j))
                            def _w(c=c, j=j, slot=slot):
                                copy_block(c, j, slot).wait()
                        else:
                            copy_block(c, j, slot).wait()

                start_blocks(0, 0)
                for c in range(nch):
                    slot = c % 2
                    if c + 1 < nch:
                        start_blocks(c + 1, (c + 1) % 2)
                    wait_blocks(c, slot)
                    if not guard and nj == 1:
                        # dense streaming: single direct emit, no
                        # zero-init pass
                        a_c = _extract_groups(
                            a_vmem[slot], 1, interpret
                        )
                        emit(c, dotfix(_digit_dot([a_c], h_eff), a_c))
                        continue
                    # exact zero init; occupied blocks accumulate below
                    emit_zero(c)
                    for j in range(nj):
                        def _acc(c=c, j=j, slot=slot):
                            a_cj = _extract_groups(
                                a_vmem[slot, :, pl.ds(j * cb, cb)],
                                1, interpret,
                            )
                            hj = [
                                hd[j * cb:(j + 1) * cb]
                                for hd in h_eff
                            ]
                            part = dotfix(_digit_dot([a_cj], hj), a_cj)
                            lo, hi = c * chunk, (c + 1) * chunk
                            if final:
                                o_ref[0, lo:hi, :] = (
                                    o_ref[0, lo:hi, :]
                                    + unstk(part)[:, 0:oc].astype(
                                        jnp.float32
                                    )
                                )
                            else:
                                acc_ref[lo:hi, 0:ncols] = (
                                    acc_ref[lo:hi, 0:ncols] + part
                                )
                        if guard:
                            pl.when(occ_block(c, j))(_acc)
                        else:
                            _acc()
            if final:
                return None
            if x_signed:  # acc already carries the deg corrections
                r = _requant_raw(acc_ref[:, 0:ncols], out_bits, shift)
                # Plain r - 128, NO ones-lane: aggregation outputs
                # only ever feed weight multiplies, whose rowsum
                # correction comes from the weight's ones COLUMN (see
                # sgn_store). When the RHS carried a ones-lane, lane
                # ncols-1 here is 129*deg garbage — harmless, because
                # the next weight's row ncols-1 is a pad row (level 0)
                # and the per-k correction term (H_s[k]+128)(W_s[k]+
                # 128) vanishes for W pad rows regardless of H. At a
                # 128-multiple feature width every lane is real and
                # exact (deg mode), and the old sgn_store here
                # destroyed real column ncols-1.
                return [(r - 128).astype(jnp.int8)]
            return _requant_digits(
                unstk(acc_ref[:, 0:ncols]), out_bits, shift
            )

        def upd(h_digits, l, shift=0):
            acc = _digit_dot(h_digits, w_digits[l])
            if x_signed:
                npw = acc.shape[1]
                # ones-lane rowsum + the weight's precomputed
                # correction row: acc becomes H_levels @ W_levels
                acc = (
                    acc
                    + (acc[:, npw - 1 : npw] << 7)
                    + corr_refs[l][0:1, :]
                )
                r = _requant_raw(acc, out_bits, shift)
                return [sgn_store(r, npw)]
            if w_info[l] is not None:
                s, rw = w_info[l]
                acc = lane_unstack(acc, s, rw, kroll)
            return _requant_digits(acc, out_bits, shift)

        if model == "gcn":
            si = 0
            h = upd(x_digits, 0, sh[si]); si += 1
            rw_h = ws[0].shape[1]
            for l in range(1, n_layers):
                h = agg(h, rw_h, final=False, shift=sh[si]); si += 1
                h = upd(h, l, sh[si]); si += 1
                rw_h = ws[l].shape[1]
            agg(h, rw_h, final=True)
        else:  # gin: aggregate first, weight-multiply last
            si = 0
            h = agg(
                x_digits, x_cols, final=False, shift=sh[si],
                rhs_mode=(
                    ("ones" if x_ones_lane else "deg")
                    if x_signed
                    else None
                ),
            ); si += 1
            rw_h = x_cols
            for l in range(n_layers - 1):
                h = upd(h, l, sh[si]); si += 1
                rw_h = ws[l].shape[1]
                if l < n_layers - 2:
                    h = agg(h, rw_h, final=False, shift=sh[si]); si += 1
            if n_layers > 1:
                h = agg(h, rw_h, final=False, shift=sh[si]); si += 1
            acc = _digit_dot(h, w_digits[-1])
            if x_signed:
                npw = acc.shape[1]
                acc = (
                    acc
                    + (acc[:, npw - 1 : npw] << 7)
                    + corr_refs[-1][0:1, :]
                )
            elif w_info[-1] is not None:
                s, rw = w_info[-1]
                acc = lane_unstack(acc, s, rw, kroll)
            o_ref[0] = acc[:, 0:oc].astype(jnp.float32)

    # GCN aggregates only after the first update, so the accumulator
    # never carries feature-width rows (GIN's first agg does).
    hid_cols = max(w.digits.shape[2] for w in ws)
    if model == "gin":
        hid_cols = max(hid_cols, xp)


    in_specs = [
        pl.BlockSpec(
            (1, nd_x, pn, xp), lambda b, occ: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ] + [
        pl.BlockSpec(kw.shape, lambda b, occ: (0, 0, 0),
                     memory_space=pltpu.VMEM)
        for kw in kw_arrays
    ] + [
        pl.BlockSpec(cr.shape, lambda b, occ: (0, 0),
                     memory_space=pltpu.VMEM)
        for cr in corr_arrays
    ] + [
        pl.BlockSpec(memory_space=pl.ANY),  # a_stack stays in HBM
    ]

    out_shape = jax.ShapeDtypeStruct((B, pn, oc), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, pn, oc), lambda b, occ: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            (
                pltpu.VMEM((pnw, pn), jnp.int32)  # resident packed A
                if resident_a
                else pltpu.VMEM((2, chw, pn), jnp.int32)  # 2-chunk buf
            ),
        ]
        + (
            [pltpu.VMEM((pn, pn), jnp.int8)]  # unpacked-once int8 A
            if unpack_once
            else []
        )
        + (
            # in-kernel digit split of levels-form X (see kernel)
            [pltpu.VMEM(
                (num_digits(x_levels_bits), pn, xp), jnp.int8
            )]
            if x_split
            else []
        )
        + (
            # compact-mode RHS scratch (dynamic sublane block slices
            # need the operand in a ref)
            [pltpu.VMEM((pn, hid_cols), jnp.int8)]
            if compact
            else []
        )
        + (
            # pipe4 double-buffered pair slots of unpacked A blocks
            [pltpu.VMEM((4, chunk, cb), jnp.int8)]
            if compact_pipe == "pipe4"
            else []
        )
        + [
            pltpu.VMEM((pn, hid_cols), jnp.int32),  # aggregation accumulator
            pltpu.SemaphoreType.DMA(
                (nch,) if resident_a else (2, nj)
            ),
        ],
    )
    run = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * pn * pn * 128 * (n_layers + 1),
            bytes_accessed=a_stack.size * 4 * (n_layers + 1) + x_stack.size,
            transcendentals=0,
        ),
        interpret=interpret,
    )
    return run(
        chunk_occ.astype(jnp.int32), x_stack, *kw_arrays,
        *corr_arrays, a_stack,
    )


def fused_baseline_epoch(
    a_stack: jax.Array,  # int8[B, pn, pn] dense 0/1 adjacency
    x_stack: jax.Array,  # float32/bf16[B, pn, xp] features
    ws: Sequence[jax.Array],  # float weight matrices (replicated)
    interpret: Optional[bool] = None,
    resident_a: Optional[bool] = None,
) -> jax.Array:
    """bf16 mega-kernel baseline: the full-precision model chain in
    one pallas call per epoch — the SAME fusion treatment the
    quantized engine gets, for a truly symmetric honest comparison
    (round-1 compared a mega-fused quantized engine against a merely
    scan-fused baseline).

    Per layer (both reference baselines share this shape,
    ``modules.py:16-24`` SAGE and ``:55-99`` GIN):
    ``h = relu((A @ h) @ W)`` with no relu after the last layer.
    The adjacency stays int8 on HBM/VMEM (cast to bf16 per chunk) and
    either resides in VMEM (pn^2 bytes) or streams through a
    two-chunk double buffer — mirroring ``fused_model_epoch``'s
    strategies, minus the 8x packing the quantized engine enjoys.
    """
    B, pn, pn2 = a_stack.shape
    _, pnx, xp = x_stack.shape
    if pn != pn2 or pn != pnx:
        raise ValueError(f"bad stacked shapes {a_stack.shape} {x_stack.shape}")
    interpret = _interpret_default() if interpret is None else interpret
    n_layers = len(ws)
    cp = ws[-1].shape[1]
    hid_cols = max([w.shape[1] for w in ws] + [xp])
    fixed = (
        2 * 2 * pn * xp          # double-buffered x block (bf16)
        + 4 * pn * hid_cols      # f32 aggregation accumulator
        + 2 * 4 * pn * cp        # double-buffered f32 output
        + 2 * 2 * sum(w.size for w in ws)
        + _CHUNK * pn * 3        # chunk int8 + bf16 cast transient
        + (2 << 20)
    )
    if resident_a is None:
        resident_a = fixed + pn * pn <= (15 << 20)
    need = fixed + (pn * pn if resident_a else 0)
    if need > (15 << 20):
        raise ValueError(
            f"baseline bucket pn={pn} needs ~{need >> 20} MB VMEM; "
            "use the scan baseline"
        )
    chunk = next(
        (c for c in (512, 256) if c <= pn and pn % c == 0), None
    )
    if chunk is None:
        raise ValueError(f"pn={pn} has no chunk divisor in (512, 256)")
    nch = pn // chunk

    def kernel(x_ref, *rest):
        ws_refs = rest[:n_layers]
        a_hbm, o_ref, a_vmem, acc_ref, sem = rest[n_layers:]
        b = pl.program_id(0)
        seen_a = [False]

        def copy(c, slot=None):
            if resident_a:
                dst = a_vmem.at[pl.ds(c * chunk, chunk), :]
                s_ = sem.at[c]
            else:
                dst = a_vmem.at[slot]
                s_ = sem.at[slot]
            return pltpu.make_async_copy(
                a_hbm.at[b, pl.ds(c * chunk, chunk), :], dst, s_
            )

        def agg(h):
            ncols = h.shape[1]
            if resident_a:
                first = not seen_a[0]
                if first:
                    for c in range(nch):
                        copy(c).start()
                for c in range(nch):
                    if first:
                        copy(c).wait()
                    a_c = a_vmem[c * chunk:(c + 1) * chunk, :].astype(
                        jnp.bfloat16
                    )
                    acc_ref[c * chunk:(c + 1) * chunk, 0:ncols] = (
                        jax.lax.dot_general(
                            a_c, h, _DOT,
                            preferred_element_type=jnp.float32,
                        )
                    )
                seen_a[0] = True
            else:
                copy(0, 0).start()
                for c in range(nch):
                    slot = c % 2
                    if c + 1 < nch:
                        copy(c + 1, (c + 1) % 2).start()
                    copy(c, slot).wait()
                    a_c = a_vmem[slot].astype(jnp.bfloat16)
                    acc_ref[c * chunk:(c + 1) * chunk, 0:ncols] = (
                        jax.lax.dot_general(
                            a_c, h, _DOT,
                            preferred_element_type=jnp.float32,
                        )
                    )
            return acc_ref[:, 0:ncols]

        h = x_ref[0].astype(jnp.bfloat16)
        for l, w_ref in enumerate(ws_refs):
            aggd = agg(h).astype(jnp.bfloat16)
            out = jax.lax.dot_general(
                aggd, w_ref[...].astype(jnp.bfloat16), _DOT,
                preferred_element_type=jnp.float32,
            )
            if l < n_layers - 1:
                h = jnp.maximum(out, 0.0).astype(jnp.bfloat16)
            else:
                o_ref[0] = out

    in_specs = [
        pl.BlockSpec(
            (1, pn, xp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
    ] + [
        pl.BlockSpec(w.shape, lambda b: (0, 0), memory_space=pltpu.VMEM)
        for w in ws
    ] + [
        pl.BlockSpec(memory_space=pl.ANY),  # a_stack stays in HBM
    ]

    run = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, pn, cp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, pn, cp), jnp.float32),
        scratch_shapes=[
            (
                pltpu.VMEM((pn, pn), jnp.int8)
                if resident_a
                else pltpu.VMEM((2, chunk, pn), jnp.int8)
            ),
            pltpu.VMEM((pn, hid_cols), jnp.float32),
            pltpu.SemaphoreType.DMA((nch if resident_a else 2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * pn * pn * 128 * n_layers,
            bytes_accessed=a_stack.size * n_layers + x_stack.size * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )
    return run(
        x_stack.astype(jnp.float32), *[jnp.asarray(w) for w in ws], a_stack
    )
