"""Multi-chip execution of the PRODUCTION packed fast path.

``parallel/sharded.py`` proves the mesh math on dense int8 digit
planes — the *compute* format, 8x the packed footprint. This module
runs the same (dp, sp) meshes on the **storage format the single-chip
product ships**: the M-packed adjacency words of
:class:`~qgtc_ppopp22_tpu.ops.packmm.PackedTensor` (what
``runtime.QGTCEngine.put_batch`` transfers and what the mega kernel
eats), so multi-chip scaling is of the real engine, not a side
library.

Two execution shapes:

* :func:`dp_mega_epoch_packed` — batches sharded over ``dp``, each
  device running the UNCHANGED whole-epoch mega kernel
  (``ops/fused_model.py``) on its local batch stack. Zero cross-chip
  traffic at steady state (cluster batches are independent,
  ``sampler.py:67``); this is the production scaling axis.
* :func:`dp_sp_epoch_packed` — additionally shards each batch's
  adjacency *word rows* over ``sp`` (the 256-row ``PACK_GROUP`` layout
  is shard-aligned by construction), for batches whose packed
  adjacency exceeds one chip. Aggregations use the ring schedule of
  ``parallel/sharded.py`` — the hidden shard rotates via
  ``jax.lax.ppermute`` while each device multiplies its local packed
  **column block** against the shard in hand — but the shard-local
  GEMM is the in-kernel-SWAR-unpack packed kernel
  (:func:`~qgtc_ppopp22_tpu.ops.packmm.packmm_to_i32`), int32-exact
  partials throughout.

The reference is single-GPU (SURVEY §2.3; its one NCCL trace is a
vestigial macro, ``utility.h:94-101``) — this layer is new design per
the BASELINE north star. Single-chip parity semantics anchor to the
reference's epoch loop (``main_qgtc.py:112-159``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qgtc_ppopp22_tpu.ops.digits import DigitTensor
from qgtc_ppopp22_tpu.ops.digitmm import digitmm_to_digits, digitmm_to_f32
from qgtc_ppopp22_tpu.ops.packmm import (
    PACK_GROUP,
    PackedTensor,
    packmm_to_i32,
)
from qgtc_ppopp22_tpu.ops.quantize import requantize_wrapped
from qgtc_ppopp22_tpu.parallel.sharded import _levels_to_digits

__all__ = [
    "dp_sp_epoch_packed",
    "dp_mega_epoch_packed",
    "shard_packed_batches",
]

_RPW = 32  # adjacency rows per packed word (1-bit)


def _make_ring_agg_packed(a_words, nd_a, rows_loc, n_sp, interpret):
    """Ring-pipelined ``A @ H`` where A is the shard's M-packed words.

    ``a_words``: int32[nd_a, rows_loc//32, pn] — this device's row
    block of the batch adjacency in the packed storage layout. At
    rotation ``r`` the device multiplies the column block owned by the
    shard whose hidden rows are currently in hand:

        out_local = sum_r  packmm(A_local[:, cols(r)], H_(r))

    The ppermute of rotation ``r+1`` overlaps rotation ``r``'s GEMM
    (same schedule as ``sharded._make_ring_agg``); partials ride the
    raw int32 kernel output so exactness never depends on the f32
    mantissa bound. The column slice costs nothing extra: the packed
    layout packs along M, so a K (column) range of A is a contiguous
    lane slice of the words.
    """
    perm = [(i, (i + 1) % n_sp) for i in range(n_sp)]
    mw_loc = rows_loc // _RPW

    def ring_agg(h_loc: DigitTensor, ob, shift: int = 0):
        idx = jax.lax.axis_index("sp")
        ncols = h_loc.digits.shape[2]
        acc = jnp.zeros((rows_loc, ncols), jnp.int32)
        cur = h_loc.digits
        src = idx
        for _ in range(n_sp):
            blk_start = src * rows_loc
            w_blk = jax.lax.dynamic_slice(
                a_words, (0, 0, blk_start), (nd_a, mw_loc, rows_loc)
            )
            a_blk = PackedTensor(
                words=w_blk, shape=(rows_loc, rows_loc), bits=1
            )
            h_t = DigitTensor(
                digits=cur, shape=(rows_loc, ncols), bits=h_loc.bits
            )
            acc = acc + packmm_to_i32(a_blk, h_t, interpret=interpret)
            cur = jax.lax.ppermute(cur, "sp", perm)
            src = jax.lax.rem(src + n_sp - 1, n_sp)
        if ob is None:
            return acc.astype(jnp.float32)
        levels = requantize_wrapped(acc, ob, shift)
        return _levels_to_digits(levels, ob, (rows_loc, h_loc.shape[1]))

    return ring_agg


def dp_sp_epoch_packed(
    mesh: Mesh,
    a_stack: jax.Array,  # int32[B, nd_a, pn//32, pn] M-packed words
    x_stack: jax.Array,  # int8[B, nd_x, pn, xp] feature digits
    ws: Sequence[DigitTensor],
    out_bits: int,
    x_bits: int = 2,
    model: str = "gcn",
    interpret: Optional[bool] = None,
    shifts: Optional[Sequence[int]] = None,
    x_cols: Optional[int] = None,
) -> jnp.ndarray:
    """Mesh step on the packed storage format: batches over ``dp``,
    adjacency word-rows + feature rows over ``sp``.

    ``x_cols``: the features' real (unpadded) column count — the
    contraction extent against the first weight's logical rows.

    ``B`` must divide by ``dp`` and ``pn`` by ``sp * PACK_GROUP`` (so
    each shard's words are whole 256-row pack groups — the layout is
    shard-aligned, no repacking). Semantics identical to the
    single-chip :func:`~qgtc_ppopp22_tpu.models.qmodels.qgcn_forward`
    / ``qgin_forward`` on each batch; returns [B, pn, cls_padded]
    float32 logits.
    """
    if model not in ("gcn", "gin"):
        raise ValueError(model)
    n_sp = mesh.shape["sp"]
    B, nd_a, mw, pn = a_stack.shape
    _, nd_x, pnx, xp = x_stack.shape
    if mw * _RPW != pn or pn != pnx:
        raise ValueError(f"bad stacks {a_stack.shape} / {x_stack.shape}")
    if pn % (n_sp * PACK_GROUP):
        raise ValueError(
            f"pn={pn} must divide by sp*{PACK_GROUP}={n_sp * PACK_GROUP} "
            "(whole pack groups per shard)"
        )
    rows_loc = pn // n_sp
    w_meta = [(w.shape, w.bits) for w in ws]
    n_layers = len(ws)
    sh = list(shifts) if shifts is not None else [0] * (2 * n_layers - 1)

    xc = xp if x_cols is None else int(x_cols)

    def one_batch(a_w, x_d, w_ds):
        h = DigitTensor(digits=x_d, shape=(rows_loc, xc), bits=x_bits)
        ws_loc = [
            DigitTensor(digits=w_d, shape=m[0], bits=m[1])
            for w_d, m in zip(w_ds, w_meta)
        ]
        ring_agg = _make_ring_agg_packed(
            a_w, nd_a, rows_loc, n_sp, interpret
        )
        if model == "gcn":
            si = 0
            for l, w in enumerate(ws_loc):
                h = digitmm_to_digits(
                    h, w, out_bits, interpret=interpret, shift=sh[si]
                )
                si += 1
                if l < n_layers - 1:
                    h = ring_agg(h, out_bits, sh[si])
                    si += 1
            return ring_agg(h, None)
        # gin: aggregate-then-update (main_qgtc.py:131-138)
        si = 0
        h = ring_agg(h, out_bits, sh[si])
        si += 1
        for w in ws_loc[:-1]:
            h = digitmm_to_digits(
                h, w, out_bits, interpret=interpret, shift=sh[si]
            )
            si += 1
            h = ring_agg(h, out_bits, sh[si])
            si += 1
        return digitmm_to_f32(h, ws_loc[-1], interpret=interpret)

    def body(a_s, x_s, *w_ds):
        outs = []
        for i in range(a_s.shape[0]):  # B/dp local batches, static
            outs.append(one_batch(a_s[i], x_s[i], w_ds))
        return jnp.stack(outs)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("dp", None, "sp", None), P("dp", None, "sp", None))
        + tuple(P() for _ in ws),
        out_specs=P("dp", "sp", None),
        check_vma=False,
    )
    return fn(a_stack, x_stack, *[w.digits for w in ws])


def dp_mega_epoch_packed(
    mesh: Mesh,
    a_stack: jax.Array,  # int32[B, pn//32, pn] M-packed 1-bit words
    x_stack: jax.Array,  # int8[B, nd_x, pn, xp] feature digits
    ws: Sequence[DigitTensor],
    out_bits: int,
    model: str = "gcn",
    interpret: Optional[bool] = None,
    shifts: Optional[Sequence[int]] = None,
    resident_a: Optional[bool] = None,
    chunk_occ: Optional[jax.Array] = None,
    out_cols: Optional[int] = None,
    x_cols: Optional[int] = None,
    blk_sched: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Whole-epoch mega kernel, batches sharded over the ``dp`` axis.

    Each device runs the UNCHANGED production mega kernel
    (:func:`~qgtc_ppopp22_tpu.ops.fused_model.fused_model_epoch`) on
    its local slice of the stacked epoch — packed adjacency words in,
    one pallas launch per device per epoch, no collectives (batches
    are independent). ``B`` must divide by ``dp``; the ``sp`` mesh
    axis, if present, must be 1 for this path. ``chunk_occ`` /
    ``blk_sched`` (exclusive) shard with the batch axis, so each
    device runs the same streaming zero-block / compacted resident
    schedule the single-chip engine would.
    """
    from qgtc_ppopp22_tpu.ops.fused_model import fused_model_epoch

    B = a_stack.shape[0]
    dp = mesh.shape["dp"]
    if B % dp:
        raise ValueError(f"B={B} not divisible by dp={dp}")
    if "sp" in mesh.shape and mesh.shape["sp"] != 1:
        raise ValueError("dp_mega_epoch_packed needs sp=1 (use "
                         "dp_sp_epoch_packed for row-sharded batches)")
    if chunk_occ is not None and blk_sched is not None:
        raise ValueError("chunk_occ and blk_sched are exclusive")
    w_meta = [(w.shape, w.bits) for w in ws]
    aux = chunk_occ if chunk_occ is not None else blk_sched
    n_occ = 1 if aux is not None else 0

    def body(a_s, x_s, *rest):
        aux_s = rest[0] if n_occ else None
        w_ds = rest[n_occ:]
        ws_loc = [
            DigitTensor(digits=w_d, shape=m[0], bits=m[1])
            for w_d, m in zip(w_ds, w_meta)
        ]
        return fused_model_epoch(
            a_s, x_s, ws_loc, out_bits, model=model, interpret=interpret,
            shifts=shifts, resident_a=resident_a,
            chunk_occ=aux_s if chunk_occ is not None else None,
            blk_sched=aux_s if blk_sched is not None else None,
            out_cols=out_cols, x_cols=x_cols,
        )

    occ_specs = ()
    occ_args = ()
    if aux is not None:
        occ_specs = (P("dp", *([None] * (aux.ndim - 1))),)
        occ_args = (aux,)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("dp", None, None), P("dp", None, None, None))
        + occ_specs + tuple(P() for _ in ws),
        out_specs=P("dp", None, None),
        check_vma=False,
    )
    return fn(a_stack, x_stack, *occ_args, *[w.digits for w in ws])


def shard_packed_batches(
    mesh: Mesh, a_stack, x_stack, sp_shard_rows: bool = True
):
    """Place stacked packed batches with (dp[, sp]) sharding.

    ``a_stack``: [B, nd_a, mw, pn] words (or [B, mw, pn] for the mega
    path); ``x_stack``: [B, nd_x, pn, xp] digits. With
    ``sp_shard_rows`` the word-row / feature-row axis is sharded over
    ``sp``; otherwise only the batch axis is split (mega path).
    """
    if sp_shard_rows:
        a_sh = NamedSharding(mesh, P("dp", None, "sp", None))
        x_sh = NamedSharding(mesh, P("dp", None, "sp", None))
    else:
        a_sh = NamedSharding(
            mesh, P("dp", *([None] * (a_stack.ndim - 1)))
        )
        x_sh = NamedSharding(
            mesh, P("dp", *([None] * (x_stack.ndim - 1)))
        )
    return jax.device_put(a_stack, a_sh), jax.device_put(x_stack, x_sh)
