"""Signed single-plane mega-kernel mode (>4-bit chains).

With ``x_levels_bits`` set and a free lane on every weight, the mega
kernel runs the whole chain on offset-signed int8 planes: one MXU
pass per GEMM, rowsum corrections from constant ones columns, weight
corrections precomputed at pack time (``fused_model.py``, the
whole-model composition of the ``ops/packmm.PreparedRHS`` algebra).
GIN's first aggregation takes its degree correction from a free X
lane when one exists ("ones" mode) or a VPU row-sum of the adjacency
chunk at 128-multiple feature widths ("deg" mode).

Two data regimes, both asserted EXACT vs golden:

* saturating (uniform 0-255): exercises the requant clamp rails;
* linear (sparse 0/1 weights + shifts keeping intermediate levels
  strictly inside [0, 2^bits-1)): the regime that actually detects
  value corruption — the round-4 MIXED-mode bug (the aggregation
  store's ones-lane overwrote REAL feature column ncols-1) was
  invisible to saturating data because every clobbered level
  saturated to the same 255 rail downstream.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from qgtc_ppopp22_tpu.ops.digits import digit_pack
from qgtc_ppopp22_tpu.ops.fused_model import fused_model_epoch
from qgtc_ppopp22_tpu.ops.packmm import pack_rows_np
from qgtc_ppopp22_tpu.models.qmodels import qgcn_golden, qgin_golden


def _levels_bytes(qx, bits):
    xd = digit_pack(jnp.asarray(qx), bits).digits
    return (
        np.asarray(xd[0], np.int32) | (np.asarray(xd[1], np.int32) << 4)
    ).astype(np.int8)[None, None]


def _linear_case(rng, pn, xdim, hid, cls):
    """Sparse 0/1 weights + small X levels: with the shifts below,
    intermediate requant levels stay mostly inside the linear range,
    so any clobbered value changes the output (no saturation rail to
    hide behind)."""
    qa = (rng.random((pn, pn)) < 0.02).astype(np.int32)
    qx = rng.integers(0, 4, (pn, xdim)).astype(np.int32)
    qws = [
        (rng.random(s) < 0.1).astype(np.int32)
        for s in ((xdim, hid), (hid, hid), (hid, cls))
    ]
    return qa, qx, qws


_LINEAR_SHIFTS = (0, 2, 3, 2, 3)


def _assert_linear_chain(model, qa, qx, qws, bits, shifts):
    """Guard against saturation-masking: every intermediate requant
    stage must keep a majority of its levels strictly below the
    2^bits - 1 rail (and produce nonzero levels)."""
    from tests.golden import bitmm_np

    sh = list(shifts)
    rail = (1 << bits) - 1
    stages = []
    if model == "gcn":
        h = bitmm_np(qx, qws[0], bits, bits, bits, sh[0])
        stages.append(h)
        for l, w in enumerate(qws[1:], start=1):
            h = bitmm_np(qa, h, 1, bits, bits, sh[2 * l - 1])
            stages.append(h)
            h = bitmm_np(h, w, bits, bits, bits, sh[2 * l])
            stages.append(h)
    else:
        h = bitmm_np(qa, qx, 1, bits, bits, sh[0])
        stages.append(h)
        si = 1
        for w in qws[:-1]:
            h = bitmm_np(h, w, bits, bits, bits, sh[si]); si += 1
            stages.append(h)
            h = bitmm_np(qa, h, 1, bits, bits, sh[si]); si += 1
            stages.append(h)
    for i, s in enumerate(stages):
        assert (s < rail).mean() > 0.5, f"stage {i} saturation-masked"
        assert s.max() > 0, f"stage {i} all-zero"


@pytest.mark.parametrize("model", ["gcn", "gin"])
@pytest.mark.parametrize("hid,cls", [(16, 12), (64, 40)])
@pytest.mark.parametrize("shifts", [None, (2, 1, 0, 1, 2)])
def test_signed_mega_saturating(rng, model, hid, cls, shifts):
    """Uniform 0-255 data: exercises the requant clamp rails."""
    bits, pn, xdim = 8, 512, 100
    qa = (rng.random((pn, pn)) < 0.02).astype(np.int32)
    qx = rng.integers(0, 256, (pn, xdim)).astype(np.int32)
    qws = [
        rng.integers(0, 256, s).astype(np.int32)
        for s in ((xdim, hid), (hid, hid), (hid, cls))
    ]
    aw = pack_rows_np(qa, 1)[0]
    ws = [digit_pack(jnp.asarray(w), bits) for w in qws]
    out = np.asarray(
        fused_model_epoch(
            jnp.asarray(aw)[None], jnp.asarray(_levels_bytes(qx, bits)),
            ws, bits, model=model, x_cols=xdim, x_levels_bits=bits,
            out_cols=cls, shifts=shifts,
        )
    )[0]
    gold = (qgcn_golden if model == "gcn" else qgin_golden)(
        qa, qx, qws, bits, bits, shifts=shifts
    )
    np.testing.assert_array_equal(
        out[:, :cls], gold[:, :cls].astype(np.float32)
    )


@pytest.mark.parametrize("model", ["gcn", "gin"])
@pytest.mark.parametrize("xdim", [100, 128])
def test_signed_mega_linear(rng, model, xdim):
    """Linear-range data (corruption-detecting): xdim=128 drives
    GIN's first aggregation through "deg" mode (no free X lane);
    xdim=100 through "ones" mode."""
    bits, pn, hid, cls = 8, 512, 64, 40
    qa, qx, qws = _linear_case(rng, pn, xdim, hid, cls)
    _assert_linear_chain(model, qa, qx, qws, bits, _LINEAR_SHIFTS)
    aw = pack_rows_np(qa, 1)[0]
    ws = [digit_pack(jnp.asarray(w), bits) for w in qws]
    out = np.asarray(
        fused_model_epoch(
            jnp.asarray(aw)[None], jnp.asarray(_levels_bytes(qx, bits)),
            ws, bits, model=model, x_cols=xdim, x_levels_bits=bits,
            out_cols=cls, shifts=_LINEAR_SHIFTS,
        )
    )[0]
    gold = (qgcn_golden if model == "gcn" else qgin_golden)(
        qa, qx, qws, bits, bits, shifts=_LINEAR_SHIFTS
    )
    np.testing.assert_array_equal(
        out[:, :cls], gold[:, :cls].astype(np.float32)
    )


def test_signed_gin_single_layer_feat128(rng):
    """1-layer GIN exposes the first aggregation's store directly in
    the float output (the composition that caught the MIXED-mode
    ones-lane corruption: 4096 wrong logits before the fix)."""
    bits, pn, xdim, hid = 8, 512, 128, 64
    qa = (rng.random((pn, pn)) < 0.02).astype(np.int32)
    qx = rng.integers(0, 4, (pn, xdim)).astype(np.int32)
    qw = (rng.random((xdim, hid)) < 0.1).astype(np.int32)
    aw = pack_rows_np(qa, 1)[0]
    ws = [digit_pack(jnp.asarray(qw), bits)]
    out = np.asarray(
        fused_model_epoch(
            jnp.asarray(aw)[None], jnp.asarray(_levels_bytes(qx, bits)),
            ws, bits, model="gin", x_cols=xdim, x_levels_bits=bits,
            out_cols=hid,
        )
    )[0]
    gold = qgin_golden(qa, qx, [qw], bits, bits)
    np.testing.assert_array_equal(
        out[:, :hid], gold[:, :hid].astype(np.float32)
    )


@pytest.mark.parametrize("model,xdim", [("gcn", 100), ("gin", 128)])
@pytest.mark.parametrize("resident", [False, True])
def test_signed_mega_zero_block_occ(rng, model, xdim, resident):
    """2-D zero-block skipping under the signed chain, both residency
    modes; GIN at xdim=128 checks the per-block "deg" row-sum
    composition (skipped blocks contribute zero degree)."""
    from qgtc_ppopp22_tpu.runtime import mega_block_occ

    bits, pn, hid, cls = 8, 512, 64, 40
    rng2 = np.random.default_rng(7)
    qa = np.zeros((pn, pn), np.int32)
    qa[:256, :256] = (rng2.random((256, 256)) < 0.05).astype(np.int32)
    qx = rng.integers(0, 4, (pn, xdim)).astype(np.int32)
    qws = [
        (rng.random(s) < 0.1).astype(np.int32)
        for s in ((xdim, hid), (hid, hid), (hid, cls))
    ]
    aw = pack_rows_np(qa, 1)
    ws = [digit_pack(jnp.asarray(w), bits) for w in qws]
    occ = mega_block_occ(aw, 512, 256)[None]
    assert occ.sum() < occ.size  # blocks actually skip
    out = np.asarray(
        fused_model_epoch(
            jnp.asarray(aw[0])[None],
            jnp.asarray(_levels_bytes(qx, bits)), ws, bits,
            model=model, x_cols=xdim, x_levels_bits=bits, out_cols=cls,
            resident_a=resident, chunk_occ=jnp.asarray(occ),
            shifts=_LINEAR_SHIFTS,
        )
    )[0]
    gold = (qgcn_golden if model == "gcn" else qgin_golden)(
        qa, qx, qws, bits, bits, shifts=_LINEAR_SHIFTS
    )
    np.testing.assert_array_equal(
        out[:, :cls], gold[:, :cls].astype(np.float32)
    )


@pytest.mark.parametrize("model", ["gcn", "gin"])
@pytest.mark.parametrize("bits", [2, 8])
def test_compact_block_schedule(rng, model, bits):
    """Occupancy-compacted resident aggregation (blk_sched): exact vs
    golden on a block-sparse adjacency, 2-bit digit chain and 8-bit
    signed chain, both models."""
    from qgtc_ppopp22_tpu.runtime import mega_block_sched

    pn, xdim, hid, cls = 1024, 100, 16, 12
    rng2 = np.random.default_rng(11)
    qa = np.zeros((pn, pn), np.int32)
    # banded + off-band structure so the two row chunks have distinct
    # occupied block sets (and genuinely skipped blocks)
    qa[:512, :512] = (rng2.random((512, 512)) < 0.03).astype(np.int32)
    qa[512:, 512:] = (rng2.random((512, 512)) < 0.03).astype(np.int32)
    qa[600:610, :64] = 1
    qx = rng.integers(0, 4, (pn, xdim)).astype(np.int32)
    qws = [
        (rng.random(s) < 0.1).astype(np.int32)
        for s in ((xdim, hid), (hid, hid), (hid, cls))
    ]
    aw = pack_rows_np(qa, 1)
    ws = [digit_pack(jnp.asarray(w), bits) for w in qws]
    sched = mega_block_sched(aw, 512, 256)[None]
    assert sched[0, :, 0].sum() < sched.shape[1] * (sched.shape[2] - 1)
    if bits == 8:
        xin = jnp.asarray(_levels_bytes(qx, bits))
        kw = dict(x_levels_bits=bits)
    else:
        xd = digit_pack(jnp.asarray(qx), bits).digits
        xin = jnp.asarray(np.asarray(xd[0], np.int8))[None, None]
        kw = {}
    out = np.asarray(
        fused_model_epoch(
            jnp.asarray(aw[0])[None], xin, ws, bits,
            model=model, x_cols=xdim, out_cols=cls,
            resident_a=True, blk_sched=jnp.asarray(sched),
            shifts=_LINEAR_SHIFTS, **kw,
        )
    )[0]
    gold = (qgcn_golden if model == "gcn" else qgin_golden)(
        qa, qx, qws, bits, bits, shifts=_LINEAR_SHIFTS
    )
    np.testing.assert_array_equal(
        out[:, :cls], gold[:, :cls].astype(np.float32)
    )


@pytest.mark.parametrize("pipe", ["unroll4", "pipe4"])
def test_compact_pipe_variant_schedules(rng, monkeypatch, pipe):
    """The QGTC_COMPACT_PIPE ablation schedules (deeper-ILP fori
    forms, measured ~30% SLOWER on HW than the default 2-wide body —
    results/compact_pipeline_study.csv — and kept as knobs) must stay
    bit-exact: the compact case re-run under each knob value."""
    monkeypatch.setenv("QGTC_COMPACT_PIPE", pipe)
    test_compact_block_schedule(rng, "gcn", 2)
