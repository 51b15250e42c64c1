"""Signed single-plane mega-kernel mode (>4-bit chains).

With ``x_levels_bits`` set and a free lane on every dot RHS, the mega
kernel runs the whole chain on offset-signed int8 planes: one MXU
pass per GEMM, rowsum corrections from a constant ones-lane, weight
corrections precomputed at pack time (``fused_model.py``, the
whole-model composition of the ``ops/packmm.PreparedRHS`` algebra).
Exact integer equality vs the golden chain for GCN and GIN, with and
without requant shifts, and under zero-block occupancy in both
residency modes.
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


@pytest.mark.parametrize("model", ["gcn", "gin"])
@pytest.mark.parametrize("hid,cls", [(16, 12), (64, 40)])
@pytest.mark.parametrize("shifts", [None, (2, 1, 0, 1, 2)])
def test_signed_mega_exact(rng, model, hid, cls, shifts):
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


@pytest.mark.parametrize("resident", [False, True])
def test_signed_mega_zero_block_occ(rng, resident):
    from qgtc_ppopp22_tpu.runtime import mega_block_occ

    bits, pn, xdim, hid, cls = 8, 512, 100, 16, 12
    qa = np.zeros((pn, pn), np.int32)
    qa[:256, :256] = (rng.random((256, 256)) < 0.05).astype(np.int32)
    qx = rng.integers(0, 256, (pn, xdim)).astype(np.int32)
    qws = [
        rng.integers(0, 256, s).astype(np.int32)
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
            model="gcn", x_cols=xdim, x_levels_bits=bits, out_cols=cls,
            resident_a=resident, chunk_occ=jnp.asarray(occ),
        )
    )[0]
    gold = qgcn_golden(qa, qx, qws, bits, bits)
    np.testing.assert_array_equal(
        out[:, :cls], gold[:, :cls].astype(np.float32)
    )


@pytest.mark.parametrize("shifts", [None, (1, 2, 0, 1, 2)])
def test_mixed_mode_gin_feat128(rng, shifts):
    """GIN with a 128-multiple feature width has no free X lane: the
    first aggregation runs on split digit planes and its requant
    stores the signed form, so the rest of the chain is single-plane
    (MIXED mode). Exact vs golden."""
    bits, pn, xdim, hid, cls = 8, 512, 128, 64, 40
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
            ws, bits, model="gin", x_cols=xdim, x_levels_bits=bits,
            out_cols=cls, shifts=shifts,
        )
    )[0]
    gold = qgin_golden(qa, qx, qws, bits, bits, shifts=shifts)
    np.testing.assert_array_equal(
        out[:, :cls], gold[:, :cls].astype(np.float32)
    )
