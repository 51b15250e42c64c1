"""On-hardware exactness tests (opt-in: QGTC_TPU_TESTS=1).

The default suite runs on CPU with Pallas interpret mode; this module
re-validates the compiled Mosaic kernels on the real chip. Kept
opt-in because each subprocess pays real compile time (~1-5 min cold).
"""

import os

import pytest

from tests.conftest import run_on_tpu

if os.environ.get("QGTC_TPU_TESTS") != "1":
    pytest.skip(
        "set QGTC_TPU_TESTS=1 for on-hardware kernel validation",
        allow_module_level=True,
    )

CODE = r"""
import numpy as np, jax, jax.numpy as jnp
from qgtc_ppopp22_tpu.ops.digits import digit_pack, digit_unpack
from qgtc_ppopp22_tpu.ops.digitmm import digitmm_to_digits, digitmm_to_f32, build_tile_map_digits
from qgtc_ppopp22_tpu.ops.fused_model import fused_model_epoch
from qgtc_ppopp22_tpu.models.qmodels import QModelConfig, init_weights, pack_weights, qgcn_forward
from tests.golden import bitmm_np

rng = np.random.default_rng(0)
for (ab, bb, ob) in [(1,1,1),(2,2,2),(8,8,8)]:
    M,K,N = 512, 640, 130
    qa = rng.integers(0, 1<<ab, (M,K)).astype(np.int32)
    qb = rng.integers(0, 1<<bb, (K,N)).astype(np.int32)
    A, B = digit_pack(jnp.asarray(qa), ab), digit_pack(jnp.asarray(qb), bb)
    assert np.array_equal(np.asarray(digit_unpack(digitmm_to_digits(A,B,ob))),
                          bitmm_np(qa,qb,ab,bb,ob)), (ab,bb,ob)
    assert np.array_equal(np.asarray(digitmm_to_f32(A,B)),
                          bitmm_np(qa,qb,ab,bb,None)), (ab,bb)
print("DIGITMM-HW-OK")

# sparse == dense on-chip
qa = rng.integers(0, 2, (1024, 1024)).astype(np.int32); qa[:, :512] = 0
qb = rng.integers(0, 4, (1024, 128)).astype(np.int32)
A, B = digit_pack(jnp.asarray(qa), 1), digit_pack(jnp.asarray(qb), 2)
tm = build_tile_map_digits(A)
assert np.array_equal(
    np.asarray(digit_unpack(digitmm_to_digits(A, B, 2))),
    np.asarray(digit_unpack(digitmm_to_digits(A, B, 2, tile_map=tm))))
print("SPARSE-HW-OK")

# packed-consuming GEMM (SWAR unpack) on-chip, all output forms
from qgtc_ppopp22_tpu.ops.packmm import (
    pack_rows, pack_rows_np, packmm_to_digits, packmm_to_f32,
    packmm_to_packed, unpack_rows, build_tile_map_packed,
)
for bits_ in (1, 2, 4, 8):
    M, K, N = 512, 640, 64
    qa = rng.integers(0, 1 << bits_, (M, K)).astype(np.int32)
    qb = rng.integers(0, 1 << bits_, (K, N)).astype(np.int32)
    A = pack_rows(jnp.asarray(qa), bits_)
    B = digit_pack(jnp.asarray(qb), bits_)
    assert np.array_equal(
        np.asarray(digit_unpack(packmm_to_digits(A, B, bits_))),
        bitmm_np(qa, qb, bits_, bits_, bits_)), bits_
    assert np.array_equal(
        np.asarray(unpack_rows(packmm_to_packed(A, B, bits_))),
        bitmm_np(qa, qb, bits_, bits_, bits_)), bits_
    assert np.array_equal(
        np.asarray(packmm_to_f32(A, B)),
        bitmm_np(qa, qb, bits_, bits_, None)), bits_
print("PACKMM-HW-OK")

qa = rng.integers(0, 2, (1024, 1024)).astype(np.int32); qa[:, :512] = 0
qb = rng.integers(0, 4, (1024, 128)).astype(np.int32)
A = pack_rows(jnp.asarray(qa), 1)
B = digit_pack(jnp.asarray(qb), 2)
tmp = build_tile_map_packed(A, tile_m=256, tile_k=256)
assert np.array_equal(
    np.asarray(digit_unpack(packmm_to_digits(A, B, 2, tiles=(256, 256, 128)))),
    np.asarray(digit_unpack(packmm_to_digits(A, B, 2, tile_map=tmp))))
print("PACKMM-SPARSE-HW-OK")

# mega kernel (packed adjacency) == per-GEMM chain on-chip,
# dense and chunk-skip variants
from qgtc_ppopp22_tpu.runtime import mega_chunk_occ
bits, pn = 2, 1024
qa = (rng.random((2, pn, pn)) < 0.02).astype(np.int32)
qa[:, 512:, :] = 0  # the second 512-row chunk is all zero
qx = rng.integers(0, 4, (2, pn, 128)).astype(np.int32)
cfg = QModelConfig(128, 16, 40, bit_width=bits)
ws = pack_weights(init_weights(jax.random.PRNGKey(0), cfg), bits, fmt="digits")
x_stack = np.stack([np.asarray(digit_pack(jnp.asarray(q), bits).digits) for q in qx])
a_words = np.concatenate([pack_rows_np(q, 1) for q in qa])
occ = np.stack([mega_chunk_occ(w[None], 512) for w in a_words])
assert occ.min() == 0
out = fused_model_epoch(jnp.asarray(a_words), jnp.asarray(x_stack), ws, bits, model="gcn")
out_skip = fused_model_epoch(jnp.asarray(a_words), jnp.asarray(x_stack), ws, bits,
                             model="gcn", chunk_occ=jnp.asarray(occ))
assert np.array_equal(np.asarray(out), np.asarray(out_skip))
for b in range(2):
    ref = np.asarray(qgcn_forward(
        digit_pack(jnp.asarray(qa[b].astype(np.int32)), 1),
        digit_pack(jnp.asarray(qx[b]), bits), ws, out_bits=bits))
    assert np.array_equal(np.asarray(out[b])[:, :ref.shape[1]], ref), b
print("MEGA-HW-OK")

# lane-stacked multi-digit paths on-chip (ops/digits.lane_stack):
# 8-bit operands at real widths <= 64 ride one 128-lane tile — the
# Mosaic pltpu.roll fold-back must match the interpret-mode semantics
from qgtc_ppopp22_tpu.models.qmodels import qgcn_golden, qgin_golden
M, K, N = 512, 640, 16
qa8 = rng.integers(0, 256, (M, K)).astype(np.int32)
qb8 = rng.integers(0, 256, (K, N)).astype(np.int32)
A8, B8 = digit_pack(jnp.asarray(qa8), 8), digit_pack(jnp.asarray(qb8), 8)
assert B8.digits.shape[0] == 2
assert np.array_equal(
    np.asarray(digit_unpack(digitmm_to_digits(A8, B8, 8))),
    bitmm_np(qa8, qb8, 8, 8, 8))
pn, feat, hid, ncls = 1024, 29, 16, 12
qa = (rng.random((2, pn, pn)) < 0.03).astype(np.int32)
qx = rng.integers(0, 256, (2, pn, feat)).astype(np.int32)
qws = [rng.integers(0, 256, s).astype(np.int32)
       for s in [(feat, hid), (hid, hid), (hid, ncls)]]
ws8 = [digit_pack(jnp.asarray(w), 8) for w in qws]
x_stack = np.stack([np.asarray(digit_pack(jnp.asarray(q), 8).digits) for q in qx])
a_words = np.concatenate([pack_rows_np(q, 1) for q in qa])
for model, golden in (("gcn", qgcn_golden), ("gin", qgin_golden)):
    for resident in (True, False):
        out = fused_model_epoch(
            jnp.asarray(a_words), jnp.asarray(x_stack), ws8, 8,
            model=model, resident_a=resident, x_cols=feat)
        for b in range(2):
            want = golden(qa[b], qx[b], qws, 8, 8)
            assert np.array_equal(
                np.asarray(out[b])[:, :want.shape[1]],
                want.astype(np.float32)), (model, resident, b)
print("STACKED-HW-OK")

# offset-signed single-plane paths (round 4): the PreparedRHS
# streaming GEMM and the signed mega chains (x as byte levels)
from qgtc_ppopp22_tpu.ops.packmm import prepare_rhs
qa8 = rng.integers(0, 256, (512, 640)).astype(np.int32)
qb8 = rng.integers(0, 256, (640, 60)).astype(np.int32)
A8 = pack_rows(jnp.asarray(qa8), 8)
bp = prepare_rhs(digit_pack(jnp.asarray(qb8), 8))
assert np.array_equal(
    np.asarray(unpack_rows(packmm_to_packed(A8, bp, 8))),
    bitmm_np(qa8, qb8, 8, 8, 8))
assert np.array_equal(
    np.asarray(packmm_to_f32(A8, bp, out_cols=60)),
    bitmm_np(qa8, qb8, 8, 8, None))
print("PREPARED-RHS-HW-OK")

def levels_bytes(q):
    d = digit_pack(jnp.asarray(q), 8).digits
    return (np.asarray(d[0], np.int32) | (np.asarray(d[1], np.int32) << 4)).astype(np.int8)
# LINEAR-RANGE data (sparse 0/1 weights + shifts): uniform 0-255
# saturates every requant to the 255 rail, where value corruption is
# invisible (the round-4 MIXED-mode bug passed saturating HW tests).
# feat=128 drives GIN's first aggregation through "deg" mode (VPU
# row-sum of the adjacency chunk -- the lowering this suite exists to
# prove on real Mosaic, per the round-3 interpret-vs-HW lesson).
shifts_l = (0, 2, 3, 2, 3)
for model, golden, feat in (("gcn", qgcn_golden, 29),
                            ("gin", qgin_golden, 29),
                            ("gin", qgin_golden, 128)):  # 128: deg mode
    pn, hid, ncls = 512, 16 if model == "gcn" else 64, 12
    qa = (rng.random((pn, pn)) < 0.03).astype(np.int32)
    qx = rng.integers(0, 4, (pn, feat)).astype(np.int32)
    qws = [(rng.random(s) < 0.1).astype(np.int32)
           for s in [(feat, hid), (hid, hid), (hid, ncls)]]
    ws8 = [digit_pack(jnp.asarray(w), 8) for w in qws]
    out = fused_model_epoch(
        jnp.asarray(pack_rows_np(qa, 1)), jnp.asarray(levels_bytes(qx))[None, None],
        ws8, 8, model=model, x_cols=feat, x_levels_bits=8, out_cols=ncls,
        shifts=shifts_l)
    want = golden(qa, qx, qws, 8, 8, shifts=shifts_l)
    assert np.array_equal(
        np.asarray(out[0])[:, :ncls], want[:, :ncls].astype(np.float32)
    ), (model, feat)
    # saturating-rail variant keeps the clamp semantics covered
    qx2 = rng.integers(0, 256, (pn, feat)).astype(np.int32)
    qws2 = [rng.integers(0, 256, s).astype(np.int32)
            for s in [(feat, hid), (hid, hid), (hid, ncls)]]
    out2 = fused_model_epoch(
        jnp.asarray(pack_rows_np(qa, 1)), jnp.asarray(levels_bytes(qx2))[None, None],
        [digit_pack(jnp.asarray(w), 8) for w in qws2], 8,
        model=model, x_cols=feat, x_levels_bits=8, out_cols=ncls)
    want2 = golden(qa, qx2, qws2, 8, 8)
    assert np.array_equal(
        np.asarray(out2[0])[:, :ncls], want2[:, :ncls].astype(np.float32)
    ), (model, feat, "saturating")
print("SIGNED-CHAIN-HW-OK")

# occupancy-compacted resident block schedule (r5): fori over only
# the occupied blocks with dynamic lane/sublane ref slices — the
# exact lowering this suite exists to re-prove on real Mosaic
from qgtc_ppopp22_tpu.runtime import mega_block_sched
from qgtc_ppopp22_tpu.ops.fused_model import mega_colblock
pn_c, xdim_c, hid_c, cls_c = 1024, 100, 16, 12
qa = np.zeros((pn_c, pn_c), np.int32)
qa[:512, :512] = (rng.random((512, 512)) < 0.03).astype(np.int32)
qa[512:, 512:] = (rng.random((512, 512)) < 0.03).astype(np.int32)
qa[600:610, :64] = 1
qx = rng.integers(0, 4, (pn_c, xdim_c)).astype(np.int32)
qws = [(rng.random(s) < 0.1).astype(np.int32)
       for s in ((xdim_c, hid_c), (hid_c, hid_c), (hid_c, cls_c))]
aw = pack_rows_np(qa, 1)
sched = mega_block_sched(aw, 512, mega_colblock(pn_c))[None]
assert sched[0, :, 0].sum() < sched.shape[1] * (sched.shape[2] - 1)
for model, golden in (("gcn", qgcn_golden), ("gin", qgin_golden)):
    ws2 = [digit_pack(jnp.asarray(w), 2) for w in qws]
    xd2 = digit_pack(jnp.asarray(qx), 2).digits
    out = fused_model_epoch(
        jnp.asarray(aw[0])[None],
        jnp.asarray(np.asarray(xd2[0], np.int8))[None, None], ws2, 2,
        model=model, x_cols=xdim_c, out_cols=cls_c, resident_a=True,
        blk_sched=jnp.asarray(sched), shifts=(0, 2, 3, 2, 3))
    want = golden(qa, qx, qws, 2, 2, shifts=(0, 2, 3, 2, 3))
    assert np.array_equal(
        np.asarray(out[0])[:, :cls_c], want[:, :cls_c].astype(np.float32)
    ), ("compact", model)
print("COMPACT-HW-OK")

# shard_map + Mosaic on REAL TPU (VERDICT r4 #5): the mesh layer had
# only ever run under CPU interpret (8-device virtual mesh), and the
# round-3 lane-stack lesson shows interpret-mode success does not
# imply the kernel lowers on hardware. One real chip -> a 1-device
# (dp=1, sp=1) mesh: this cannot exercise real collectives (ppermute
# degenerates to identity) but DOES prove both shard_map-wrapped
# production paths — the whole-epoch mega kernel and the packed
# per-GEMM ring kernels — compile and run bit-exactly inside
# shard_map on TPU.
from qgtc_ppopp22_tpu.graph.datasets import synthesize
from qgtc_ppopp22_tpu.graph.batching import ClusterBatcher
from qgtc_ppopp22_tpu.runtime import QGTCEngine
from qgtc_ppopp22_tpu.parallel import MeshEngine

ds = synthesize("Proteins", scale=0.05, seed=0)
for model in ("gcn", "gin"):
    batcher = ClusterBatcher(ds, psize=8, batch_size=2, bit_width=2,
                             shuffle=False)
    ref_eng = QGTCEngine(batcher.feat_dim, ds.num_classes, model=model,
                         bit_width=2, seed=0)
    refs = [np.asarray(ref_eng.forward_batch(b)) for b in batcher.batches]
    for force_mega in (True, False):
        eng = MeshEngine(batcher.feat_dim, ds.num_classes, dp=1, sp=1,
                         model=model, bit_width=2, seed=0)
        if not force_mega:
            # reach the packed ring kernels (normally the sp>1 path)
            # by disabling the mega route for this staging
            eng._force_ring = True
        outs = eng.forward_batches(batcher)
        for i, (r, o) in enumerate(zip(refs, outs)):
            assert np.array_equal(r[: o.shape[0], : o.shape[1]], o), (
                model, force_mega, i)
print("MESH-HW-OK")
"""


def test_kernels_on_hardware():
    out = run_on_tpu(CODE, timeout=1800)
    assert "DIGITMM-HW-OK" in out
    assert "SPARSE-HW-OK" in out
    assert "PACKMM-HW-OK" in out
    assert "PACKMM-SPARSE-HW-OK" in out
    assert "MEGA-HW-OK" in out
    assert "STACKED-HW-OK" in out
    assert "PREPARED-RHS-HW-OK" in out
    assert "SIGNED-CHAIN-HW-OK" in out
    assert "COMPACT-HW-OK" in out
    assert "MESH-HW-OK" in out
