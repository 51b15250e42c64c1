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

# mega kernel == per-GEMM chain on-chip
bits, pn = 2, 512
qa = (rng.random((2, pn, pn)) < 0.02).astype(np.int8)
qx = rng.integers(0, 4, (2, pn, 128)).astype(np.int32)
cfg = QModelConfig(128, 16, 40, bit_width=bits)
ws = pack_weights(init_weights(jax.random.PRNGKey(0), cfg), bits, fmt="digits")
x_stack = np.stack([np.asarray(digit_pack(jnp.asarray(q), bits).digits) for q in qx])
out = fused_model_epoch(jnp.asarray(qa), jnp.asarray(x_stack), ws, bits, model="gcn")
for b in range(2):
    ref = np.asarray(qgcn_forward(
        digit_pack(jnp.asarray(qa[b].astype(np.int32)), 1),
        digit_pack(jnp.asarray(qx[b]), bits), ws, out_bits=bits))
    assert np.array_equal(np.asarray(out[b])[:, :ref.shape[1]], ref), b
print("MEGA-HW-OK")
"""


def test_kernels_on_hardware():
    out = run_on_tpu(CODE, timeout=1200)
    assert "DIGITMM-HW-OK" in out
    assert "SPARSE-HW-OK" in out
    assert "MEGA-HW-OK" in out
