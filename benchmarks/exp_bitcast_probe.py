"""Probe pltpu.bitcast int32->int8 sublane mapping on TPU.

One-off experiment for the packed-operand kernel design: we need to
know which output sublane each byte of an int32 word lands on.
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/qgtc_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe32to8():
    def kernel(x_ref, o_ref):
        o_ref[:] = pltpu.bitcast(x_ref[:], jnp.int8)

    # word (i, j) = bytes [4i+0, 4i+1, 4i+2, 4i+3] little-endian encoding
    # value = sum_k (4*i + k + 10*j%?) ... keep each byte unique:
    # byte k of word i at lane j: value = i*4 + k (lane-independent)
    M, N = 8, 128
    words = np.zeros((M, N), np.uint32)
    for i in range(M):
        for k in range(4):
            words[i, :] |= np.uint32((i * 4 + k) << (8 * k))
    x = jnp.asarray(words.view(np.int32))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M * 4, N), jnp.int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    out = np.asarray(out)
    print("int32->int8 bitcast: out[r,0] for r in range(32):")
    print(out[:, 0].tolist())
    # also check lane invariance
    assert (out == out[:, :1]).all(), "lane-dependent?!"


def probe8to32():
    def kernel(x_ref, o_ref):
        o_ref[:] = pltpu.bitcast(x_ref[:], jnp.int32)

    M, N = 32, 128
    b = np.arange(M, dtype=np.uint8)[:, None] * np.ones((1, N), np.uint8)
    x = jnp.asarray(b.view(np.int8))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M // 4, N), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    out = np.asarray(out).view(np.uint32)
    print("int8->int32 bitcast: hex words out[:,0]:")
    print([hex(v) for v in out[:, 0].tolist()])


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    probe32to8()
    probe8to32()
