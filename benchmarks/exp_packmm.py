"""Experiment: packed-A GEMM with in-kernel SWAR unpack.

A is bit-packed along M into int32 words: logical row
``q*(4*ms) + 4*i + k`` of an M-tile lives in bits ``8k + f*q ..`` of
word row ``i`` (f = field bits, P = 8/f fields per byte, ms = tm /
(32/f)).  In-kernel: ``(W >> f*q) & mask`` extracts field q of every
byte (2 i32 ops per word), bitcast int32->int8 lands byte k on sublane
4i+k, concat of the P slabs rebuilds the (tm, tk) int8 tile in logical
row order.  ~0.5 VPU ops per unpacked element vs ~3 for the round-1
uint32-plane unpack, and an 8x (1-bit) smaller A DMA vs the int8 digit
path.
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/qgtc_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASKS = {1: 0x01010101, 2: 0x03030303, 4: 0x0F0F0F0F}


def field_bits(bits: int) -> int:
    for f in (1, 2, 4):
        if bits <= f:
            return f
    return 8  # no packing


def pack_rows_np(q: np.ndarray, bits: int, tile_m: int) -> np.ndarray:
    """int levels (Mp, Kp) -> int32 words [Mp // (32/f), Kp], permuted
    per M-tile so in-kernel extraction lands rows in order."""
    f = field_bits(bits)
    assert f < 8
    P = 8 // f
    rpw = 32 // f  # rows per word
    Mp, Kp = q.shape
    assert Mp % tile_m == 0 and tile_m % rpw == 0
    ms = tile_m // rpw
    words = np.zeros((Mp // rpw, Kp), np.uint32)
    vals = q.astype(np.uint32) & np.uint32((1 << f) - 1)
    for t in range(Mp // tile_m):
        for qf in range(P):
            for k in range(4):
                # rows r = t*tile_m + qf*(4*ms) + 4*i + k, i in [0, ms)
                rows = vals[
                    t * tile_m + qf * 4 * ms + k : t * tile_m + (qf + 1) * 4 * ms : 4,
                    :,
                ]
                words[t * ms : (t + 1) * ms, :] |= rows << np.uint32(8 * k + f * qf)
    return words.view(np.int32)


def make_packmm_packedout(Mp, Kp, Np, bits, tm, tk, tn, group=0):
    """B resident; requant epilogue emits M-packed words (the
    bitMM2Bit_profile-comparable op: bit in, bit out). group=0 -> one
    group per tile; else fixed per-`group`-rows packing."""
    f = field_bits(bits)
    P = 8 // f
    rpw = 32 // f
    g = group or tm
    gw = g // rpw
    mask = MASKS[f]
    nm, nn, nk = Mp // tm, Np // tn, Kp // tk
    dot_dims = (((1,), (0,)), ((), ()))
    ub = 1 << bits

    def extract_group(w):
        slabs = []
        for qf in range(P):
            e = (w >> (f * qf)) & mask if qf else (w & mask)
            slabs.append(pltpu.bitcast(e, jnp.int8))
        return jnp.concatenate(slabs, axis=0) if P > 1 else slabs[0]

    def pack_group(r8):
        # int8 (g, tn) 0..2^f-1 -> int32 (gw, tn) words, inverse of
        # extract_group
        word = None
        for qf in range(P):
            e = pltpu.bitcast(r8[qf * (4 * gw):(qf + 1) * (4 * gw), :],
                              jnp.int32)
            e = e << (f * qf) if qf else e
            word = e if word is None else word | e
        return word

    def kernel(a_ref, b_ref, o_ref, acc_ref):
        t = pl.program_id(2)

        @pl.when(t == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        parts = []
        for gi in range(tm // g):
            a_tile = extract_group(a_ref[0, gi * gw:(gi + 1) * gw, :])
            parts.append(jax.lax.dot_general(
                a_tile, b_ref[0, pl.ds(t * tk, tk), :], dot_dims,
                preferred_element_type=jnp.int32))
        part = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        acc_ref[:] = acc_ref[:] + part

        @pl.when(t == nk - 1)
        def _fin():
            acc = acc_ref[:]
            r = jnp.where(acc > ub, ub - 1, jnp.where(acc < 0, 1, acc))
            r8 = (r & (ub - 1)).astype(jnp.int8)
            for gi in range(tm // g):
                o_ref[0, gi * gw:(gi + 1) * gw, :] = pack_group(
                    r8[gi * g:(gi + 1) * g, :])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((1, tm // rpw, tk), lambda i, j, t: (0, i, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kp, tn), lambda i, j, t: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tm // rpw, tn), lambda i, j, t: (0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
    )
    cost = pl.CostEstimate(
        flops=2 * Mp * Np * Kp,
        bytes_accessed=(Mp // rpw) * Kp * 4 + Kp * Np,
        transcendentals=0,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, Mp // rpw, Np), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
    )


def make_packmm(Mp, Kp, Np, bits, tm, tk, tn, variant="concat"):
    """variant: concat | slabs | noextract | bres (B fully resident) |
    bres_chunk (B resident + sub-K interleaved extract/dot)."""
    f = field_bits(bits)
    P = 8 // f
    rpw = 32 // f
    tmw = tm // rpw
    mask = MASKS[f]
    nm, nn, nk = Mp // tm, Np // tn, Kp // tk
    dot_dims = (((1,), (0,)), ((), ()))
    b_resident = variant.startswith("bres")

    def extract(w):
        slabs = []
        for qf in range(P):
            e = (w >> (f * qf)) & mask if qf else (w & mask)
            slabs.append(pltpu.bitcast(e, jnp.int8))
        return slabs

    def kernel(a_ref, b_ref, o_ref, acc_ref):
        t = pl.program_id(2)

        @pl.when(t == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        if b_resident:
            b_tile = b_ref[0, pl.ds(t * tk, tk), :]
        else:
            b_tile = b_ref[0]

        w = a_ref[0]
        if variant == "noextract":
            # ablation: skip the shift/and ops (wrong numbers, right cost
            # shape minus extraction)
            s = pltpu.bitcast(w, jnp.int8)
            a_tile = jnp.concatenate([s] * P, axis=0) if P > 1 else s
            acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                a_tile, b_tile, dot_dims, preferred_element_type=jnp.int32)
        elif variant == "slabs":
            parts = []
            for s in extract(w):
                parts.append(jax.lax.dot_general(
                    s, b_tile, dot_dims, preferred_element_type=jnp.int32))
            acc_ref[:] = acc_ref[:] + jnp.concatenate(parts, axis=0)
        elif variant == "bres_chunk":
            nc = 4
            ck = tk // nc
            acc = acc_ref[:]
            for c in range(nc):
                slabs = extract(w[:, c * ck:(c + 1) * ck])
                a_tile = jnp.concatenate(slabs, axis=0) if P > 1 else slabs[0]
                acc = acc + jax.lax.dot_general(
                    a_tile, b_ref[0, pl.ds(t * tk + c * ck, ck), :],
                    dot_dims, preferred_element_type=jnp.int32)
            acc_ref[:] = acc
        else:
            slabs = extract(w)
            a_tile = jnp.concatenate(slabs, axis=0) if P > 1 else slabs[0]
            acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                a_tile, b_tile, dot_dims, preferred_element_type=jnp.int32)

        @pl.when(t == nk - 1)
        def _fin():
            o_ref[:] = acc_ref[:].astype(jnp.float32)

    if b_resident:
        b_spec = pl.BlockSpec((1, Kp, tn), lambda i, j, t: (0, 0, j),
                              memory_space=pltpu.VMEM)
    else:
        b_spec = pl.BlockSpec((1, tk, tn), lambda i, j, t: (0, t, j),
                              memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((1, tmw, tk), lambda i, j, t: (0, i, t),
                         memory_space=pltpu.VMEM),
            b_spec,
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, t: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
    )
    cost = pl.CostEstimate(
        flops=2 * Mp * Np * Kp,
        bytes_accessed=(Mp // rpw) * Kp * 4 + Kp * Np,
        transcendentals=0,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
    )


def run_shape(M, K, N, bits, tm, tk, rng, variant="concat", check=True):
    from qgtc_ppopp22_tpu.utils.timing import device_bench
    from qgtc_ppopp22_tpu.ops.bitgemm import flops_convention

    Np = 128 if N <= 128 else -(-N // 128) * 128
    qa = rng.integers(0, 1 << bits, (M, K)).astype(np.int32)
    qb = rng.integers(0, 1 << bits, (K, N)).astype(np.int32)
    words = jnp.asarray(pack_rows_np(qa, bits, tm)[None])  # [1, mw, Kp]
    b = np.zeros((1, K, Np), np.int8)
    b[0, :, :N] = qb
    b = jnp.asarray(b)
    fn = make_packmm(M, K, Np, bits, tm, tk, Np, variant)
    out = np.asarray(fn(words, b))
    if check and variant != "noextract":
        ref = qa.astype(np.int64) @ qb.astype(np.int64)
        ok = np.array_equal(out[:M, :N].astype(np.int64), ref)
        if not ok:
            print("  EXACTNESS FAIL")
    t = device_bench(lambda a_, b_: fn(a_, b_), (words, b), reps=1)
    tf = flops_convention(M, N, K) / t / 1e12
    print(f"bits={bits} M=K={M} N={N} tm={tm} tk={tk} {variant}: "
          f"{t*1e6:.2f} us, {tf:.2f} TFLOPs")
    return t, tf


def unpack_rows_np(words: np.ndarray, bits: int, tile_m: int) -> np.ndarray:
    f = field_bits(bits)
    P = 8 // f
    rpw = 32 // f
    mw, Kp = words.shape
    Mp = mw * rpw
    w = words.view(np.uint32)
    ms = tile_m // rpw
    out = np.zeros((Mp, Kp), np.int32)
    for t in range(Mp // tile_m):
        for qf in range(P):
            for k in range(4):
                rows = (w[t * ms:(t + 1) * ms, :] >> np.uint32(8 * k + f * qf)) \
                    & np.uint32((1 << f) - 1)
                out[t * tile_m + qf * 4 * ms + k:
                    t * tile_m + (qf + 1) * 4 * ms:4, :] = rows
    return out


def run_packedout(M, K, N, bits, tm, tk, rng, group=0):
    from qgtc_ppopp22_tpu.utils.timing import device_bench
    from qgtc_ppopp22_tpu.ops.bitgemm import flops_convention

    Np = 128
    g = group or tm
    qa = rng.integers(0, 1 << bits, (M, K)).astype(np.int32)
    qb = rng.integers(0, 1 << bits, (K, N)).astype(np.int32)
    words = jnp.asarray(pack_rows_np(qa, bits, g)[None])
    b = np.zeros((1, K, Np), np.int8)
    b[0, :, :N] = qb
    b = jnp.asarray(b)
    fn = make_packmm_packedout(M, K, Np, bits, tm, tk, Np, group=group)
    out = np.asarray(fn(words, b))[0]
    # reference requant
    ub = 1 << bits
    ref = qa.astype(np.int64) @ qb.astype(np.int64)
    ref = np.where(ref > ub, ub - 1, np.where(ref < 0, 1, ref)) & (ub - 1)
    got = unpack_rows_np(out, bits, g)[:M, :N]
    ok = np.array_equal(got.astype(np.int64), ref)
    if not ok:
        print("  EXACTNESS FAIL", got[:4, :4], ref[:4, :4])
    t = device_bench(lambda a_, b_: fn(a_, b_), (words, b), reps=1)
    tf = flops_convention(M, N, K) / t / 1e12
    print(f"PACKEDOUT bits={bits} M=K={M} N={N} tm={tm} tk={tk} g={g}: "
          f"{t*1e6:.2f} us, {tf:.2f} TFLOPs exact={ok}")
    return t, tf


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend())
    run_packedout(4096, 4096, 16, 1, 4096, 4096, rng)
    run_packedout(4096, 4096, 16, 1, 2048, 4096, rng)
    run_packedout(4096, 4096, 16, 1, 4096, 4096, rng, group=256)
    run_packedout(4096, 4096, 16, 1, 4096, 4096, rng, group=512)
    run_packedout(4096, 4096, 16, 1, 2048, 2048, rng)
    run_packedout(2048, 2048, 16, 1, 2048, 2048, rng)
    run_packedout(2048, 2048, 16, 1, 2048, 2048, rng, group=256)
    run_packedout(1024, 1024, 16, 1, 1024, 1024, rng)
    run_packedout(4096, 4096, 16, 2, 4096, 4096, rng, group=256)
    run_packedout(4096, 4096, 64, 1, 4096, 4096, rng, group=256)
