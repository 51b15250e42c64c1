"""Kernel microbenchmarks (reference ``2_7c_QGTC_GEMM_INT8.py`` +
``5_9_adjmatrix_size.py`` + ``cuBLASGemmEX/`` in one harness).

Sweeps the bit-GEMM over the reference's shapes and bit widths,
reporting TFLOPs under the reference's ``2*M*N*K`` convention
(``QGTC_device.cu:420-422``), next to the XLA int8 ``dot_general``
dense baseline (the cuBLAS-GemmEx-INT8 role). Timing is on-device
(see ``utils/timing.py``). Results go to CSV + stdout.

Usage::

    python benchmarks/kernel_sweep.py [--figure 8a|8c|int8] [--csv out.csv]
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/qgtc_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def bench_shape(M, K, N, bits, rng):
    """Packed-consuming GEMM, bit in / bit out — the exact role of the
    reference profile op ``bitMM2Bit_profile`` (``QGTC_device.cu:
    379-434``): A arrives bit-packed, the epilogue requantizes and
    repacks in-kernel."""
    import jax
    import jax.numpy as jnp

    from qgtc_ppopp22_tpu.ops.bitgemm import flops_convention
    from qgtc_ppopp22_tpu.ops.packmm import (
        pack_rows,
        packed_signed,
        packmm_to_packed,
        prepare_rhs,
    )
    from qgtc_ppopp22_tpu.ops.digits import digit_pack
    from qgtc_ppopp22_tpu.utils.timing import device_bench

    qa = rng.integers(0, 1 << bits, (M, K)).astype(np.int32)
    qb = rng.integers(0, 1 << bits, (K, N)).astype(np.int32)
    a = pack_rows(jnp.asarray(qa), bits)
    b = digit_pack(jnp.asarray(qb), bits)
    oc = None
    if packed_signed(bits):
        # weight-side prep happens at pack time, outside the timed
        # region — exactly the reference's boundary (weights packed
        # once before the loop, main_qgtc.py:108-110). out_cols=N:
        # store the real N columns as the reference's packed output
        # does (for the byte-plane output the 128-lane pad is the
        # dominant write; low-bit outputs are word-packed 8-32x
        # smaller already, where the narrow store costs more than the
        # saved bytes).
        b = prepare_rhs(b)
        oc = N
    t = device_bench(
        lambda a_, b_: packmm_to_packed(a_, b_, bits, out_cols=oc).words,
        (a, b), reps=1,
    )
    return t, flops_convention(M, N, K) / t / 1e12


def bench_int8(M, K, N, rng):
    import jax
    import jax.numpy as jnp

    from qgtc_ppopp22_tpu.models.baselines import int8_mm
    from qgtc_ppopp22_tpu.ops.bitgemm import flops_convention
    from qgtc_ppopp22_tpu.utils.timing import device_bench

    a = jnp.asarray(rng.integers(0, 2, (M, K)), jnp.int8)
    b = jnp.asarray(rng.integers(0, 16, (K, N)), jnp.int8)
    t = device_bench(int8_mm, (a, b), reps=1)
    return t, flops_convention(M, N, K) / t / 1e12


def bench_profile_shape(M, K, N, bits, rng):
    """Supplementary profile-log shapes (reference
    ``QGTC_module/logs/profile_new.log``: 1-bit bitMM at M=N=32768).
    The packed operand is generated directly in the word domain — a
    dense random 0/1 matrix's packed words ARE i.i.d. random bits,
    and with no tile_map the kernel's time depends on shapes only —
    so the host never materializes the 4.3 GB dense form."""
    import jax.numpy as jnp

    from qgtc_ppopp22_tpu.ops.bitgemm import flops_convention
    from qgtc_ppopp22_tpu.ops.digits import digit_pack
    from qgtc_ppopp22_tpu.ops.packmm import PackedTensor, packmm_to_packed
    from qgtc_ppopp22_tpu.utils.timing import device_bench

    assert bits == 1
    w = rng.integers(
        -(2**31), 2**31, (1, M // 32, K), dtype=np.int64
    ).astype(np.int32)
    a = PackedTensor(words=jnp.asarray(w), shape=(M, K), bits=bits)
    qb = rng.integers(0, 1 << bits, (K, N)).astype(np.int32)
    b = digit_pack(jnp.asarray(qb), bits)
    t = device_bench(
        lambda a_, b_: packmm_to_packed(a_, b_, bits).words, (a, b),
        reps=1,
    )
    return t, flops_convention(M, N, K) / t / 1e12


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument(
        "--figure", choices=("8a", "8c", "int8", "profile"), default="8a"
    )
    p.add_argument("--csv", type=str, default=None)
    args = p.parse_args()
    rng = np.random.default_rng(0)

    rows = []
    if args.figure == "8a":
        # Fig 8a sweep: M=K in {1,2,4}K, N in {16,32,64}, bits 1..8
        for bits in (1, 2, 4, 8):
            for mk in (1024, 2048, 4096):
                for n in (16, 32, 64):
                    t, tf = bench_shape(mk, mk, n, bits, rng)
                    rows.append(
                        dict(bits=bits, M=mk, K=mk, N=n,
                             us=round(t * 1e6, 2), tflops=round(tf, 3))
                    )
                    print(rows[-1], flush=True)
    elif args.figure == "8c":
        # Fig 8c: 1-bit, M=K 2^10..2^12, N up to 1024
        for mk in (1024, 2048, 4096):
            for n in (16, 32, 64, 128, 256, 512, 1024):
                t, tf = bench_shape(mk, mk, n, 1, rng)
                rows.append(
                    dict(bits=1, M=mk, K=mk, N=n,
                         us=round(t * 1e6, 2), tflops=round(tf, 3))
                )
                print(rows[-1], flush=True)
    elif args.figure == "profile":
        # Reference supplementary profile log: 1-bit, M=K=32768,
        # N in {16, 64} (ref 12.359 / 26.431 TFLOPs on sm_86)
        for n in (16, 64):
            t, tf = bench_profile_shape(32768, 32768, n, 1, rng)
            rows.append(
                dict(bits=1, M=32768, K=32768, N=n,
                     us=round(t * 1e6, 2), tflops=round(tf, 3))
            )
            print(rows[-1], flush=True)
    else:
        for mk in (1024, 2048, 4096):
            for n in (16, 32, 64):
                t, tf = bench_int8(mk, mk, n, rng)
                rows.append(
                    dict(bits=8, M=mk, K=mk, N=n,
                         us=round(t * 1e6, 2), tflops=round(tf, 3))
                )
                print(rows[-1], flush=True)

    if args.csv and rows:
        from qgtc_ppopp22_tpu.utils.metrics import write_csv

        write_csv(args.csv, rows, list(rows[0].keys()))
        print(f"wrote {args.csv}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
