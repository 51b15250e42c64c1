"""Device-side benchmarking (the reference's cudaEvent-timing role).

The reference times kernels with cudaEvents around a 200-iteration
launch loop (``QGTC_device.cu:409-422``, ``bitMM2Bit_profile``). On a
TPU reached through a remote dispatch tunnel, naive host timing is
wrong in three distinct ways, each observed while building this:

1. **Dispatch latency dominates**: per-call RTT is milliseconds, so
   the op must run in a ``lax.fori_loop`` inside one jit.
2. **XLA deletes un-consumed work**: depending on one output element
   lets XLA slice a matmul down to a single dot product, and a
   sum-reduction factors algebraically (``sum(A@B) ==
   rowsum(A)@colsum(B)``). The loop carries a *max* over the full
   output into the next iteration's operand, which has no shortcut.
3. **``block_until_ready`` does not synchronize** this backend's
   remote stream; only fetching a value does. We fetch the final
   scalar, and take the *marginal* time between two iteration counts
   so constant overheads (RTT, transfer, compile-cache lookup) cancel.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _make_loop(fn: Callable, perturb: str = "full"):
    @jax.jit
    def loop(n, args_):
        def body(_, carry):
            seed, args_ = carry
            leaves, treedef = jax.tree_util.tree_flatten(args_)
            # Perturb the smallest operand leaf with an op the
            # compiler cannot distribute out of a matmul. A
            # single-element update is decomposed by XLA (DUS
            # propagation) and the untouched rows hoisted; `b + s`
            # distributes (dot(a, b+s) = dot(a,b) + s*rowsum(a)).
            # xor (ints) / elementwise sin (floats) have no such
            # identity. Only *operand-valued* leaves (int8 / float
            # planes) are candidates: control-valued leaves —
            # occupancy maps, tile kidx/kcnt, CSR indptr
            # (bool/int32/uint32) — steer zero-tile skipping, so
            # scrambling them would change the work being timed, not
            # just defeat CSE.
            #
            # perturb="full" scrambles the WHOLE leaf — paranoid mode
            # for XLA-native computations where algebraic shortcuts
            # exist; costs O(leaf) VPU+HBM per iteration, which at
            # epoch scale (x_stack ~200 MB at ogbn-products) inflates
            # the marginal by ~0.5-1 us/batch. perturb="slice"
            # scrambles only the first leading-index slice: the leaf
            # is still a NEW buffer every iteration, so loop-invariant
            # code motion / CSE of any consumer is impossible, and
            # opaque consumers (pallas_call, lax.scan over batches)
            # cannot be algebraically split — the right mode for the
            # whole-epoch timings (the reference's cudaEvent windows
            # carry no harness traffic either, main_qgtc.py:112-159).
            cand = [
                i
                for i, lf in enumerate(leaves)
                if lf.dtype == jnp.int8
                or jnp.issubdtype(lf.dtype, jnp.floating)
            ] or list(range(len(leaves)))
            leaves = list(leaves)

            def scramble(lf):
                if jnp.issubdtype(lf.dtype, jnp.floating):
                    return jnp.sin(lf + seed.astype(lf.dtype))
                return jax.lax.bitwise_xor(
                    lf,
                    jnp.broadcast_to(seed, lf.shape).astype(lf.dtype),
                )

            if perturb == "slice":
                # slice mode touches EVERY operand leaf (so every
                # bucket's kernel call provably sees a fresh buffer —
                # no reliance on XLA declining to hoist calls whose
                # inputs happened to be loop-invariant), but only its
                # first leading-index slice.
                for i in cand:
                    lf = leaves[i]
                    if lf.ndim >= 1 and lf.shape[0] > 1:
                        leaves[i] = jax.lax.dynamic_update_slice(
                            lf, scramble(lf[0:1]), (0,) * lf.ndim
                        )
                    else:
                        leaves[i] = scramble(lf)
            else:
                k = min(cand, key=lambda i: leaves[i].size)
                leaves[k] = scramble(leaves[k])
            args_ = jax.tree_util.tree_unflatten(treedef, leaves)
            out = fn(*args_)
            nxt = jnp.int32(0)
            for leaf in jax.tree_util.tree_leaves(out):
                m = jnp.max(jax.lax.convert_element_type(leaf, jnp.float32))
                nxt = nxt + jax.lax.convert_element_type(m, jnp.int32)
            return (seed + nxt, args_)

        seed, _ = jax.lax.fori_loop(0, n, body, (jnp.int32(0), args_))
        return seed

    return loop


def device_bench(
    fn: Callable,
    args: Sequence,
    iters: int = 0,
    reps: int = 2,
    target_seconds: float = 0.5,
    perturb: str = "full",
) -> float:
    """Seconds per iteration of ``fn(*args)``, measured on-device.

    Runs the serial-dependence loop at ``n`` and ``3n`` iteration
    counts; the marginal slope is the per-iteration latency (constant
    RTT/transfer overheads cancel). ``n`` is auto-calibrated so each
    timed window is ~``target_seconds`` of device time — per-iteration
    noise is then RTT-jitter / n, microseconds or below. ``reps``
    repeats the pair and keeps the minimum slope. Pass ``iters`` to
    pin ``n`` explicitly.
    """
    args = tuple(args)
    loop = _make_loop(fn, perturb)

    def run(n):
        t0 = time.perf_counter()
        np.asarray(loop(jnp.int32(n), args))
        return time.perf_counter() - t0

    run(4)  # compile + warm
    if iters <= 0:
        # Calibrate from a marginal estimate (fixed overhead per call
        # is ~tens of ms through the tunnel and must not pollute it).
        ta, tb = run(16), run(272)
        est = max((tb - ta) / 256, 1e-7)
        iters = int(min(max(target_seconds / est, 512), 50_000))
    best = float("inf")
    for _ in range(max(reps, 1)):
        t1 = run(iters)
        t3 = run(3 * iters)
        best = min(best, (t3 - t1) / (2 * iters))
    return max(best, 1e-12)


def host_bench(fn: Callable, args: Sequence, iters: int = 100) -> float:
    """Host-loop seconds/iter (includes per-call dispatch latency).

    Used for epoch-style timing where dispatch is part of the measured
    system (the reference's epoch loop also pays per-launch costs,
    ``main_qgtc.py:112-155``). Synchronizes by fetching one element of
    the final output.
    """

    def sync(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        np.asarray(jax.device_get(leaf.reshape(-1)[0]))

    sync(fn(*args))
    t0 = time.perf_counter()
    r = None
    for _ in range(iters):
        r = fn(*args)
    sync(r)
    return (time.perf_counter() - t0) / iters
