"""Ring-aggregation evidence artifact (VERDICT r1 item 4).

Runs on the 8-device virtual CPU mesh (the only multi-device surface
available here) and writes ``results/ring_overlap.txt`` with:

1. the compiled HLO schedule excerpt showing the ring structure —
   per-rotation ``collective-permute`` ops interleaved between the
   shard GEMMs (on TPU each permute lowers to an async
   ``collective-permute-start``/``-done`` pair, so rotation r+1's
   transfer is in flight while rotation r's GEMM runs; the CPU
   backend lowers permutes synchronously, which is why this artifact
   records the schedule + link-volume structure rather than a
   wall-clock overlap);
2. per-aggregation link volume: ring moves rows_loc x cols per
   rotation per device vs all-gather's full-H replication;
3. CPU-mesh wall-clock of ring vs gather dp_sp steps (reported for
   completeness — CPU collectives are synchronous memcpys, so this
   under-reports the ring's TPU benefit).

Must run in a subprocess env: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8
"""

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from qgtc_ppopp22_tpu.ops.digits import digit_pack
    from qgtc_ppopp22_tpu.parallel import (
        dp_sp_epoch_step,
        make_mesh,
        shard_batches,
        sp_gcn_forward_ring,
    )

    assert jax.device_count() >= 8, "needs the 8-device CPU mesh env"
    rng = np.random.default_rng(0)
    bits, n, d, hid, cls = 2, 2048, 128, 64, 128
    qa = (rng.random((n, n)) < 0.01).astype(np.int32)
    qx = rng.integers(0, 4, (n, d)).astype(np.int32)
    qws = [
        rng.integers(0, 4, s).astype(np.int32)
        for s in [(d, hid), (hid, hid), (hid, cls)]
    ]
    a = digit_pack(jnp.asarray(qa), 1)
    x = digit_pack(jnp.asarray(qx), bits)
    ws = [digit_pack(jnp.asarray(w), bits) for w in qws]

    lines = []
    n_sp = 4
    mesh = make_mesh(dp=1, sp=n_sp)
    with mesh:
        compiled = jax.jit(
            lambda a_, x_: sp_gcn_forward_ring(mesh, a_, x_, ws, bits)
        ).lower(a, x).compile()
    txt = compiled.as_text()

    permutes = txt.count("collective-permute")
    lines.append("# Ring aggregation schedule evidence (sp=4 CPU mesh)")
    lines.append("")
    lines.append(
        f"compiled HLO: {permutes} collective-permute ops for 3 "
        f"aggregations x {n_sp} rotations (last rotation's permute "
        "is dead and DCE'd per aggregation: 3 x 3 = 9)."
    )
    # schedule excerpt: lines with permute or the pallas GEMM call
    sched = [
        ln.strip()[:140]
        for ln in txt.splitlines()
        if ("collective-permute" in ln and "=" in ln)
        or ("custom-call" in ln and "Sharding" not in ln)
        or re.search(r"= s32\[\d+,\d+\]\{[0-9,]+\} dot\(", ln)
    ]
    lines.append("")
    lines.append("## schedule excerpt (permutes interleaved with GEMMs)")
    lines.extend(sched[:40])

    rows_loc = 2048 // n_sp
    ring_bytes = rows_loc * hid  # int8 digits per rotation per device
    gather_bytes = 2048 * hid  # full H replicated per device
    lines.append("")
    lines.append("## per-aggregation link volume per device")
    lines.append(
        f"ring: {n_sp - 1} rotations x {ring_bytes} B in flight "
        f"(rows_loc={rows_loc} x cols={hid} int8) = "
        f"{(n_sp - 1) * ring_bytes} B, each overlappable with the "
        "concurrent shard GEMM (async start/done pair on TPU)"
    )
    lines.append(
        f"all-gather: {gather_bytes} B materialized before the GEMM "
        "can start (blocking)"
    )

    # wall clock ring vs gather (CPU collectives are synchronous;
    # reported for completeness)
    mesh2 = make_mesh(dp=2, sp=4)
    B = 4
    a_stack = np.stack([np.asarray(a.digits)] * B)
    x_stack = np.stack([np.asarray(x.digits)] * B)
    res = {}
    with mesh2:
        a_sh, x_sh = shard_batches(mesh2, a_stack, x_stack)
        for mode in ("ring", "gather"):
            fn = jax.jit(
                lambda a_, x_, m=mode: dp_sp_epoch_step(
                    mesh2, a_, x_, ws, bits, a_bits=1, x_bits=bits,
                    agg_mode=m,
                )
            )
            np.asarray(fn(a_sh, x_sh))  # compile + warm
            t0 = time.perf_counter()
            for _ in range(10):
                out = fn(a_sh, x_sh)
            np.asarray(out)
            res[mode] = (time.perf_counter() - t0) / 10 * 1e3
    lines.append("")
    lines.append("## CPU-mesh wall clock (dp=2 x sp=4, B=4, n=2048)")
    for mode, ms in res.items():
        lines.append(f"{mode}: {ms:.2f} ms/step")
    lines.append(
        "(CPU lowers permutes synchronously — no overlap is possible "
        "on this backend; the TPU lowering splits each permute into "
        "an async start/done pair that brackets the next shard GEMM.)"
    )

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results", "ring_overlap.txt",
    )
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwrote {out_path}")


if __name__ == "__main__":
    main()
