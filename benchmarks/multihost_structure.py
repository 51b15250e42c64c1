"""Two-process throughput STRUCTURE of the multi-host path.

One real chip means multi-host *speed* cannot be measured here; this
commits what can be: per-process epoch walls from a REAL 2-process
``jax.distributed`` run (CPU devices), next to a 1-process run of the
same workload. Each process stages only its ``host_batch_slice``
share, so the structure claim — per-process work drops with process
count while collective sync stays bounded — is visible as
``wall_2p < wall_1p`` with half the local batches per process. The
">=80% efficiency" BASELINE figure remains an ARITHMETIC MODEL
(batch-count imbalance bound, ``parallel/multihost.py`` docstring),
not a measurement.

Run: python benchmarks/multihost_structure.py   (CPU only; safe to
run while a TPU job is active).
"""

import csv
import os
import re
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "assets", "multihost_worker.py")


def run(nproc: int):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.update(
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={8 // nproc}",
        PYTHONPATH=REPO,
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", WORKER, str(i), str(nproc), str(port)],
            env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for i in range(nproc)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    walls = []
    for o in outs:
        if "MESH-EPOCH-OK" not in o:
            raise RuntimeError(f"worker failed:\n{o[-2000:]}")
        m = re.search(
            r"EPOCH-WALL ms=([0-9.]+) local_batches=(\d+)", o
        )
        walls.append((float(m.group(1)), int(m.group(2))))
    return walls


def main():
    rows = []
    for nproc in (1, 2):
        for pid, (ms, nb) in enumerate(run(nproc)):
            rows.append(
                dict(nproc=nproc, process=pid,
                     epoch_wall_ms_cpu=round(ms, 2), local_batches=nb)
            )
            print(rows[-1], flush=True)
    w1 = [r for r in rows if r["nproc"] == 1][0]["epoch_wall_ms_cpu"]
    w2 = max(
        r["epoch_wall_ms_cpu"] for r in rows if r["nproc"] == 2
    )
    print(
        f"structure: 2-process wall {w2:.2f} ms vs 1-process "
        f"{w1:.2f} ms ({w1 / max(w2, 1e-9):.2f}x; CPU-interpret "
        "constants, structure only)"
    )
    out_path = os.path.join(REPO, "results", "multihost_walls.csv")
    with open(out_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
