"""CPU-mesh epoch scaling structure of the packed MeshEngine.

One real chip is available in this environment, so multi-chip *speed*
cannot be measured; what this commits is the scaling *structure* of
the production path (VERDICT r2 #1): the same packed stacks, sharded
over dp, run the unchanged mega kernel per device, and the per-device
work drops as ceil(B/dp). Times below are interpret-mode CPU walls —
meaningful only relative to each other, never as TPU numbers.

Run: python benchmarks/mesh_scaling.py  (forces an 8-device CPU mesh;
must not run while a TPU job is active).
"""

import csv
import os
import sys
import time

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.extend.backend  # noqa: E402

# The axon sitecustomize initializes the TPU backend at interpreter
# start; re-select the (8-virtual-device) CPU platform in-process.
jax.config.update("jax_platforms", "cpu")
jax.extend.backend.clear_backends()

import numpy as np  # noqa: E402


def main():
    from qgtc_ppopp22_tpu.graph import ClusterBatcher, synthesize
    from qgtc_ppopp22_tpu.parallel import MeshEngine
    from qgtc_ppopp22_tpu.runtime import _sync

    assert len(jax.devices()) == 8, jax.devices()
    ds = synthesize("Proteins", scale=0.25, seed=0)
    batcher = ClusterBatcher(
        ds, psize=32, batch_size=2, bit_width=2, shuffle=False
    )
    B = len(batcher)
    rows = []
    n_epochs = 5
    for dp in (1, 2, 4, 8):
        eng = MeshEngine(
            batcher.feat_dim, ds.num_classes, dp=dp, sp=1,
            model="gcn", bit_width=2, seed=0,
        )
        eng.stage(batcher)
        _sync(eng._epoch_all(eng._all_args, eng._ws))  # compile+warm
        t0 = time.perf_counter()
        out = None
        for _ in range(n_epochs):
            out = eng._epoch_all(eng._all_args, eng._ws)
        _sync(out)
        ms = (time.perf_counter() - t0) * 1e3 / n_epochs
        per_dev = sum(
            -(-len(s[2]) // dp) for s in eng._staged
        )
        rows.append(
            dict(dp=dp, sp=1, batches=B, batches_per_device=per_dev,
                 epoch_ms_cpu_interpret=round(ms, 2),
                 modes=";".join(
                     "mega" if s[4] else "ring" for s in eng._staged),
                 )
        )
        print(rows[-1], flush=True)
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results", "mesh_scaling.csv",
    )
    with open(out_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
