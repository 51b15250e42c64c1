"""Storage/transfer win of the packed format (VERDICT r1 item 6).

Quantifies the README's central claim — bit-packed operands are
8-32x smaller on the host->device link and in HBM — as measured data
at the reference's epoch-timing boundary (per-step transfer of the
pre-packed batch, ``main_qgtc.py:115`` ``cluster.cuda()``):

* bytes per epoch for each transfer form:
  - ``packed``  : M-packed adjacency words + bit-plane features
                  (what the quantized engine ships, 1-bit A +
                  bit_width-bit X)
  - ``dense``   : uint8 adjacency + float32 features (what the
                  fp32 baseline engine ships, ``runtime.py``
                  BaselineEngine.forward_batch)
* measured H2D wall time per epoch for both forms (75 batches,
  synced once per epoch, tunnel RTT amortized),
* HBM footprint of a fully staged epoch (resident/mega modes).

Writes ``results/transfer_study.csv``. Run alone on the TPU.
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/qgtc_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure_h2d(arr_lists, epochs=5):
    """Wall seconds per epoch to ship every array list host->device,
    synced once per epoch by fetching a byte of the last transfer."""
    import jax

    def one_epoch():
        last = None
        for arrs in arr_lists:
            for a in arrs:
                last = jax.device_put(a)
        np.asarray(jax.device_get(last.reshape(-1)[0]))

    one_epoch()  # warm the tunnel
    t0 = time.perf_counter()
    for _ in range(epochs):
        one_epoch()
    return (time.perf_counter() - t0) / epochs


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="ogbn-arxiv")
    p.add_argument("--bit-width", type=int, default=2)
    p.add_argument("--psize", type=int, default=1500)
    p.add_argument("--batch-size", type=int, default=20)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--csv", default="results/transfer_study.csv")
    args = p.parse_args()

    from qgtc_ppopp22_tpu.graph import ClusterBatcher, load_dataset
    from qgtc_ppopp22_tpu.utils.metrics import write_csv

    ds = load_dataset(args.dataset, data_dir="qgtc_graphs")
    it = ClusterBatcher(
        ds, psize=args.psize, batch_size=args.batch_size,
        bit_width=args.bit_width, seed=3, cache_dir="./datasets",
    )

    packed_lists, dense_lists = [], []
    packed_bytes = dense_bytes = 0
    for b in it.batches:
        aw = np.ascontiguousarray(b.a_words)
        xp = np.ascontiguousarray(np.asarray(b.bit_X.planes))
        packed_lists.append([aw, xp])
        packed_bytes += aw.nbytes + xp.nbytes
        n, pn = b.num_nodes, b.padded_nodes
        da = np.zeros((pn, pn), np.uint8)
        da[:n, :n] = ds.graph.subgraph_dense(b.nodes)
        dx = np.zeros((pn, it.feat_dim), np.float32)
        dx[:n] = it.features[b.nodes]
        dense_lists.append([da, dx])
        dense_bytes += da.nbytes + dx.nbytes

    t_packed = measure_h2d(packed_lists, args.epochs)
    t_dense = measure_h2d(dense_lists, args.epochs)

    rows = [
        dict(
            form="packed",
            bytes_per_epoch=packed_bytes,
            h2d_ms_per_epoch=round(t_packed * 1e3, 2),
            hbm_staged_mb=round(packed_bytes / 2**20, 1),
            bytes_ratio_vs_dense=round(dense_bytes / packed_bytes, 2),
            h2d_speedup_vs_dense=round(t_dense / t_packed, 2),
        ),
        dict(
            form="dense",
            bytes_per_epoch=dense_bytes,
            h2d_ms_per_epoch=round(t_dense * 1e3, 2),
            hbm_staged_mb=round(dense_bytes / 2**20, 1),
            bytes_ratio_vs_dense=1.0,
            h2d_speedup_vs_dense=1.0,
        ),
    ]
    for r in rows:
        print(r, flush=True)
    write_csv(args.csv, rows, list(rows[0].keys()))
    print(f"wrote {args.csv}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
