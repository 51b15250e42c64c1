"""Speed-of-light (roofline) model for the mega-kernel epoch.

VERDICT r3 weak #5: the headline epoch number needs a committed
bytes+MXU floor showing how close the kernel is to the hardware and
why 2-bit has plateaued. This models, per shape bucket of a dataset's
cluster batches:

* **HBM bytes / batch** — packed adjacency words (``pn^2/8``, one
  crossing per batch in resident mode, one per aggregation in
  streaming mode scaled by the occupied block fraction), X digit
  planes (byte levels for >4-bit), stored logits
  (``pn * round8(classes) * 4``);
* **MXU MACs / batch** — per GCN/GIN chain: aggregations are
  ``pn * pn * 128`` MACs each (the hidden dim pads to the 128-lane
  MXU tile — lane-stacking keeps multi-digit hiddens at ONE pass),
  updates ``pn * K_pad * 128`` per digit-pair pass;
* the **floor** per batch = max(HBM time, MXU time) (the kernel
  overlaps the A stream with MXU passes), summed over the epoch.

Constants are the *measured best* of this chip (so the floor is
conservative): HBM 1068 GB/s (contiguous-row DMA probe), MXU
173e12 MACs/s (88% of v5e int8 peak, the highest rate any committed
kernel here reaches — results/fig8c.csv).

Usage::

    python benchmarks/roofline.py --datasets ogbn-arxiv --bits 1 2 4 8 \
        --csv results/roofline.csv
"""

import argparse
import csv
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

HBM_GBPS = 1068e9  # measured contiguous-row DMA rate (this chip)
MXU_MACS = 173e12  # measured best int8 MAC rate (fig8c 346.7 TFLOPs)
LANE = 128


def _r8(n):
    return (n + 7) // 8 * 8


def bucket_model(pn, xp, nd_x, n_layers, out_dim, model, bits,
                 resident, feat=None, agg_frac=1.0):
    """(hbm_bytes, mxu_macs) for ONE batch of a ``pn`` bucket.

    ``agg_frac``: occupied fraction of the adjacency's 2-D blocks —
    the aggregation MACs a batch actually pays when the runtime's
    occupancy-compacted resident schedule triggers (pn >= 2560 and
    >= 45% skippable, mirroring ``runtime.run_epochs_mega``); 1.0
    models the dense kernel."""
    # HBM: packed A words; resident crosses once, streaming once per
    # aggregation. Both 3-layer chains run n_layers aggregations
    # (GCN: 2 hidden + the final f32 one; GIN: A@X + 2 hidden —
    # main_qgtc.py:127-154).
    n_agg = n_layers
    a_bytes = pn * pn // 8
    hbm = a_bytes * (1 if resident else n_agg)
    x_bytes = pn * xp * (1 if bits > 4 else nd_x)  # levels form >4 bit
    hbm += x_bytes
    hbm += pn * _r8(out_dim) * 4  # stored logits
    # MXU: signed/lane-stacked chains hold every aggregation at ONE
    # 128-lane pass. GIN's FIRST aggregation contracts X directly and
    # emits feature-width output (xp lanes — 5 lane-tiles at reddit's
    # 640): ONE pass at every bit width since round 5 (>4-bit runs the
    # signed plane with the degree correction row-summed on the VPU
    # when no free ones-lane exists; the retired MIXED mode paid nd_x
    # digit passes at 128-multiple widths).
    if model == "gin":
        agg_macs = pn * pn * xp
        agg_macs += (n_agg - 1) * pn * pn * LANE
    else:
        agg_macs = n_agg * pn * pn * LANE
    agg_macs = int(agg_macs * agg_frac)
    # updates: signed chain = 1 pass per GEMM
    upd_macs = n_layers * pn * LANE * LANE
    upd_macs += pn * max(xp - LANE, 0) * LANE
    return hbm, agg_macs + upd_macs


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--datasets", nargs="+", default=["ogbn-arxiv"])
    p.add_argument("--bits", nargs="+", type=int, default=[1, 2, 4, 8])
    p.add_argument("--model", choices=("gcn", "gin"), default="gcn")
    p.add_argument("--batch-size", type=int, default=20)
    p.add_argument("--measured-csv", default="results/epochs_matrix.csv")
    p.add_argument("--csv", default=None)
    args = p.parse_args()

    from qgtc_ppopp22_tpu.graph import ClusterBatcher, load_dataset
    from qgtc_ppopp22_tpu.graph.datasets import DEFAULT_PSIZE
    from qgtc_ppopp22_tpu.ops.bitpack import num_digits, round_up
    from qgtc_ppopp22_tpu.ops.fused_model import mega_vmem_plan
    from qgtc_ppopp22_tpu.models.qmodels import QModelConfig, init_weights, pack_weights
    import jax

    measured = {}
    if os.path.exists(args.measured_csv):
        with open(args.measured_csv) as f:
            for r in csv.DictReader(f):
                if r["engine"] == "qgtc" and r["model"] == args.model:
                    measured[(r["dataset"], int(r["bits"]))] = float(
                        r["epoch_ms"]
                    )

    rows = []
    for name in args.datasets:
        ds = load_dataset(name)
        psize = DEFAULT_PSIZE.get(name, 1500)
        it = ClusterBatcher(
            ds, psize=psize, batch_size=args.batch_size, bit_width=2,
            cache_dir="./datasets",
        )
        hidden = 16 if args.model == "gcn" else 64
        for bits in args.bits:
            nd_x = num_digits(bits)
            cfg = QModelConfig(
                in_dim=it.feat_dim, hidden=hidden,
                out_dim=ds.num_classes, bit_width=bits,
            )
            ws = pack_weights(
                init_weights(jax.random.PRNGKey(0), cfg), bits,
                fmt="digits",
            )
            from qgtc_ppopp22_tpu.runtime import mega_block_occ
            from qgtc_ppopp22_tpu.ops.fused_model import mega_colblock

            # Mirror the runtime's per-BUCKET compact-schedule gate
            # (pn >= 2560, >= 45% skippable): a gated bucket's floor
            # charges only its occupied aggregation blocks.
            bucket_occ: dict = {}
            for b in it.batches:
                pn = b.padded_nodes
                chunk = next(
                    (c for c in (512, 256) if c <= pn and pn % c == 0),
                    None,
                )
                if chunk is None or pn < 2560:
                    continue
                occ = mega_block_occ(
                    np.asarray(b.a_words), chunk, mega_colblock(pn)
                )
                tot, nz = bucket_occ.get(pn, (0, 0))
                bucket_occ[pn] = (tot + occ.size, nz + int(occ.sum()))
            bucket_frac = {}
            for pn, (tot, nz) in bucket_occ.items():
                frac = nz / max(tot, 1)
                bucket_frac[pn] = frac if 1.0 - frac >= 0.45 else 1.0

            hbm_total = macs_total = 0
            floor_ms = 0.0
            for b in it.batches:
                pn = b.padded_nodes
                xp = round_up(it.feat_dim, LANE)
                # the runtime compacts only the digit chains (the
                # signed >4-bit chain measured a loss under compact)
                agg_frac = (
                    bucket_frac.get(pn, 1.0) if bits <= 4 else 1.0
                )
                try:
                    # x_split_digits=0: >4-bit chains run SIGNED at
                    # the benchmark configs (every weight has a free
                    # lane), which carries no digit-split scratch.
                    resident, _ = mega_vmem_plan(
                        pn, 1 if bits > 4 else nd_x, xp, ws,
                        out_cols=ds.num_classes, model=args.model,
                        x_split_digits=0,
                    )
                except ValueError:
                    resident = False
                hbm, macs = bucket_model(
                    pn, xp, nd_x, cfg.num_layers, ds.num_classes,
                    args.model, bits, resident, feat=it.feat_dim,
                    agg_frac=agg_frac,
                )
                hbm_total += hbm
                macs_total += macs
                floor_ms += max(hbm / HBM_GBPS, macs / MXU_MACS) * 1e3
            meas = measured.get((name, bits))
            rows.append(dict(
                dataset=name, model=args.model, bits=bits,
                batches=len(it.batches),
                hbm_mb_epoch=round(hbm_total / 1e6, 1),
                mxu_gmacs_epoch=round(macs_total / 1e9, 2),
                hbm_floor_ms=round(hbm_total / HBM_GBPS * 1e3, 3),
                mxu_floor_ms=round(macs_total / MXU_MACS * 1e3, 3),
                floor_ms=round(floor_ms, 3),
                measured_ms=meas,
                measured_over_floor=(
                    round(meas / floor_ms, 2) if meas else None
                ),
                bound=(
                    "mxu"
                    if macs_total / MXU_MACS > hbm_total / HBM_GBPS
                    else "hbm"
                ),
            ))
            print(rows[-1], flush=True)

    if args.csv and rows:
        with open(args.csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {args.csv}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
