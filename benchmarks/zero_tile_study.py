"""Zero-tile-jumping study (reference ``4_8_zero_tile_jumping.py`` +
``parse_counter.py`` roles).

For each dataset: partition into cluster batches, report the fraction
of (row-tile x K-tile) adjacency tiles that are all-zero at the sparse
schedule's granularity (the reference's counter kernels
``bitMM2Bit_base_cnt`` / ``bitMM2Bit_zerojump_cnt``,
``kernel.h:394-648``), plus measured dense vs zero-tile epoch times.

Usage::

    python benchmarks/zero_tile_study.py --datasets Proteins artist --csv out.csv
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


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument(
        "--datasets", nargs="+",
        default=["Proteins", "artist", "soc-BlogCatalog", "ppi",
                 "ogbn-arxiv"],
    )
    p.add_argument("--psize", type=int, default=None,
                   help="partition count (default: 1500, or the "
                        "per-dataset override for very large graphs)")
    p.add_argument("--batch-size", type=int, default=20)
    p.add_argument("--bit_width", type=int, default=2)
    p.add_argument("--n-epochs", type=int, default=20)
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--modes", nargs="+", default=["fused", "mega"],
                   help="engine modes to time dense-vs-zerotile; "
                        "'mega-streaming' forces the streaming (non-"
                        "VMEM-resident) mega kernel, the regime where "
                        "a skipped block saves its HBM crossing")
    p.add_argument("--csv", type=str, default=None)
    args = p.parse_args()

    from qgtc_ppopp22_tpu.graph import ClusterBatcher, load_dataset
    from qgtc_ppopp22_tpu.ops.fused_model import mega_colblock
    from qgtc_ppopp22_tpu.runtime import (
        QGTCEngine,
        mega_block_occ,
        mega_chunk_occ,
    )

    from qgtc_ppopp22_tpu.graph.datasets import DEFAULT_PSIZE

    rows = []
    for name in args.datasets:
        ds = load_dataset(name, scale=args.scale)
        psize = args.psize or DEFAULT_PSIZE.get(name, 1500)
        it = ClusterBatcher(
            ds,
            psize=psize,
            batch_size=args.batch_size,
            bit_width=args.bit_width,
            cache_dir="./datasets",
        )
        # Tile counters come from the pack-time occupancy schedules
        # (256x256 tiles, reference counter-kernel role) — no device
        # work at all.
        total = processed = 0
        chunks_total = chunks_occ = 0
        blocks_total = blocks_occ = 0
        for b in it.batches:
            total += int(b.tile_kidx.size)
            processed += int(np.sum(b.tile_kcnt))
            pn = b.padded_nodes
            chunk = 512 if pn % 512 == 0 else 256
            occ = mega_chunk_occ(b.a_words, chunk)
            chunks_total += occ.size
            chunks_occ += int(occ.sum())
            bocc = mega_block_occ(b.a_words, chunk, mega_colblock(pn))
            blocks_total += bocc.size
            blocks_occ += int(bocc.sum())

        for mode in args.modes:
            times = {}
            for zt in (False, True):
                eng = QGTCEngine(
                    feat_dim=it.feat_dim,
                    num_classes=ds.num_classes,
                    bit_width=args.bit_width,
                    zerotile_jump=zt,
                )
                if mode == "mega":
                    st = eng.run_epochs_mega(it, n_epochs=args.n_epochs)
                elif mode == "mega-streaming":
                    st = eng.run_epochs_mega(
                        it, n_epochs=args.n_epochs, resident_a=False
                    )
                elif mode == "fused":
                    st = eng.run_epochs_fused(it, n_epochs=args.n_epochs)
                else:
                    st = eng.run_epochs(
                        it, n_epochs=args.n_epochs, resident=True
                    )
                times["zerotile" if zt else "dense"] = st.avg_ms

            row = dict(
                dataset=name,
                psize=psize,
                mode=mode,
                tile="256x256",
                tiles_total=total,
                tiles_processed=processed,
                jump_ratio=round(1 - processed / max(total, 1), 4),
                chunk_jump_ratio=round(
                    1 - chunks_occ / max(chunks_total, 1), 4
                ),
                block_jump_ratio=round(
                    1 - blocks_occ / max(blocks_total, 1), 4
                ),
                dense_ms=round(times["dense"], 2),
                zerotile_ms=round(times["zerotile"], 2),
                speedup=round(
                    times["dense"] / max(times["zerotile"], 1e-9), 3
                ),
            )
            rows.append(row)
            print(row, flush=True)
            if args.csv:
                # incremental: keep finished rows if a later dataset
                # dies mid-sweep
                from qgtc_ppopp22_tpu.utils.metrics import write_csv

                write_csv(args.csv, rows, list(rows[0].keys()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
