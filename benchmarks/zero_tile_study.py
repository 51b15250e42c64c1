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
    p.add_argument("--datasets", nargs="+", default=["ogbn-arxiv"])
    p.add_argument("--psize", type=int, default=1500)
    p.add_argument("--batch-size", type=int, default=20)
    p.add_argument("--bit_width", type=int, default=2)
    p.add_argument("--n-epochs", type=int, default=6)
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--csv", type=str, default=None)
    args = p.parse_args()

    import jax.numpy as jnp

    from qgtc_ppopp22_tpu.graph import ClusterBatcher, load_dataset
    from qgtc_ppopp22_tpu.ops.bitpack import unpack_bits
    from qgtc_ppopp22_tpu.ops.digitmm import (
        digit_lhs_tiles,
        zero_tile_stats_digits,
    )
    from qgtc_ppopp22_tpu.ops.digits import digit_pack
    from qgtc_ppopp22_tpu.runtime import QGTCEngine

    rows = []
    for name in args.datasets:
        ds = load_dataset(name, scale=args.scale)
        it = ClusterBatcher(
            ds,
            psize=args.psize,
            batch_size=args.batch_size,
            bit_width=args.bit_width,
            cache_dir="./datasets",
        )
        total = processed = 0
        for b in it.batches:
            a = digit_pack(
                jnp.asarray(np.asarray(unpack_bits(b.bit_A))), 1
            )
            st = zero_tile_stats_digits(a)
            total += st["total"]
            processed += st["processed"]
        tiles = digit_lhs_tiles(a)

        times = {}
        for zt in (False, True):
            eng = QGTCEngine(
                feat_dim=it.feat_dim,
                num_classes=ds.num_classes,
                bit_width=args.bit_width,
                zerotile_jump=zt,
            )
            st = eng.run_epochs(it, n_epochs=args.n_epochs, resident=True)
            times["zerotile" if zt else "dense"] = st.avg_ms

        row = dict(
            dataset=name,
            tile=f"{tiles[0]}x{tiles[1]}",
            tiles_total=total,
            tiles_processed=processed,
            jump_ratio=round(1 - processed / max(total, 1), 4),
            dense_ms=round(times["dense"], 2),
            zerotile_ms=round(times["zerotile"], 2),
            speedup=round(times["dense"] / max(times["zerotile"], 1e-9), 3),
        )
        rows.append(row)
        print(row, flush=True)

    if args.csv and rows:
        from qgtc_ppopp22_tpu.utils.metrics import write_csv

        write_csv(args.csv, rows, list(rows[0].keys()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
