"""Command-line driver (reference ``main_qgtc.py`` /
``cluster_gcn_dgl.py`` equivalents in one entry point).

Usage mirrors the reference (``main_qgtc.py:21-41``)::

    python -m qgtc_ppopp22_tpu.cli --dataset ogbn-arxiv --bit_width 2 \
        --use_QGTC [--run_GIN] [--zerotile_jump] [--regular]

``--use_QGTC`` runs the quantized engine; ``--regular`` runs the
full-precision baseline (the DGL-driver role); ``--run_GIN`` switches
the dataflow GCN -> GIN (hidden 16 -> 64, matching
``0_7a…py:6`` / ``0_7b…py:6``). Prints ``Avg. Epoch: <ms> ms`` exactly
like the reference (``main_qgtc.py:157-159``) so its log parsers would
work unchanged, plus a structured JSON record.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

# Persistent XLA compilation cache: the zero-tile kernels take minutes
# to compile the first time; reruns hit the cache.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/qgtc_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

import jax

from qgtc_ppopp22_tpu.graph import ClusterBatcher, load_dataset
from qgtc_ppopp22_tpu.runtime import BaselineEngine, QGTCEngine


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="QGTC-TPU quantized GNN driver")
    p.add_argument("--dataset", type=str, default="ppi")
    p.add_argument("--data-dir", type=str, default="qgtc_graphs")
    p.add_argument("--dataset-scale", type=float, default=1.0,
                   help="shrink factor for synthetic stand-in datasets")
    p.add_argument("--n-epochs", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=20)
    p.add_argument("--psize", type=int, default=None,
                   help="partition count (default: 1500, or a "
                        "per-dataset override for very large graphs)")
    p.add_argument("--hidden", type=int, default=None)
    p.add_argument("--num-layers", type=int, default=3)
    p.add_argument("--bit_width", type=int, default=2)
    p.add_argument("--use_QGTC", action="store_true")
    p.add_argument("--run_GIN", action="store_true")
    p.add_argument("--zerotile_jump", action="store_true")
    p.add_argument("--regular", action="store_true",
                   help="full-precision baseline (DGL-driver role)")
    p.add_argument("--sparse", action="store_true",
                   help="full-graph sparse quantized engine (CSR "
                        "segment-sum; no clustering/densification)")
    p.add_argument("--use-pp", action="store_true",
                   help="precompute feature aggregation (sampler precalc)")
    p.add_argument("--fmt", choices=("digits", "bits"), default="digits")
    p.add_argument("--resident", action="store_true",
                   help="park packed batches in HBM; time compute only")
    p.add_argument("--mode", choices=("step", "fused", "mega"),
                   default="step",
                   help="epoch execution: per-batch dispatch, scanned "
                        "epoch-per-dispatch, or whole-epoch mega kernel")
    p.add_argument("--sync-every-epoch", action="store_true",
                   help="per-epoch wall times instead of the "
                        "reference's one-sync-at-end methodology")
    p.add_argument("--bucket-rows", type=int, default=512)
    p.add_argument("--partition-method", type=str, default="auto")
    p.add_argument("--cache-dir", type=str, default="./datasets")
    p.add_argument("--rnd_seed", type=int, default=3)
    p.add_argument("--eval-accuracy", action="store_true")
    p.add_argument("--timing-split", action="store_true",
                   help="report transfer vs compute split (reference "
                        "cluster_gcn.py per-phase timers)")
    p.add_argument("--json-out", type=str, default=None)
    p.add_argument("--weights", type=str, default=None,
                   help="load a QAT checkpoint (models/train.py "
                        "save_checkpoint) instead of random weights")
    p.add_argument("--profile-dir", type=str, default=None,
                   help="capture a jax.profiler trace of the timed "
                        "epochs into this directory")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    random.seed(args.rnd_seed)
    np.random.seed(args.rnd_seed)

    t0 = time.perf_counter()
    ds = load_dataset(
        args.dataset, data_dir=args.data_dir, scale=args.dataset_scale
    )
    print(f"[t] dataset load/synth: {time.perf_counter()-t0:.1f}s")
    print(
        f"dataset {ds.name}: {ds.num_nodes} nodes, "
        f"{ds.graph.num_edges} edges, dim {ds.feat_dim}, "
        f"{ds.num_classes} classes"
    )

    t0 = time.perf_counter()
    if args.sparse:
        import jax.numpy as jnp

        from qgtc_ppopp22_tpu.graph.batching import quantize_np
        from qgtc_ppopp22_tpu.models.qmodels import (
            QModelConfig,
            init_weights,
        )
        from qgtc_ppopp22_tpu.models.sparse import sparse_q_forward
        from qgtc_ppopp22_tpu.runtime import EpochStats, _sync, _timed_epochs

        model = "gin" if args.run_GIN else "gcn"
        hidden = args.hidden or (16 if model == "gcn" else 64)
        cfg = QModelConfig(
            ds.feat_dim, hidden, ds.num_classes,
            bit_width=args.bit_width, num_layers=args.num_layers,
        )
        ws = init_weights(jax.random.PRNGKey(args.rnd_seed), cfg)
        qws = [
            jnp.asarray(quantize_np(np.asarray(w), args.bit_width))
            for w in ws
        ]
        indptr = jax.device_put(jnp.asarray(ds.graph.indptr))
        indices = jax.device_put(jnp.asarray(ds.graph.indices))
        qx = jax.device_put(
            jnp.asarray(quantize_np(ds.features, args.bit_width))
        )
        bw, mn = args.bit_width, model
        fwd = jax.jit(
            lambda ip, ix, x, w: sparse_q_forward(
                ip, ix, x, w, out_bits=bw, model=mn
            )
        )
        _sync(fwd(indptr, indices, qx, qws))
        stats = _timed_epochs(
            lambda: fwd(indptr, indices, qx, qws),
            args.n_epochs, 1, args.sync_every_epoch,
        )
        record = dict(
            dataset=ds.name,
            bit_width=args.bit_width,
            model=model,
            engine="sparse-full-graph",
            n_epochs=args.n_epochs,
        )
        print(f"Avg. Epoch: {stats.avg_ms:.3f} ms")
        record["avg_epoch_ms"] = stats.avg_ms
        record["epoch_ms"] = stats.epoch_ms
        line = json.dumps(record)
        print(line)
        if args.json_out:
            with open(args.json_out, "a") as f:
                f.write(line + "\n")
        return 0


    from qgtc_ppopp22_tpu.graph.datasets import DEFAULT_PSIZE

    psize = args.psize or DEFAULT_PSIZE.get(ds.name, 1500)
    batcher = ClusterBatcher(
        ds,
        psize=psize,
        batch_size=args.batch_size,
        bit_width=args.bit_width,
        seed=args.rnd_seed,
        bucket_rows=args.bucket_rows,
        precalc=args.use_pp,
        partition_method=args.partition_method,
        cache_dir=args.cache_dir,
    )
    print(
        f"[t] partition+pack: {time.perf_counter()-t0:.1f}s; "
        f"{len(batcher)} batches/epoch, shape buckets {batcher.buckets()}"
    )

    record = dict(
        dataset=ds.name,
        bit_width=args.bit_width,
        model="gin" if args.run_GIN else "gcn",
        engine="regular" if args.regular else "qgtc",
        psize=psize,
        batch_size=args.batch_size,
        n_epochs=args.n_epochs,
        zerotile_jump=args.zerotile_jump,
        resident=args.resident,
        mode=args.mode,
    )

    if args.regular:
        eng = BaselineEngine(
            feat_dim=batcher.feat_dim,
            num_classes=ds.num_classes,
            model="gin" if args.run_GIN else "sage",
            hidden=args.hidden,
            num_layers=args.num_layers,
            seed=args.rnd_seed,
        )
        stats = eng.run_epochs(batcher, ds, n_epochs=args.n_epochs)
    else:
        shifts = None
        model_name = "gin" if args.run_GIN else "gcn"
        bit_width, hidden, num_layers = (
            args.bit_width, args.hidden, args.num_layers
        )
        if args.weights:
            # The checkpoint is authoritative for the model geometry
            # and quantization config it was trained with.
            from qgtc_ppopp22_tpu.models.train import load_checkpoint

            ck_ws, shifts, ck_cfg, ck_model = load_checkpoint(args.weights)
            model_name = ck_model
            bit_width = ck_cfg.bit_width
            hidden = ck_cfg.hidden
            num_layers = ck_cfg.num_layers
            print(
                f"loaded checkpoint: {ck_model}, {bit_width}-bit, "
                f"hidden={hidden}, layers={num_layers}, shifts={shifts}"
            )
        eng = QGTCEngine(
            feat_dim=batcher.feat_dim,
            num_classes=ds.num_classes,
            model=model_name,
            bit_width=bit_width,
            hidden=hidden,
            num_layers=num_layers,
            zerotile_jump=args.zerotile_jump,
            fmt=args.fmt,
            seed=args.rnd_seed,
            shifts=shifts,
        )
        if args.weights:
            from qgtc_ppopp22_tpu.models.qmodels import pack_weights

            eng.float_weights = list(ck_ws)
            eng.weights = pack_weights(
                ck_ws, bit_width,
                fmt="digits" if args.fmt == "digits" else "bits",
            )
        if args.mode == "step":
            t0 = time.perf_counter()
            eng.warmup(batcher)
            print(f"[t] warmup/compile: {time.perf_counter()-t0:.1f}s")
        prof = None
        if args.profile_dir:
            prof = jax.profiler.trace(args.profile_dir)
            prof.__enter__()
        if args.mode == "mega":
            stats = eng.run_epochs_mega(
                batcher, n_epochs=args.n_epochs,
                sync_every_epoch=args.sync_every_epoch,
            )
        elif args.mode == "fused":
            stats = eng.run_epochs_fused(
                batcher, n_epochs=args.n_epochs,
                sync_every_epoch=args.sync_every_epoch,
            )
        else:
            stats = eng.run_epochs(
                batcher, n_epochs=args.n_epochs, resident=args.resident,
                sync_every_epoch=args.sync_every_epoch,
            )
        if args.profile_dir and prof is not None:
            prof.__exit__(None, None, None)
        if args.zerotile_jump:
            # Aggregate tile counters (reference print_counter role,
            # kernel.h:17-28 / parse_counter.py)
            from qgtc_ppopp22_tpu.ops.digitmm import build_tile_map_digits
            from qgtc_ppopp22_tpu.ops.digits import to_digit_tensor

            # jitted per bucket shape: the eager per-op path costs
            # seconds per batch over the dispatch tunnel
            @jax.jit
            def _counts(bit_a):
                tm = build_tile_map_digits(to_digit_tensor(bit_a))
                return jax.numpy.sum(tm.kcnt), tm.kidx.size

            total = processed = 0
            for b in batcher.batches:
                proc, tot = _counts(jax.device_put(b.bit_A))
                total += int(tot)
                processed += int(proc)
            record["tiles_total"] = total
            record["tiles_processed"] = processed
            print(
                f"zero-tile: processed {processed}/{total} "
                f"(jumped {1 - processed / max(total, 1):.1%})"
            )
        if args.timing_split:
            # transfer+compute (reference boundary) vs compute-only
            both = eng.run_epochs(
                batcher, n_epochs=max(args.n_epochs // 2, 2),
                resident=False,
            ).avg_ms
            comp = eng.run_epochs(
                batcher, n_epochs=max(args.n_epochs // 2, 2),
                resident=True,
            ).avg_ms
            record["transfer_ms"] = round(max(both - comp, 0.0), 3)
            record["compute_ms"] = round(comp, 3)
            print(
                f"timing split: transfer {record['transfer_ms']:.2f} ms, "
                f"compute {record['compute_ms']:.2f} ms per epoch"
            )
        if args.eval_accuracy:
            acc = eng.evaluate(batcher, ds.labels)
            record["accuracy"] = acc
            print(f"accuracy: {acc:.4f}")

    # Reference print format (main_qgtc.py:157-159).
    print(f"Avg. Epoch: {stats.avg_ms:.3f} ms")
    record["avg_epoch_ms"] = stats.avg_ms
    record["epoch_ms"] = stats.epoch_ms
    line = json.dumps(record)
    print(line)
    if args.json_out:
        with open(args.json_out, "a") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
