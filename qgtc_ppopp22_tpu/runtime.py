"""Single-host inference engine: jitted per-bucket steps + epoch loop.

Equivalent of the reference driver's epoch machinery
(``main_qgtc.py:112-159``): iterate pre-packed cluster batches, move
each batch host->device inside the timed region (the reference's
``cluster.cuda()`` boundary, ``main_qgtc.py:115`` — SURVEY quirk 8),
run the quantized forward chain, synchronize once per epoch, report
the average epoch time over ``n_epochs``.

TPU-specific structure:

* One jitted step function; XLA recompiles per *shape bucket* (the
  batcher pads node counts to a few buckets precisely so this stays a
  handful of compilations, vs the reference's shape-per-batch).
* The step consumes the packed **storage format** (what crossed the
  host->device link, 8-32x smaller than dense), converts to the int8
  digit **compute format** on-device, optionally builds the zero-tile
  occupancy map, and runs the GEMM chain with the fused epilogue.
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from qgtc_ppopp22_tpu.graph.batching import ClusterBatch, ClusterBatcher
from qgtc_ppopp22_tpu.models.baselines import (
    gin_forward,
    init_mlp_weights,
    sage_forward,
)
from qgtc_ppopp22_tpu.models.qmodels import (
    QModelConfig,
    init_weights,
    pack_weights,
    qgcn_forward,
    qgin_forward,
)
from qgtc_ppopp22_tpu.ops.bitpack import BitTensor
from qgtc_ppopp22_tpu.ops.digitmm import build_tile_map_digits
from qgtc_ppopp22_tpu.ops.digits import to_digit_tensor


@dataclasses.dataclass
class EpochStats:
    epoch_ms: List[float]
    n_batches: int

    @property
    def avg_ms(self) -> float:
        return float(np.mean(self.epoch_ms)) if self.epoch_ms else 0.0


class QGTCEngine:
    """Quantized GNN inference engine (reference ``main_qgtc.py`` role).

    ``model``: ``'gcn'`` (update-then-aggregate, hidden=16 default) or
    ``'gin'`` (aggregate-then-update, hidden=64 default) —
    ``main_qgtc.py:127-154``. ``fmt='digits'`` is the TPU fast path;
    ``fmt='bits'`` computes directly from packed planes (in-kernel
    unpack — slower, kept for parity/ablation).
    """

    def __init__(
        self,
        feat_dim: int,
        num_classes: int,
        model: str = "gcn",
        bit_width: int = 2,
        hidden: Optional[int] = None,
        num_layers: int = 3,
        zerotile_jump: bool = False,
        fmt: str = "digits",
        seed: int = 0,
        interpret: Optional[bool] = None,
    ):
        if model not in ("gcn", "gin"):
            raise ValueError(f"unknown model {model!r}")
        if hidden is None:
            hidden = 16 if model == "gcn" else 64  # 0_7a…py:6 / 0_7b…py:6
        self.model = model
        self.bit_width = bit_width
        self.zerotile_jump = zerotile_jump
        self.fmt = fmt
        self.cfg = QModelConfig(
            in_dim=feat_dim,
            hidden=hidden,
            out_dim=num_classes,
            bit_width=bit_width,
            num_layers=num_layers,
        )
        self.float_weights = init_weights(jax.random.PRNGKey(seed), self.cfg)
        self.weights = pack_weights(
            self.float_weights,
            bit_width,
            fmt="digits" if fmt == "digits" else "bits",
        )
        fwd = qgcn_forward if model == "gcn" else qgin_forward
        zerotile = zerotile_jump

        def step(bit_a: BitTensor, bit_x: BitTensor, ws):
            if fmt == "digits":
                a = to_digit_tensor(bit_a)
                x = to_digit_tensor(bit_x)
            else:
                a, x = bit_a, bit_x
            tm = None
            if zerotile and fmt == "digits":
                tm = build_tile_map_digits(a)
            return fwd(
                a, x, ws, out_bits=bit_width, tile_map=tm,
                interpret=interpret,
            )

        self._step = jax.jit(step)

    # -- single batch ---------------------------------------------------

    def put_batch(self, batch: ClusterBatch):
        """Host->device transfer of the packed storage format."""
        return (
            jax.device_put(batch.bit_A),
            jax.device_put(batch.bit_X),
        )

    def forward_batch(self, batch: ClusterBatch) -> jnp.ndarray:
        bit_a, bit_x = self.put_batch(batch)
        return self._step(bit_a, bit_x, tuple(self.weights))

    # -- epoch loop (reference timing semantics) ------------------------

    def warmup(self, batcher: ClusterBatcher) -> None:
        """Compile every shape bucket outside the timed region."""
        seen = set()
        for b in batcher.batches:
            key = (b.padded_nodes, b.bit_X.shape[1])
            if key not in seen:
                seen.add(key)
                _sync(self.forward_batch(b))

    def run_epochs(
        self,
        batcher: ClusterBatcher,
        n_epochs: int = 20,
        resident: bool = False,
    ) -> EpochStats:
        """Timed epochs over all cluster batches.

        ``resident=False`` matches the reference's measured region
        (``main_qgtc.py:112-159``): pre-packing excluded, per-step
        host->device transfer of the packed tensors included, one
        synchronize per epoch. ``resident=True`` parks the packed
        batches in HBM once (they are 8-32x compressed; a whole
        epoch's batches fit easily) and times compute only — the
        idiomatic TPU serving deployment, and the honest configuration
        when the host link is a network tunnel rather than PCIe.
        """
        self.warmup(batcher)
        staged = None
        if resident:
            staged = [self.put_batch(b) for b in batcher.batches]
        times = []
        ws = tuple(self.weights)
        for _ in range(n_epochs):
            t0 = time.perf_counter()
            out = None
            if resident:
                for bit_a, bit_x in staged:
                    out = self._step(bit_a, bit_x, ws)
            else:
                for batch in batcher:
                    out = self.forward_batch(batch)
            _sync(out)
            times.append((time.perf_counter() - t0) * 1e3)
        return EpochStats(epoch_ms=times, n_batches=len(batcher))

    # -- accuracy -------------------------------------------------------

    def evaluate(self, batcher: ClusterBatcher, labels: np.ndarray) -> float:
        """Masked node-classification accuracy over all batches."""
        correct = total = 0
        for batch in batcher.batches:
            logits = np.asarray(self.forward_batch(batch))
            pred = logits[: batch.num_nodes].argmax(axis=1)
            lab = labels[batch.nodes]
            correct += int((pred == lab).sum())
            total += batch.num_nodes
        return correct / max(total, 1)


class BaselineEngine:
    """Full-precision baseline engine (reference DGL-driver role,
    ``cluster_gcn_dgl.py`` / ``batched_gin_dgl.py``): dense bf16
    aggregation on the MXU over the same cluster batches."""

    def __init__(
        self,
        feat_dim: int,
        num_classes: int,
        model: str = "sage",
        hidden: Optional[int] = None,
        num_layers: int = 3,
        seed: int = 0,
    ):
        if hidden is None:
            hidden = 16 if model == "sage" else 64
        dims = [feat_dim] + [hidden] * (num_layers - 1) + [num_classes]
        self.weights = init_mlp_weights(jax.random.PRNGKey(seed), dims)
        fwd = sage_forward if model == "sage" else gin_forward

        def step(a_dense, x, ws):
            return fwd(a_dense, x, ws)

        self._step = jax.jit(step)
        self._dense_cache: dict = {}

    def forward_batch(self, batch: ClusterBatch, dataset) -> jnp.ndarray:
        # The DGL baseline ships the subgraph + float features to the
        # device per step (cluster_gcn_dgl.py:97-101); equivalent here:
        # dense uint8 A + f32 X over the link.
        key = id(batch)
        if key not in self._dense_cache:
            n, pn = batch.num_nodes, batch.padded_nodes
            a = np.zeros((pn, pn), np.uint8)
            a[:n, :n] = dataset.graph.subgraph_dense(batch.nodes)
            x = np.zeros((pn, batch.bit_X.shape[1]), np.float32)
            x[:n] = dataset.features[batch.nodes][:, : batch.bit_X.shape[1]]
            self._dense_cache[key] = (a, x)
        a, x = self._dense_cache[key]
        return self._step(
            jax.device_put(a), jax.device_put(x), tuple(self.weights)
        )

    def run_epochs(self, batcher, dataset, n_epochs: int = 20) -> EpochStats:
        for b in batcher.batches:  # warm all buckets
            _sync(self.forward_batch(b, dataset))
        times = []
        for _ in range(n_epochs):
            t0 = time.perf_counter()
            out = None
            for batch in batcher:
                out = self.forward_batch(batch, dataset)
            _sync(out)
            times.append((time.perf_counter() - t0) * 1e3)
        return EpochStats(epoch_ms=times, n_batches=len(batcher))


def _sync(x) -> None:
    """Synchronize by fetching a value (block_until_ready does not
    drain the remote dispatch stream on this backend)."""
    if x is None:
        return
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[0]))
