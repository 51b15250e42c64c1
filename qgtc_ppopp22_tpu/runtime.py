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
    """``epoch_ms`` holds per-epoch wall times when ``sync_every_epoch``
    was requested, else the single amortized average (the reference's
    methodology: one ``cuda.synchronize`` after ALL epochs, total
    divided by ``n_epochs`` — ``main_qgtc.py:157-159``)."""

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
        shifts: Optional[Sequence[int]] = None,
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
        self.shifts = tuple(shifts) if shifts is not None else None
        shifts_t = self.shifts

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
                interpret=interpret, shifts=shifts_t,
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
        sync_every_epoch: bool = False,
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
        ws = tuple(self.weights)

        def one_epoch():
            out = None
            if resident:
                for bit_a, bit_x in staged:
                    out = self._step(bit_a, bit_x, ws)
            else:
                for batch in batcher:
                    out = self.forward_batch(batch)
            return out

        return _timed_epochs(
            one_epoch, n_epochs, len(batcher), sync_every_epoch
        )

    # -- fused epoch: all batches in one dispatch -----------------------

    def _fused_groups(self, batcher: ClusterBatcher):
        """Stack batches by shape bucket -> [(a_stack, x_stack, metas)]."""
        groups: dict = {}
        for b in batcher.batches:
            key = (b.padded_nodes, b.bit_X.shape[1])
            groups.setdefault(key, []).append(b)
        out = []
        for key, bs in groups.items():
            a_stack = np.stack([np.asarray(b.bit_A.planes) for b in bs])
            x_stack = np.stack([np.asarray(b.bit_X.planes) for b in bs])
            out.append((key, bs, a_stack, x_stack))
        return out

    def _fused_epoch_fn(self, pn: int, xshape) -> "jax.stages.Wrapped":
        """jitted scan over a stacked batch group (one dispatch/epoch).

        Per-step dispatch over a remote link costs ~0.5 ms; at 75
        cluster batches that dwarfs the ~50 us of GEMM work per batch
        (measured: 45-50 ms/epoch stepwise). Scanning the whole epoch
        inside one jit removes all but one dispatch.
        """
        fmt, zerotile, bit_width = self.fmt, self.zerotile_jump, self.bit_width
        fwd = qgcn_forward if self.model == "gcn" else qgin_forward
        shifts_t = self.shifts

        def one(planes_pair, ws):
            ap, xp = planes_pair
            bit_a = BitTensor(planes=ap, shape=(pn, pn), bits=1)
            bit_x = BitTensor(planes=xp, shape=xshape, bits=bit_width)
            if fmt == "digits":
                a = to_digit_tensor(bit_a)
                x = to_digit_tensor(bit_x)
            else:
                a, x = bit_a, bit_x
            tm = None
            if zerotile and fmt == "digits":
                tm = build_tile_map_digits(a)
            return fwd(a, x, ws, out_bits=bit_width, tile_map=tm,
                       shifts=shifts_t)

        def epoch(a_stack, x_stack, ws):
            def body(carry, pair):
                return carry, one(pair, ws)

            _, outs = jax.lax.scan(body, 0, (a_stack, x_stack))
            return outs

        return jax.jit(epoch)

    def run_epochs_fused(
        self,
        batcher: ClusterBatcher,
        n_epochs: int = 20,
        sync_every_epoch: bool = False,
    ) -> EpochStats:
        """Resident + whole-epoch-per-dispatch timing mode."""
        ws = tuple(self.weights)
        staged = []
        for key, bs, a_stack, x_stack in self._fused_groups(batcher):
            pn = key[0]
            xshape = bs[0].bit_X.shape
            fn = self._fused_epoch_fn(pn, xshape)
            a_d, x_d = jax.device_put(a_stack), jax.device_put(x_stack)
            _sync(fn(a_d, x_d, ws))  # compile + warm
            staged.append((fn, a_d, x_d))

        def one_epoch():
            out = None
            for fn, a_d, x_d in staged:
                out = fn(a_d, x_d, ws)
            return out

        return _timed_epochs(
            one_epoch, n_epochs, len(batcher), sync_every_epoch
        )

    # -- mega-kernel epoch: whole model chain in one pallas call --------

    def run_epochs_mega(
        self,
        batcher: ClusterBatcher,
        n_epochs: int = 20,
        sync_every_epoch: bool = False,
    ) -> EpochStats:
        """One kernel launch per epoch (``ops/fused_model.py``).

        Stages each shape bucket as an on-device int8 adjacency stack
        (storage-format planes cross the link, unpacked to digits once
        on-device) and runs the whole GCN/GIN chain per batch with the
        adjacency resident in VMEM. Requires ``fmt='digits'``.
        """
        if self.fmt != "digits":
            raise ValueError("mega mode requires fmt='digits'")
        from qgtc_ppopp22_tpu.ops.fused_model import fused_model_epoch

        ws = tuple(self.weights)
        model, bit_width = self.model, self.bit_width
        from qgtc_ppopp22_tpu.ops.digits import planes_stack_to_digits

        staged = []
        for key, bs, a_np, x_np in self._fused_groups(batcher):
            # Chunked transfer + conversion: the uint32 unpack
            # intermediate is 4 bytes/element, so converting hundreds
            # of batches in one call OOMs HBM at products scale.
            pn_, xshape = key[0], bs[0].bit_X.shape
            bw = self.bit_width
            conv_a = jax.jit(
                lambda p: planes_stack_to_digits(p, (pn_, pn_), 1)[:, 0]
            )
            conv_x = jax.jit(
                lambda p: planes_stack_to_digits(p, xshape, bw)
            )
            step_n = 16
            B_ = len(bs)
            # donated in-place fill: peak HBM = final stack + one chunk
            fill_a = jax.jit(
                lambda st, part, i: jax.lax.dynamic_update_slice(
                    st, part, (i, 0, 0)
                ),
                donate_argnums=0,
            )
            fill_x = jax.jit(
                lambda st, part, i: jax.lax.dynamic_update_slice(
                    st, part, (i, 0, 0, 0)
                ),
                donate_argnums=0,
            )
            a_stack = None
            x_stack = None
            for i in range(0, B_, step_n):
                pa = conv_a(jax.device_put(a_np[i: i + step_n]))
                px = conv_x(jax.device_put(x_np[i: i + step_n]))
                if a_stack is None:
                    a_stack = jnp.zeros(
                        (B_,) + pa.shape[1:], jnp.int8
                    )
                    x_stack = jnp.zeros(
                        (B_,) + px.shape[1:], jnp.int8
                    )
                a_stack = fill_a(a_stack, pa, i)
                x_stack = fill_x(x_stack, px, i)
            shifts_t = self.shifts
            try:
                fn = jax.jit(
                    lambda a_, x_, w_: fused_model_epoch(
                        a_, x_, w_, bit_width, model=model,
                        shifts=shifts_t,
                    )
                )
                _sync(fn(a_stack, x_stack, ws))  # compile + warm
                staged.append((fn, a_stack, x_stack))
            except Exception:
                # Bucket exceeds the mega kernel's VMEM budget (or any
                # compile failure): run this bucket through the scan
                # engine instead — still one dispatch per epoch.
                del a_stack, x_stack
                sfn = self._fused_epoch_fn(pn_, xshape)
                a_d = jax.device_put(a_np)
                x_d = jax.device_put(x_np)
                _sync(sfn(a_d, x_d, ws))
                staged.append((sfn, a_d, x_d))

        def one_epoch():
            out = None
            for fn, a_d, x_d in staged:
                out = fn(a_d, x_d, ws)
            return out

        return _timed_epochs(
            one_epoch, n_epochs, len(batcher), sync_every_epoch
        )

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
        self._fwd = fwd

        def step(a_dense, x, ws):
            return fwd(a_dense, x, ws)

        self._step = jax.jit(step)
        self._dense_cache: dict = {}

    def forward_batch(
        self, batch: ClusterBatch, dataset, features=None
    ) -> jnp.ndarray:
        # The DGL baseline ships the subgraph + float features to the
        # device per step (cluster_gcn_dgl.py:97-101); equivalent here:
        # dense uint8 A + f32 X over the link. ``features`` must be
        # the batcher's (which may be precalc-augmented); falls back
        # to the dataset's raw features.
        key = id(batch)
        if key not in self._dense_cache:
            feats = features if features is not None else dataset.features
            n, pn = batch.num_nodes, batch.padded_nodes
            a = np.zeros((pn, pn), np.uint8)
            a[:n, :n] = dataset.graph.subgraph_dense(batch.nodes)
            x = np.zeros((pn, batch.bit_X.shape[1]), np.float32)
            x[:n] = feats[batch.nodes][:, : batch.bit_X.shape[1]]
            self._dense_cache[key] = (a, x)
        a, x = self._dense_cache[key]
        return self._step(
            jax.device_put(a), jax.device_put(x), tuple(self.weights)
        )

    def run_epochs(
        self,
        batcher,
        dataset,
        n_epochs: int = 20,
        resident: bool = True,
        sync_every_epoch: bool = False,
    ) -> EpochStats:
        for b in batcher.batches:  # warm all buckets + fill dense cache
            _sync(self.forward_batch(b, dataset, batcher.features))
        staged = None
        if resident:
            staged = []
            for b in batcher.batches:
                a, x = self._dense_cache[id(b)]
                staged.append((jax.device_put(a), jax.device_put(x)))
        ws = tuple(self.weights)

        def one_epoch():
            out = None
            if resident:
                for a_d, x_d in staged:
                    out = self._step(a_d, x_d, ws)
            else:
                for batch in batcher:
                    out = self.forward_batch(batch, dataset)
            return out

        return _timed_epochs(
            one_epoch, n_epochs, len(batcher), sync_every_epoch
        )

    def run_epochs_fused(
        self,
        batcher,
        dataset,
        n_epochs: int = 20,
        sync_every_epoch: bool = False,
    ) -> EpochStats:
        """Scan-fused baseline epochs (one dispatch per epoch)."""
        return _baseline_fused_epochs(
            self, batcher, dataset, n_epochs, sync_every_epoch
        )


def _baseline_fused_epochs(
    engine: "BaselineEngine",
    batcher,
    dataset,
    n_epochs: int,
    sync_every_epoch: bool,
) -> EpochStats:
    """Scan-fused fp32 baseline epochs (dispatch-free, for an honest
    kernel-level comparison against the quantized engine's fused
    modes). Dense adjacencies are staged uint8 and cast in-graph."""
    for b in batcher.batches:
        _sync(engine.forward_batch(b, dataset, batcher.features))
    groups: dict = {}
    for b in batcher.batches:
        a, x = engine._dense_cache[id(b)]
        groups.setdefault(a.shape, []).append((a, x))
    ws = tuple(engine.weights)
    fwd = engine._fwd

    staged = []
    for shape, items in groups.items():
        a_stack = jax.device_put(np.stack([a for a, _ in items]))
        x_stack = jax.device_put(np.stack([x for _, x in items]))

        @jax.jit
        def epoch(a_s, x_s, ws_):
            def body(carry, pair):
                a, x = pair
                return carry, fwd(a.astype(jnp.bfloat16), x, ws_)

            _, outs = jax.lax.scan(body, 0, (a_s, x_s))
            return outs

        _sync(epoch(a_stack, x_stack, ws))
        staged.append((epoch, a_stack, x_stack))

    def one_epoch():
        out = None
        for fn, a_s, x_s in staged:
            out = fn(a_s, x_s, ws)
        return out

    return _timed_epochs(
        one_epoch, n_epochs, len(batcher), sync_every_epoch
    )


def _timed_epochs(
    one_epoch, n_epochs: int, n_batches: int, sync_every_epoch: bool
) -> EpochStats:
    """Reference timing semantics by default: launch ALL epochs, one
    synchronize at the end, report total/n_epochs
    (``main_qgtc.py:112-159``: ``torch.cuda.synchronize()`` only after
    the full loop). ``sync_every_epoch=True`` gives per-epoch walls
    (includes one dispatch round-trip per epoch)."""
    if sync_every_epoch:
        times = []
        for _ in range(n_epochs):
            t0 = time.perf_counter()
            out = one_epoch()
            _sync(out)
            times.append((time.perf_counter() - t0) * 1e3)
        return EpochStats(epoch_ms=times, n_batches=n_batches)
    t0 = time.perf_counter()
    out = None
    for _ in range(n_epochs):
        out = one_epoch()
    _sync(out)
    total = (time.perf_counter() - t0) * 1e3
    return EpochStats(
        epoch_ms=[total / max(n_epochs, 1)], n_batches=n_batches
    )


def _sync(x) -> None:
    """Synchronize by fetching a value (block_until_ready does not
    drain the remote dispatch stream on this backend)."""
    if x is None:
        return
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[0]))
