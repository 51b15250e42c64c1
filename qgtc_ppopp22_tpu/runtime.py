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
from qgtc_ppopp22_tpu.ops.bitgemm import TileMap
from qgtc_ppopp22_tpu.ops.bitpack import BitTensor
from qgtc_ppopp22_tpu.ops.digitmm import build_tile_map_digits
from qgtc_ppopp22_tpu.ops.digits import to_digit_tensor
from qgtc_ppopp22_tpu.ops.packmm import PACK_GROUP, PackedTensor


@dataclasses.dataclass
class EpochStats:
    """``epoch_ms`` holds per-epoch wall times when ``sync_every_epoch``
    was requested, else the single marginal per-epoch time (see
    ``_timed_epochs``). ``launch_sync_ms`` is total/n of one
    launch-all-then-synchronize window — the literal transcription of
    the reference's loop (``main_qgtc.py:157-159``), which on this
    backend includes a fixed ~25-40 ms tunnel round-trip that the
    reference's local ``cuda.synchronize`` does not pay."""

    epoch_ms: List[float]
    n_batches: int
    launch_sync_ms: float = 0.0

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
        zerotile_jump: Optional[bool] = None,
        fmt: str = "digits",
        seed: int = 0,
        interpret: Optional[bool] = None,
        shifts: Optional[Sequence[int]] = None,
        clamp_bits: Optional[int] = None,
    ):
        if model not in ("gcn", "gin"):
            raise ValueError(f"unknown model {model!r}")
        if hidden is None:
            hidden = 16 if model == "gcn" else 64  # 0_7a…py:6 / 0_7b…py:6
        if clamp_bits is not None and clamp_bits > bit_width:
            raise ValueError("clamp_bits must be <= bit_width")
        self.model = model
        self.bit_width = bit_width
        # Requant clamp width for intermediates. Defaults to the
        # datapath width (reference semantics: clamp to (0, 2^b),
        # kernel.h:347-351). A NARROWER clamp makes this engine
        # reproduce a clamp_bits-wide model bit-exactly while paying
        # full bit_width datapath cost — the deployment form of the
        # accuracy ladder's exact-emulation candidate
        # (models/train.qat_ladder).
        self.clamp_bits = clamp_bits or bit_width
        # Tri-state: True forces zero-tile skipping everywhere
        # (reference --zerotile_jump), False forces it off, None =
        # auto — off where measured as a regression (per-layer sparse
        # grids, VMEM-resident mega) and ON where measured as a win
        # (streaming mega: each skipped block saves its HBM crossing,
        # results/zero_tile_streaming.csv).
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
        out_bits = self.clamp_bits

        def step(a, bit_x: BitTensor, tm, ws):
            # ``a`` is a PackedTensor on the fast path (M-packed words
            # straight off the host link, consumed by the SWAR GEMM —
            # no on-device conversion at all); a BitTensor on the
            # ablation path (fmt='bits').
            x = to_digit_tensor(bit_x) if fmt == "digits" else bit_x
            return fwd(
                a, x, ws, out_bits=out_bits, tile_map=tm,
                interpret=interpret, shifts=shifts_t,
            )

        self._step = jax.jit(step)
        self._epoch_fn_cache: dict = {}

    # -- single batch ---------------------------------------------------

    def _tile_map(self, batch: ClusterBatch) -> Optional[TileMap]:
        """Pack-time zero-tile schedule (shipped with the batch; the
        reference's Fig. 8b mechanism, built once on the host instead
        of per step on device)."""
        if (
            not self.zerotile_jump
            or self.fmt != "digits"
            or batch.tile_kidx is None
        ):
            return None
        return TileMap(
            kidx=jnp.asarray(batch.tile_kidx),
            kcnt=jnp.asarray(batch.tile_kcnt),
            tile_m=PACK_GROUP,
            tile_k=256,
        )

    def put_batch(self, batch: ClusterBatch):
        """Host->device transfer of the packed storage format."""
        if self.fmt == "digits":
            pn = batch.padded_nodes
            a = PackedTensor(
                words=jax.device_put(batch.a_words),
                shape=(pn, pn),
                bits=1,
            )
        else:
            a = jax.device_put(batch.bit_A)
        return (a, jax.device_put(batch.bit_X), self._tile_map(batch))

    def forward_batch(self, batch: ClusterBatch) -> jnp.ndarray:
        a, bit_x, tm = self.put_batch(batch)
        return self._step(a, bit_x, tm, tuple(self.weights))

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
                for a, bit_x, tm in staged:
                    out = self._step(a, bit_x, tm, ws)
            else:
                for batch in batcher:
                    out = self.forward_batch(batch)
            return out

        return _timed_epochs(
            one_epoch, n_epochs, len(batcher), sync_every_epoch
        )

    # -- fused epoch: all batches in one dispatch -----------------------

    def _fused_groups(self, batcher: ClusterBatcher):
        """Stack batches by shape bucket -> [(key, batches, a_stack,
        x_stack, kidx_stack, kcnt_stack)]. ``a_stack`` is the M-packed
        word form (what the fused/mega kernels consume directly)."""
        groups: dict = {}
        for b in batcher.batches:
            key = (b.padded_nodes, b.bit_X.shape[1])
            groups.setdefault(key, []).append(b)
        out = []
        for key, bs in groups.items():
            a_stack = np.stack([b.a_words for b in bs])
            x_stack = np.stack([np.asarray(b.bit_X.planes) for b in bs])
            if self.zerotile_jump and bs[0].tile_kidx is not None:
                kidx = np.stack([b.tile_kidx for b in bs])
                kcnt = np.stack([b.tile_kcnt for b in bs])
            else:
                kidx = kcnt = None
            out.append((key, bs, a_stack, x_stack, kidx, kcnt))
        return out

    def _fused_epoch_fn(self, pn: int, xshape) -> "jax.stages.Wrapped":
        """jitted scan over a stacked batch group (one dispatch/epoch).

        Per-step dispatch over a remote link costs ~0.5 ms; at 75
        cluster batches that dwarfs the ~50 us of GEMM work per batch
        (measured: 45-50 ms/epoch stepwise). Scanning the whole epoch
        inside one jit removes all but one dispatch. Cached per
        (pn, xshape) so repeated eval sweeps retrace nothing.
        """
        key = (pn, tuple(xshape))
        cached = self._epoch_fn_cache.get(key)
        if cached is not None:
            return cached
        bit_width = self.bit_width
        out_bits = self.clamp_bits
        fwd = qgcn_forward if self.model == "gcn" else qgin_forward
        shifts_t = self.shifts

        def one(scanned, ws):
            aw, xp = scanned[:2]
            a = PackedTensor(words=aw, shape=(pn, pn), bits=1)
            x = to_digit_tensor(
                BitTensor(planes=xp, shape=xshape, bits=bit_width)
            )
            tm = None
            if len(scanned) == 4:
                tm = TileMap(
                    kidx=scanned[2], kcnt=scanned[3],
                    tile_m=PACK_GROUP, tile_k=256,
                )
            return fwd(a, x, ws, out_bits=out_bits, tile_map=tm,
                       shifts=shifts_t)

        def epoch(stacks, ws):
            def body(carry, scanned):
                return carry, one(scanned, ws)

            _, outs = jax.lax.scan(body, 0, stacks)
            return outs

        fn = jax.jit(epoch)
        self._epoch_fn_cache[key] = fn
        return fn

    def run_epochs_fused(
        self,
        batcher: ClusterBatcher,
        n_epochs: int = 20,
        sync_every_epoch: bool = False,
    ) -> EpochStats:
        """Resident + whole-epoch-per-dispatch timing mode."""
        if self.fmt != "digits":
            raise ValueError("fused mode requires fmt='digits'")
        ws = tuple(self.weights)
        staged = []
        for key, bs, a_stack, x_stack, kidx, kcnt in self._fused_groups(
            batcher
        ):
            pn = key[0]
            xshape = bs[0].bit_X.shape
            fn = self._fused_epoch_fn(pn, xshape)
            stacks = (jax.device_put(a_stack), jax.device_put(x_stack))
            if kidx is not None:
                stacks += (jax.device_put(kidx), jax.device_put(kcnt))
            _sync(fn(stacks, ws))  # compile + warm
            staged.append((fn, stacks))

        def one_epoch():
            out = None
            for fn, stacks in staged:
                out = fn(stacks, ws)
            return out

        fns = [fn for fn, _ in staged]

        def epoch_all(stacks_list, w_):
            # Return EVERY bucket's output: inside one jitted program,
            # any bucket whose result is not returned is dead code and
            # XLA deletes its GEMMs wholesale — observed as artist
            # "epochs" that only ran the 2-batch tail bucket.
            return tuple(fn(st, w_) for fn, st in zip(fns, stacks_list))

        return _timed_epochs(
            one_epoch, n_epochs, len(batcher), sync_every_epoch,
            device_fn=epoch_all,
            device_args=(tuple(st for _, st in staged), ws),
        )

    # -- in-loop quantization epochs (cluster_gcn.py:181-206 role) ------

    def run_epochs_quant_in_loop(
        self,
        batcher: ClusterBatcher,
        n_epochs: int = 20,
        sync_every_epoch: bool = False,
    ) -> EpochStats:
        """Epochs that quantize + bit-pack X ON DEVICE inside the timed
        region — the reference's variant driver boundary
        (``cluster_gcn.py:181-182,205-206``: ``val2bit`` per batch in
        the loop, quantization NOT pre-packed). Float features enter
        the scan; each step pays quantize -> bit-pack -> digit convert
        before its forward chain. One dispatch per epoch (scan), so the
        measured delta vs :meth:`run_epochs_fused` is exactly the
        in-loop quantization cost."""
        if self.fmt != "digits":
            raise ValueError("quant-in-loop mode requires fmt='digits'")
        from qgtc_ppopp22_tpu.ops.bitpack import pack_bits
        from qgtc_ppopp22_tpu.ops.quantize import quantize

        ws = tuple(self.weights)
        bit_width = self.bit_width
        out_bits = self.clamp_bits
        fwd = qgcn_forward if self.model == "gcn" else qgin_forward
        shifts_t = self.shifts
        feats = batcher.features
        staged = []
        for key, bs, a_stack, _x, kidx, kcnt in self._fused_groups(batcher):
            pn = key[0]
            xf = np.zeros((len(bs), pn, batcher.feat_dim), np.float32)
            for i, b in enumerate(bs):
                xf[i, : b.num_nodes] = feats[b.nodes]

            def one(scanned, w_):
                aw, x_float = scanned[:2]
                a = PackedTensor(words=aw, shape=(pn, pn), bits=1)
                x = to_digit_tensor(pack_bits(
                    quantize(x_float, bit_width), bit_width
                ))
                tm = None
                if len(scanned) == 4:
                    tm = TileMap(kidx=scanned[2], kcnt=scanned[3],
                                 tile_m=PACK_GROUP, tile_k=256)
                return fwd(a, x, w_, out_bits=out_bits, tile_map=tm,
                           shifts=shifts_t)

            @jax.jit
            def epoch(stacks, w_):
                def body(carry, scanned):
                    return carry, one(scanned, w_)

                _, outs = jax.lax.scan(body, 0, stacks)
                return outs

            stacks = (jax.device_put(a_stack), jax.device_put(xf))
            if self.zerotile_jump and kidx is not None:
                stacks += (jax.device_put(kidx), jax.device_put(kcnt))
            _sync(epoch(stacks, ws))  # compile + warm
            staged.append((epoch, stacks))

        def one_epoch():
            out = None
            for fn, stacks in staged:
                out = fn(stacks, ws)
            return out

        fns = [fn for fn, _ in staged]

        def epoch_all(stacks_list, w_):
            # every bucket returned (DCE guard, see run_epochs_fused)
            return tuple(fn(st, w_) for fn, st in zip(fns, stacks_list))

        return _timed_epochs(
            one_epoch, n_epochs, len(batcher), sync_every_epoch,
            device_fn=epoch_all,
            device_args=(tuple(st for _, st in staged), ws),
        )

    def measure_transfer_ms(
        self, batcher: ClusterBatcher, n_rounds: int = 3
    ) -> float:
        """Wall time to ship one epoch's packed payload host->device
        (the reference's per-step ``cluster.cuda()`` boundary,
        ``main_qgtc.py:115``, measured in isolation). Minimum over
        ``n_rounds`` (transfer is deterministic; min rejects scheduler
        noise)."""
        times = []
        for _ in range(n_rounds):
            t0 = time.perf_counter()
            last = None
            for b in batcher.batches:
                last = self.put_batch(b)
            _sync(last)
            times.append((time.perf_counter() - t0) * 1e3)
        return min(times)

    # -- mega-kernel epoch: whole model chain in one pallas call --------

    def run_epochs_mega(
        self,
        batcher: ClusterBatcher,
        n_epochs: int = 20,
        sync_every_epoch: bool = False,
        resident_a: Optional[bool] = None,
    ) -> EpochStats:
        """ONE dispatch per epoch: every shape bucket's mega kernel
        (``ops/fused_model.py``) chained inside a single jitted epoch
        function — per-call dispatch through the remote tunnel costs
        0.3-1 ms, so three bucket launches per epoch used to cost more
        than the ~1.3 ms of actual MXU work. Buckets whose VMEM budget
        the mega kernel rejects (detected cheaply with
        ``jax.eval_shape``) run through the scan engine *inside the
        same dispatch*. Requires ``fmt='digits'``.
        """
        if self.fmt != "digits":
            raise ValueError("mega mode requires fmt='digits'")
        from qgtc_ppopp22_tpu.ops.fused_model import fused_model_epoch

        ws = tuple(self.weights)
        model, bit_width = self.model, self.bit_width
        clamp_bits = self.clamp_bits
        from qgtc_ppopp22_tpu.ops.digits import planes_stack_to_digits

        callees = []  # per bucket: f(bucket_args, ws) -> logits
        epoch_args = []  # per bucket: tuple of on-device stacks
        for key, bs, a_np, x_np, kidx, kcnt in self._fused_groups(batcher):
            # The packed adjacency words transfer as-is (the mega
            # kernel consumes them directly). Feature planes convert
            # to digits in chunks: the uint32 unpack intermediate is 4
            # bytes/element, so converting hundreds of batches in one
            # call OOMs HBM at products scale.
            pn_, xshape = key[0], bs[0].bit_X.shape
            bw = self.bit_width
            # a_np stacks per-batch [nd, mw, pn] word planes; the
            # 1-bit adjacency always has nd == 1 and the mega kernel
            # takes [B, mw, pn].
            a_stack = jax.device_put(a_np[:, 0])
            conv_x = jax.jit(
                lambda p: planes_stack_to_digits(p, xshape, bw)
            )
            step_n = 16
            B_ = len(bs)
            fill_x = jax.jit(
                lambda st, part, i: jax.lax.dynamic_update_slice(
                    st, part, (i, 0, 0, 0)
                ),
                donate_argnums=0,
            )
            x_stack = None
            for i in range(0, B_, step_n):
                px = conv_x(jax.device_put(x_np[i: i + step_n]))
                if x_stack is None:
                    x_stack = jnp.zeros(
                        (B_,) + px.shape[1:], jnp.int8
                    )
                x_stack = fill_x(x_stack, px, i)
            # Multi-digit X collapses to byte LEVELS (one plane): the
            # mega kernel splits the digits in-VMEM after the DMA, so
            # >4-bit features cross HBM once per batch instead of once
            # per digit plane (the dominant 8-bit epoch overhead).
            x_levels_bits = None
            if x_stack.shape[1] == 2:
                x_levels_bits = bw
                x_stack = jax.jit(
                    lambda xs: (
                        xs[:, 0].astype(jnp.int32)
                        | (xs[:, 1].astype(jnp.int32) << 4)
                    ).astype(jnp.int8)[:, None]
                )(x_stack)
            shifts_t = self.shifts
            # Measured regime split (results/zero_tile*.csv): in the
            # VMEM-RESIDENT kernel A crosses HBM once per batch, so
            # 2-D block skipping only saves MXU passes and its
            # predication + accumulate form costs more than it saves
            # (0.80x on arxiv) — there, occupancy is opt-in
            # (--zerotile_jump, reference flag semantics). In the
            # STREAMING kernel every skipped block saves its HBM
            # crossing: 1.15x on arxiv — there, skipping is ON by
            # default.
            # Residency tier: COMPILE-PROBED on TPU (the static
            # constants in mega_vmem_plan only prune hopeless tiers;
            # Mosaic itself arbitrates borderline shapes — see
            # fused_model.mega_plan_probe), static plan off-TPU.
            plan_res, plan_uo = resident_a, None
            will_stream = False
            if resident_a is not True:
                try:
                    from qgtc_ppopp22_tpu.ops.fused_model import (
                        mega_plan_probe,
                    )

                    plan_res, plan_uo = mega_plan_probe(
                        a_stack.shape, x_stack.shape, ws, clamp_bits,
                        model=model, shifts=shifts_t,
                        out_cols=self.cfg.out_dim,
                        x_cols=self.cfg.in_dim,
                        x_levels_bits=x_levels_bits,
                    )
                    if resident_a is not None:  # caller forced a tier
                        plan_res, plan_uo = resident_a, None
                    # auto zero-tile jumping only in its measured-win
                    # regime (streaming) and only when the flag is
                    # tri-state None
                    if self.zerotile_jump is None:
                        will_stream = not plan_res
                except ValueError:
                    plan_res, plan_uo = resident_a, None
                    # scan fallback below; occ irrelevant
            occ = None
            sched = None
            chunk = next(
                (c for c in (512, 256) if c <= pn_ and pn_ % c == 0),
                None,
            )
            if chunk is not None and (
                self.zerotile_jump is True or will_stream or plan_res
            ):
                from qgtc_ppopp22_tpu.ops.fused_model import (
                    mega_colblock,
                )

                cb = mega_colblock(pn_)
                occ_np = np.stack(
                    [
                        mega_block_occ(b.a_words, chunk, cb)
                        for b in bs
                    ]
                )
                skippable = 1.0 - occ_np.mean()
                if plan_res:
                    # RESIDENT: the occupancy-COMPACTED schedule
                    # (fori over occupied blocks only) replaces the
                    # predicated form that measured 0.80x. The fori
                    # body serializes unpack->dot per block (no
                    # static-unroll pipelining), costing ~5 us/batch
                    # at pn=2048 — measured win only at pn>=2560 with
                    # >=45% skippable (1.16x at 48%, 0.90x at
                    # pn=2048/38%; results/zero_tile.csv r5 rows).
                    # Auto-on inside that region; --zerotile_jump
                    # still forces.
                    # >4-bit (signed chain) measured a small LOSS
                    # under compact at the same skip ratio (arxiv
                    # 8-bit 1.252 vs 1.214 dense) while 1/2/4-bit won
                    # 14% — auto only for the digit chains. The
                    # 2-blocks-per-iteration fori brings pn=2048 to
                    # break-even at 38% skip (1.008x), so the gate is
                    # pn>=2048 at >=45% skippable.
                    if self.zerotile_jump is True or (
                        self.zerotile_jump is None
                        and skippable >= 0.45
                        and pn_ >= 2048
                        and self.bit_width <= 4
                    ):
                        sched_np = np.stack(
                            [
                                mega_block_sched(b.a_words, chunk, cb)
                                for b in bs
                            ]
                        )
                        sched = jax.device_put(sched_np)
                elif self.zerotile_jump is True or skippable >= 0.30:
                    # STREAMING: per-block predication saves the HBM
                    # crossing too; measured win above 30% skippable
                    # (results/zero_tile_streaming.csv: arxiv 1.14x at
                    # 47%, losses at 16-22%).
                    occ = jax.device_put(occ_np)

            def mega_fn(t, w_, with_occ=occ is not None,
                        with_sched=sched is not None,
                        xlb=x_levels_bits, ra=plan_res, uo=plan_uo):
                return fused_model_epoch(
                    t[0], t[1], w_, clamp_bits, model=model,
                    shifts=shifts_t,
                    chunk_occ=t[2] if with_occ else None,
                    blk_sched=t[2] if with_sched else None,
                    out_cols=self.cfg.out_dim,
                    resident_a=ra,
                    x_cols=self.cfg.in_dim,
                    x_levels_bits=xlb,
                    unpack_once=uo,
                )

            mega_args = (a_stack, x_stack) + (
                (occ,) if occ is not None
                else (sched,) if sched is not None
                else ()
            )
            try:
                # trace-time shape/VMEM validation only — no compile
                jax.eval_shape(mega_fn, mega_args, ws)
                callees.append(mega_fn)
                epoch_args.append(mega_args)
            except Exception as e:
                # Bucket exceeds the mega kernel's VMEM budget: run it
                # through the scan engine inside the same dispatch.
                # Loudly: a silent fallback once hid a shape bug that
                # turned every "mega" measurement into a scan
                # measurement.
                print(
                    f"[mega] bucket pn={pn_}: falling back to scan "
                    f"engine ({type(e).__name__}: {e})"
                )
                del x_stack, a_stack
                sfn = self._fused_epoch_fn(pn_, xshape)
                # the scan engine consumes the full [B, nd, mw, pn] form
                stacks = (jax.device_put(a_np), jax.device_put(x_np))
                if kidx is not None:
                    stacks += (jax.device_put(kidx), jax.device_put(kcnt))
                callees.append(lambda t, w_, fn=sfn: fn(t, w_))
                epoch_args.append(stacks)

        def epoch_all(all_args, w_):
            # Every bucket's output is returned: this whole epoch is
            # ONE jitted program, and a bucket whose logits aren't
            # among the outputs is dead code — XLA deletes its entire
            # pallas call (observed: multi-bucket datasets "ran" only
            # the last bucket in both the launch-sync and device-loop
            # timings).
            return tuple(f(t, w_) for f, t in zip(callees, all_args))

        efn = jax.jit(epoch_all)
        all_args = tuple(epoch_args)
        _sync(efn(all_args, ws))  # compile + warm

        def one_epoch():
            return efn(all_args, ws)

        return _timed_epochs(
            one_epoch, n_epochs, len(batcher), sync_every_epoch,
            device_fn=epoch_all,
            device_args=(all_args, ws),
        )

    # -- accuracy -------------------------------------------------------

    def forward_all(self, batcher: ClusterBatcher) -> List[np.ndarray]:
        """Logits for EVERY batch with one dispatch per shape bucket
        (the scanned epoch function), not one per batch.

        Round 2's evaluation paid ~75 tunnel round-trips per eval call
        — seconds per accuracy-frontier cell, the binding cost of the
        8-seed ladder sweeps. Requires ``fmt='digits'``."""
        ws = tuple(self.weights)
        out: dict = {}
        for key, bs, a_stack, x_stack, kidx, kcnt in self._fused_groups(
            batcher
        ):
            fn = self._fused_epoch_fn(key[0], bs[0].bit_X.shape)
            stacks = (jax.device_put(a_stack), jax.device_put(x_stack))
            if kidx is not None:
                stacks += (jax.device_put(kidx), jax.device_put(kcnt))
            res = np.asarray(jax.device_get(fn(stacks, ws)))
            for i, b in enumerate(bs):
                out[id(b)] = res[i]
        return [out[id(b)] for b in batcher.batches]

    def evaluate(self, batcher: ClusterBatcher, labels: np.ndarray) -> float:
        """Masked node-classification accuracy over all batches."""
        correct = total = 0
        if self.fmt == "digits":
            logits_list = self.forward_all(batcher)
        else:
            logits_list = [
                np.asarray(self.forward_batch(b)) for b in batcher.batches
            ]
        for batch, logits in zip(batcher.batches, logits_list):
            pred = logits[: batch.num_nodes].argmax(axis=1)
            lab = labels[batch.nodes]
            correct += int((pred == lab).sum())
            total += batch.num_nodes
        return correct / max(total, 1)

    def evaluate_f1(
        self, batcher: ClusterBatcher, multilabels: np.ndarray
    ) -> dict:
        """Multilabel micro/macro F1 (reference ``calc_f1``/``evaluate``
        role, ``utils.py:43-60``, used for ppi).

        The reference thresholds logits at 0; this engine's integer
        domain is unsigned (levels >= 0, ``kernel.h:31-71``), so raw
        logits are all nonnegative and the threshold is calibrated as
        the per-class mean logit instead (a bias the unsigned weight
        lattice cannot express).
        """
        logit_rows, label_rows = [], []
        if self.fmt == "digits":
            logits_list = self.forward_all(batcher)
        else:
            logits_list = [
                np.asarray(self.forward_batch(b)) for b in batcher.batches
            ]
        for batch, logits in zip(batcher.batches, logits_list):
            logit_rows.append(logits[: batch.num_nodes])
            label_rows.append(multilabels[batch.nodes])
        return _threshold_f1(
            np.concatenate(logit_rows), np.concatenate(label_rows)
        )


class SparseEngine:
    """Full-graph sparse quantized engine (``models/sparse.py`` over
    the whole CSR graph — no clustering, no densification).

    Same run/record interface as :class:`QGTCEngine` so the CLI treats
    every engine uniformly. Supports QAT checkpoints (float weights +
    requant shifts) and accuracy evaluation; exact-integer equivalent
    of the dense engines on the full graph.
    """

    def __init__(
        self,
        dataset,
        model: str = "gcn",
        bit_width: int = 2,
        hidden: Optional[int] = None,
        num_layers: int = 3,
        seed: int = 0,
        shifts: Optional[Sequence[int]] = None,
        float_weights: Optional[Sequence] = None,
    ):
        from qgtc_ppopp22_tpu.graph.batching import quantize_np
        from qgtc_ppopp22_tpu.models.qmodels import QModelConfig, init_weights
        from qgtc_ppopp22_tpu.models.sparse import sparse_q_forward

        if model not in ("gcn", "gin"):
            raise ValueError(model)
        if hidden is None:
            hidden = 16 if model == "gcn" else 64
        self.model = model
        self.bit_width = bit_width
        self.dataset = dataset
        self.cfg = QModelConfig(
            in_dim=dataset.feat_dim,
            hidden=hidden,
            out_dim=dataset.num_classes,
            bit_width=bit_width,
            num_layers=num_layers,
        )
        ws = (
            list(float_weights)
            if float_weights is not None
            else init_weights(jax.random.PRNGKey(seed), self.cfg)
        )
        self.float_weights = ws
        self.shifts = tuple(shifts) if shifts is not None else None
        self._qws = tuple(
            jnp.asarray(quantize_np(np.asarray(w), bit_width)) for w in ws
        )
        self._indptr = jax.device_put(jnp.asarray(dataset.graph.indptr))
        self._indices = jax.device_put(jnp.asarray(dataset.graph.indices))
        self._qx = jax.device_put(
            jnp.asarray(quantize_np(dataset.features, bit_width))
        )
        bw, mn, sh = bit_width, model, self.shifts
        self._fwd = jax.jit(
            lambda ip, ix, x, w: sparse_q_forward(
                ip, ix, x, w, out_bits=bw, model=mn, shifts=sh
            )
        )

    def forward(self) -> jnp.ndarray:
        return self._fwd(self._indptr, self._indices, self._qx, self._qws)

    def run_epochs(
        self, n_epochs: int = 20, sync_every_epoch: bool = False
    ) -> EpochStats:
        _sync(self.forward())  # compile + warm
        return _timed_epochs(
            self.forward, n_epochs, 1, sync_every_epoch,
            device_fn=self._fwd,
            device_args=(self._indptr, self._indices, self._qx, self._qws),
        )

    def evaluate(self, labels: np.ndarray) -> float:
        logits = np.asarray(self.forward())
        pred = logits[: len(labels)].argmax(axis=1)
        return float((pred == labels).mean())

    def evaluate_f1(self, multilabels: np.ndarray) -> dict:
        """Multilabel micro/macro F1 (see ``QGTCEngine.evaluate_f1``)."""
        logits = np.asarray(self.forward())[: len(multilabels)]
        return _threshold_f1(logits, multilabels)


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
        key = _batch_key(batch)
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
                a, x = self._dense_cache[_batch_key(b)]
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

    def run_epochs_mega(
        self,
        batcher,
        dataset,
        n_epochs: int = 20,
        sync_every_epoch: bool = False,
    ) -> EpochStats:
        """bf16 mega-kernel baseline epochs — the same whole-model
        single-launch fusion the quantized engine gets
        (``ops/fused_model.py::fused_baseline_epoch``), for a
        symmetric comparison. Buckets that exceed the VMEM budget
        fall back to the scan-fused epoch."""
        from qgtc_ppopp22_tpu.ops.fused_model import fused_baseline_epoch

        for b in batcher.batches:  # fill the dense cache
            _sync(self.forward_batch(b, dataset, batcher.features))
        groups: dict = {}
        for b in batcher.batches:
            a, x = self._dense_cache[_batch_key(b)]
            groups.setdefault(a.shape, []).append((a, x))
        ws = tuple(self.weights)
        fwd = self._fwd

        staged = []
        for shape, items in groups.items():
            a_stack = jax.device_put(
                np.stack([a for a, _ in items]).astype(np.int8)
            )
            x_stack = jax.device_put(np.stack([x for _, x in items]))
            try:
                fn = jax.jit(
                    lambda a_, x_, w_: fused_baseline_epoch(a_, x_, w_)
                )
                _sync(fn(a_stack, x_stack, ws))
                staged.append((fn, a_stack, x_stack))
            except Exception:
                @jax.jit
                def scan_epoch(a_s, x_s, ws_):
                    def body(carry, pair):
                        a, x = pair
                        return carry, fwd(a.astype(jnp.bfloat16), x, ws_)

                    _, outs = jax.lax.scan(body, 0, (a_s, x_s))
                    return outs

                _sync(scan_epoch(a_stack, x_stack, ws))
                staged.append((scan_epoch, a_stack, x_stack))

        def one_epoch():
            out = None
            for fn, a_s, x_s in staged:
                out = fn(a_s, x_s, ws)
            return out

        fns = [fn for fn, _, _ in staged]

        def epoch_all(stacks_list, w_):
            # All bucket outputs returned — see run_epochs_mega: an
            # unreturned bucket is dead code inside one jit.
            return tuple(
                fn(a_s, x_s, w_)
                for fn, (a_s, x_s) in zip(fns, stacks_list)
            )

        return _timed_epochs(
            one_epoch, n_epochs, len(batcher), sync_every_epoch,
            device_fn=epoch_all,
            device_args=(tuple((a, x) for _, a, x in staged), ws),
        )

    def evaluate(self, batcher, dataset, labels: np.ndarray) -> float:
        """Masked argmax accuracy (reference DGL ``evaluate`` role)."""
        correct = total = 0
        for batch in batcher.batches:
            logits = np.asarray(
                self.forward_batch(batch, dataset, batcher.features)
            )
            pred = logits[: batch.num_nodes].argmax(axis=1)
            correct += int((pred == labels[batch.nodes]).sum())
            total += batch.num_nodes
        return correct / max(total, 1)

    def evaluate_f1(self, batcher, dataset, multilabels: np.ndarray) -> dict:
        """Multilabel micro/macro F1 (reference ``calc_f1``,
        ``utils.py:43-60``)."""
        logit_rows, label_rows = [], []
        for batch in batcher.batches:
            logits = np.asarray(
                self.forward_batch(batch, dataset, batcher.features)
            )
            logit_rows.append(logits[: batch.num_nodes])
            label_rows.append(multilabels[batch.nodes])
        return _threshold_f1(
            np.concatenate(logit_rows), np.concatenate(label_rows)
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
        a, x = engine._dense_cache[_batch_key(b)]
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

    fns = [fn for fn, _, _ in staged]

    def epoch_all(stacks_list, ws_):
        # All bucket outputs returned — see run_epochs_mega: an
        # unreturned bucket is dead code inside one jit.
        return tuple(
            fn(a_s, x_s, ws_)
            for fn, (a_s, x_s) in zip(fns, stacks_list)
        )

    return _timed_epochs(
        one_epoch, n_epochs, len(batcher), sync_every_epoch,
        device_fn=epoch_all,
        device_args=(tuple((a, x) for _, a, x in staged), ws),
    )


def mega_chunk_occ(a_words: np.ndarray, chunk: int) -> np.ndarray:
    """Row-chunk occupancy of an M-packed adjacency (host-side, built
    at staging time): 1 where any word in the chunk's rows is nonzero.
    Feeds the mega kernel's zero-tile chunk skipping (reference
    Fig. 8b role, ``kernel.h:572-592``)."""
    chw = chunk // 32
    nd, mw, pn = a_words.shape
    return (
        (a_words.reshape(nd, mw // chw, chw, pn) != 0)
        .any(axis=(0, 2, 3))
        .astype(np.int32)
    )


def mega_block_occ(
    a_words: np.ndarray, chunk: int, cb: int
) -> np.ndarray:
    """2-D (row-chunk x col-block) occupancy [nch, pn//cb] of an
    M-packed adjacency, host-side at staging time. Feeds the mega
    kernel's streaming zero-block jumping (each block's DMA + MXU pass
    is skipped when its words are all zero; see
    ``fused_model_epoch``)."""
    chw = chunk // 32
    nd, mw, pn = a_words.shape
    return (
        (a_words.reshape(nd, mw // chw, chw, pn // cb, cb) != 0)
        .any(axis=(0, 2, 4))
        .astype(np.int32)
    )


def mega_block_sched(
    a_words: np.ndarray, chunk: int, cb: int
) -> np.ndarray:
    """Occupancy-COMPACTED block schedule int32[nch, nj+1] for the
    resident mega kernel: per row-chunk, ``[count, j_0, j_1, ...]``
    listing the occupied column-block indices (unused tail slots 0).
    The kernel fori-loops over exactly ``count`` blocks, so a skipped
    block costs nothing (``fused_model_epoch(blk_sched=...)``)."""
    occ = mega_block_occ(a_words, chunk, cb)
    nch, nj = occ.shape
    out = np.zeros((nch, nj + 1), np.int32)
    for c in range(nch):
        js = np.nonzero(occ[c])[0]
        out[c, 0] = len(js)
        out[c, 1 : 1 + len(js)] = js
    return out


def _threshold_f1(logits: np.ndarray, labels: np.ndarray) -> dict:
    """Micro/macro F1 with per-class mean-logit thresholds.

    The reference thresholds at 0 (``utils.py:44-47``); its float
    models emit signed logits. The quantized engines' logits are
    unsigned, so the equivalent decision boundary is the calibrated
    per-class mean (equivalent to a bias shift before the reference's
    0-threshold).
    """
    from qgtc_ppopp22_tpu.utils.metrics import multilabel_f1

    thr = logits.mean(axis=0, keepdims=True)
    centered = logits - thr
    return {
        "f1_micro": multilabel_f1(centered, labels, "micro"),
        "f1_macro": multilabel_f1(centered, labels, "macro"),
    }


def _batch_key(batch: ClusterBatch):
    """Content-derived cache key (``id()`` would dangle if batches
    were ever rebuilt between warmup and the timed run)."""
    return (
        batch.padded_nodes,
        batch.num_nodes,
        hash(batch.nodes.tobytes()),
    )


def _timed_epochs(
    one_epoch,
    n_epochs: int,
    n_batches: int,
    sync_every_epoch: bool,
    device_fn=None,
    device_args=None,
) -> EpochStats:
    """Reference timing semantics, made exact for a remote backend.

    The reference launches ALL epochs and synchronizes once
    (``main_qgtc.py:112-159``); on its local GPU the final
    ``cuda.synchronize`` costs microseconds, so total/n IS the
    per-epoch time. Here the one synchronize is a ~25-40 ms tunnel
    round-trip with ~±10 ms jitter — at millisecond epochs, total/n
    mostly reports RTT and its value changes with ``n_epochs``
    (observed: the same engine "measuring" 4.1 ms at n=10 and 0.9 ms
    at n=50). When the caller provides a jitted epoch function
    (``device_fn(*device_args)``), the headline ``epoch_ms`` is
    therefore measured with :func:`utils.timing.device_bench` — the
    epoch repeated in an on-device ``fori_loop`` with elision-proof
    serial dependence, marginal over two iteration counts — which is
    what a host-colocated deployment of this engine would observe.
    The literal launch-all-then-sync-once transcription is still run
    and reported as ``launch_sync_ms`` (RTT included, as measured).

    ``sync_every_epoch=True`` gives per-epoch walls (includes one
    dispatch round-trip per epoch)."""
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
    launch_sync = total / max(n_epochs, 1)
    if device_fn is not None and jax.default_backend() != "cpu":
        from qgtc_ppopp22_tpu.utils.timing import device_bench

        # perturb="slice": the epoch functions are pallas/scan
        # consumers (no algebraic shortcut), and the full-leaf
        # perturbation's O(epoch-bytes) harness traffic inflated
        # products-scale marginals by ~1 us/batch (the reference's
        # cudaEvent window carries no harness traffic either).
        # Fallback: the slice-DUS fusion can flip XLA's buffer
        # placement and stack a small bucket's pallas output in VMEM
        # past the scoped limit (observed: the bf16 baseline at
        # reddit's 7-batch tail bucket) — retry with the full-leaf
        # perturbation, whose fusion shape compiled everywhere.
        try:
            dev_ms = device_bench(
                device_fn, device_args, perturb="slice"
            ) * 1e3
        except Exception:
            dev_ms = device_bench(
                device_fn, device_args, perturb="full"
            ) * 1e3
        return EpochStats(
            epoch_ms=[dev_ms],
            n_batches=n_batches,
            launch_sync_ms=launch_sync,
        )
    return EpochStats(
        epoch_ms=[launch_sync],
        n_batches=n_batches,
        launch_sync_ms=launch_sync,
    )


def _sync(x) -> None:
    """Synchronize by fetching a value (block_until_ready does not
    drain the remote dispatch stream on this backend)."""
    if x is None:
        return
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[0]))
