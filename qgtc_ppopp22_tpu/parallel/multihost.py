"""Multi-host bring-up helpers (ICI + DCN meshes).

The reference has no distributed execution (SURVEY §2.3). On TPU pods
the single-host code in :mod:`qgtc_ppopp22_tpu.parallel.sharded` runs
unchanged across hosts: `shard_map` collectives ride ICI within a
slice and DCN across slices; only process bring-up differs. This
module wraps that bring-up.

Deployment recipe (N hosts of one pod slice):

1. every host runs the same program; call :func:`initialize` first
   (JAX discovers the pod topology; pass coordinator details only for
   CPU simulation or non-TPU fabrics),
2. build the mesh with :func:`pod_mesh` — ``dp`` spans hosts (cluster
   batches are independent; the only cross-host traffic is the
   initial shard placement), ``sp`` stays within a host's chips so
   each aggregation's hidden all-gather rides ICI, never DCN,
3. each host stages its own shard of cluster batches
   (`ClusterBatcher` partitions are host-assignable round-robin) and
   calls the same jitted step.

Scaling expectation — an ARITHMETIC MODEL, not a measurement (one
chip is available in this environment, so multi-host speed is
unmeasurable): dp-over-hosts is communication-free at steady state,
so epoch-time scaling is bounded by batch-count imbalance (75 batches
over N hosts), not bandwidth — under that model the BASELINE target
of >=80% efficiency at 2 hosts corresponds to a ceil(75/2)/75*2 =
98.7% arithmetic bound. What IS measured: bit-exact 2-process
execution (tests/test_parallel.py) and the per-process epoch-wall
throughput structure (benchmarks/multihost_structure.py ->
results/multihost_walls.csv).
"""

from __future__ import annotations

from typing import Optional

import jax

from qgtc_ppopp22_tpu.parallel.sharded import make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """``jax.distributed.initialize`` wrapper; no-op when single-process.

    On TPU pods all arguments are auto-discovered from the metadata
    server; pass them explicitly only for CPU/GPU fabrics or tests.
    """
    if num_processes is not None and num_processes <= 1:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def pod_mesh(sp_per_host: Optional[int] = None):
    """(dp, sp) mesh over all processes' devices.

    ``sp`` defaults to the local device count so the sp all-gathers
    stay on ICI; ``dp`` takes the remaining (cross-host) factor.
    """
    n = jax.device_count()
    sp = sp_per_host or jax.local_device_count()
    while n % sp:
        sp //= 2
    sp = max(sp, 1)
    return make_mesh(dp=n // sp, sp=sp)


def host_batch_slice(n_batches: int) -> slice:
    """This host's round-robin share of the epoch's cluster batches."""
    p = jax.process_index()
    np_ = jax.process_count()
    per = -(-n_batches // np_)
    return slice(p * per, min((p + 1) * per, n_batches))
