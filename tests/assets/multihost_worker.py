"""Two-process jax.distributed worker (driven by test_parallel.py).

Validates the dp/sp-sharded quantized forward across REAL process
boundaries (the multi-host execution model, simulated on CPU devices):
each process owns 4 local devices of an 8-device mesh, cluster batches
shard over dp spanning processes, rows over sp, and the gathered
result must equal the single-device forward bit-for-bit.
"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
import jax
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid)
import numpy as np, jax.numpy as jnp
sys.path.insert(0, '/root/repo')
from qgtc_ppopp22_tpu.ops.digits import digit_pack
from qgtc_ppopp22_tpu.parallel import pod_mesh, host_batch_slice
from qgtc_ppopp22_tpu.parallel.sharded import dp_sp_epoch_step, shard_batches
from qgtc_ppopp22_tpu.models.qmodels import qgcn_forward

print(f"p{pid}: devices={jax.device_count()} local={jax.local_device_count()}", flush=True)
rng = np.random.default_rng(0)
bits, n, d = 2, 1024, 128
qa = (rng.random((n, n)) < 0.01).astype(np.int32)
qx = rng.integers(0, 4, (n, d)).astype(np.int32)
qws = [rng.integers(0, 4, (d, 128)).astype(np.int32) for _ in range(3)]
a = digit_pack(jnp.asarray(qa), 1); x = digit_pack(jnp.asarray(qx), bits)
ws = [digit_pack(jnp.asarray(w), bits) for w in qws]
mesh = pod_mesh(sp_per_host=4)
B = 4
a_stack = np.stack([np.asarray(a.digits)] * B)
x_stack = np.stack([np.asarray(x.digits)] * B)
with mesh:
    a_sh, x_sh = shard_batches(mesh, a_stack, x_stack)
    out = dp_sp_epoch_step(mesh, a_sh, x_sh, ws, bits, a_bits=1, x_bits=bits)
    out_local = np.asarray(jax.experimental.multihost_utils.process_allgather(out, tiled=True))
ref = np.asarray(qgcn_forward(a, x, ws, out_bits=bits))
ok = out_local.shape[0] == B and all(np.array_equal(out_local[i], ref[:n,:128]) for i in range(B))
print(f"p{pid}: MULTIHOST-{'OK' if ok else 'FAIL'} out={out_local.shape}", flush=True)
