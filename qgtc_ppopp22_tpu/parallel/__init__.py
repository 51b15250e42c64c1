from qgtc_ppopp22_tpu.parallel.sharded import (
    dp_sp_epoch_step,
    make_mesh,
    shard_batches,
    sp_gcn_forward,
    sp_gcn_forward_ring,
    sp_gin_forward,
    sp_gin_forward_ring,
)
from qgtc_ppopp22_tpu.parallel.multihost import (
    host_batch_slice,
    initialize,
    pod_mesh,
)
from qgtc_ppopp22_tpu.parallel.packed import (
    dp_mega_epoch_packed,
    dp_sp_epoch_packed,
    shard_packed_batches,
)
from qgtc_ppopp22_tpu.parallel.engine import MeshEngine, x_digits_np
