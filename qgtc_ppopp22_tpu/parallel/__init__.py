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
