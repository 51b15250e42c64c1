from qgtc_ppopp22_tpu.graph.csr import CSRGraph, from_edges
from qgtc_ppopp22_tpu.graph.datasets import (
    DATASET_STATS,
    GraphDataset,
    load_dataset,
    load_npz,
    synthesize,
)
from qgtc_ppopp22_tpu.graph.partition import (
    edge_cut_fraction,
    get_partition_list,
)
from qgtc_ppopp22_tpu.graph.batching import (
    ClusterBatch,
    ClusterBatcher,
    batch_labels,
)
