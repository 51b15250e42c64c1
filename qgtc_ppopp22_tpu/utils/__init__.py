from qgtc_ppopp22_tpu.utils.timing import device_bench, host_bench
from qgtc_ppopp22_tpu.utils.metrics import (
    Logger,
    f1_score,
    multilabel_f1,
    write_csv,
    write_json_line,
)
