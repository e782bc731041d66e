from . import gold, fixedpoint, xla_ref
from .kernel import topk_spmv_sell_device, finalize_topk
