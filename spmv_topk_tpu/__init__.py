"""tpu-topk-spmv: TPU-native approximate Top-K SpMV (JAX / Pallas).

Brand-new implementation of the capabilities of the DAC'21 FPGA design
AlbertoParravicini/approximate-spmv-topk (see SURVEY.md): packet-compressed
reduced-precision streaming Top-K SpMV over sparse embedding matrices,
row-sharded across TPU chips with a collective Top-K merge.
"""

from .config import (
    TopKSpMVConfig, ValueFormat, DEFAULT_CONFIG, F32, BF16, FIXED32, FIXED8,
    LANES,
)
from .api import TopKSpMV
from .ops.dense import DenseTopKSpMV
from .tune import autotune

__version__ = "0.1.0"
