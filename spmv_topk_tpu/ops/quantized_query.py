"""Query-vector quantization codecs.

The reference reduces *matrix* precision at synthesis time (20/26/32-bit
fixed, types.hpp:20-27); the TPU engine can additionally reduce *query*
precision at runtime: the int8x4 codec packs 4 biased-uint8 entries per
int32 table word, so one 128-lane gather row covers 512 columns and
C=1024 needs 2 gather passes instead of 8 (~1.8x kernel speedup) at an
accuracy cost comparable to the reference's 20-bit fixed builds.
"""

from __future__ import annotations

import numpy as np

from ..config import LANES


def pack_query_int8(vec_padded: np.ndarray):
    """(C,)-padded f32 query -> ((ceil(C/512), 128) int32 table, scale).

    Symmetric quantization q = round(x / scale) in [-127, 127], stored
    biased (q + 128) so the kernel extracts unsigned bytes. Scores computed
    with the quantized table are exactly `true_score_q / scale`.
    """
    C = len(vec_padded)
    scale = float(np.max(np.abs(vec_padded))) / 127.0
    if scale == 0.0:
        scale = 1.0
    q = np.clip(np.round(vec_padded / scale), -127, 127).astype(np.int64) + 128
    n_rows = -(-C // (4 * LANES))
    q = np.pad(q, (0, n_rows * 4 * LANES - C)).reshape(n_rows, 4, LANES)
    table = (
        q[:, 0] | (q[:, 1] << 8) | (q[:, 2] << 16) | (q[:, 3] << 24)
    ).astype(np.uint32).view(np.int32)
    return table, scale


def dequantize_query_int8(table: np.ndarray, scale: float, num_cols: int):
    """Inverse of pack_query_int8 (tests)."""
    t = table.view(np.uint32)
    parts = [(t >> (8 * b)) & 0xFF for b in range(4)]
    q = np.stack(parts, axis=1).reshape(-1)[:num_cols]
    return (q.astype(np.int64) - 128) * scale
