"""Search an MTX embedding matrix from the command line.

  python examples/mtx_search.py matrix.mtx [k]
"""

import sys

import os
import sys

import numpy as np

# editable-install fallback: lets the example run from a plain git
# checkout; `pip install -e .` (pyproject.toml) makes this a no-op
if __package__ is None:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import spmv_topk_tpu as st
from spmv_topk_tpu.formats import read_mtx, create_sample_vector

path = sys.argv[1]
k = int(sys.argv[2]) if len(sys.argv) > 2 else 20

corpus = read_mtx(path)
print(f"{corpus.num_rows} x {corpus.num_cols}, {corpus.nnz} nnz")
engine = st.TopKSpMV(corpus, st.TopKSpMVConfig(k=k))
q = create_sample_vector(corpus.num_cols, seed=0)
idx, vals = engine.query(q)
for r, v in zip(np.asarray(idx), np.asarray(vals)):
    print(f"row {r:10d}  score {v:.6f}")
