"""Padding decomposition of the h16 fused stream (round 4).

Breaks the measured 0.551 words/nnz (BENCH_r03, 10M-row gamma deg-20,
quantum-2 @ 1024-sublane blocks) into its sources, from the corpus degree
profile. The h16 floor is 0.5 words/nnz (2 nnz per 32-bit word).

Measured decomposition at 10M rows (this script's output, recorded
2026-08-20; seed-1 gamma(k=3, theta=20/3) degrees):

    word floor (odd-degree rows)   0.5128   <- irreducible: a row with odd
                                              degree leaves its last word
                                              half empty (halves must
                                              belong to the same row)
    + slice max over 128 lanes     0.5129   <- sigma-sort is ~perfect
    + quantum-2 ladder             0.5387   <- width quantization: the
                                              BIGGEST reducible term
    + promotion (1% merge budget)  0.5430
    + block geometry @1024         0.5512   <- in-block remainder 0.0028,
                                              last-block tails 0.0054
    = bench-measured padding_ratio 0.551 (matches BENCH_r03.json)

    quantum-1 ladder (odd widths)  0.5130 after ladder
    + promotion 0.5%               0.5155  (31 buckets)
    + block geometry @1024         0.5283  <- the round-4 shipped config

So quantum-1 recovers ~60% of the reducible waste (0.551 -> 0.528,
projected +4.3% batch and single-query throughput at equal VPU cost).
The kernel's generic gcd-period fold already handles odd widths: Ps =
8/gcd(W,8) = 8 slices per period, every boundary chunk split by static
sublane slices; the strided tile fold gets one sub-tile buffer per
period slice (8 x fold_tile <= 64 scratch rows).

Costs: ~2x compiled bucket branches (15 -> ~31; one-time with the
persistent compilation cache) and a denser unroll (~120 chunk decodes
per block either way — bounded by the same <=128 threshold).

Run: python experiments/padding_lab.py [rows]
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from spmv_topk_tpu.config import LANES
from spmv_topk_tpu.formats.sell_buckets import _quantize_w

GAMMA_K = 3


def decompose(num_rows=10_000_000, avg=20, quantum=2, budget_frac=0.01,
              tgt=1024, seed=1):
    rng = np.random.default_rng(seed)
    deg = np.maximum(rng.gamma(GAMMA_K, avg / GAMMA_K, num_rows)
                     .astype(np.int64), 1)
    deg = np.minimum(deg, 1024)
    nnz = deg.sum()
    halfnnz = nnz / 2
    wdeg = -(-deg // 2)

    def wpn(subl):  # words per nnz
        return subl * LANES / halfnnz * 0.5

    out = {"word_floor": wdeg.sum() / halfnnz * 0.5}
    perm = np.argsort(-wdeg, kind="stable")
    ns = -(-num_rows // LANES)
    wp = np.concatenate([wdeg[perm],
                         np.zeros(ns * LANES - num_rows, np.int64)])
    sw = wp.reshape(ns, LANES).max(axis=1)
    out["slice_max"] = wpn(sw.sum())

    swq = np.array([_quantize_w(int(w), quantum)
                    for w in np.maximum(-(-sw // quantum) * quantum,
                                        quantum)], np.int64)
    out["ladder"] = wpn(swq.sum())

    budget = max(16, int(swq.sum() * budget_frac))
    sw2 = swq.copy()
    i, cur, n = 0, None, len(sw2)
    while i < n:
        j = i
        w = int(sw2[i])
        while j < n and sw2[j] == w:
            j += 1
        cost = (j - i) * (cur - w) if cur is not None else None
        if cost is not None and cost <= budget:
            sw2[i:j] = cur
            budget -= cost
        else:
            cur = w
        i = j
    out["promoted"] = wpn(sw2.sum())

    tot = rem = tails = 0
    i = buckets = 0
    while i < n:
        j = i
        w = int(sw2[i])
        while j < n and sw2[j] == w:
            j += 1
        nsl = j - i
        buckets += 1
        if w <= tgt:
            spb = tgt // w
            nb = -(-nsl // spb)
            tot += nb * tgt
            rem += nb * (tgt - spb * w)
            tails += (nb * spb - nsl) * w
        else:
            bps = -(-w // tgt)
            tot += nsl * bps * tgt
            rem += nsl * (bps * tgt - w)
        i = j
    out["stream"] = wpn(tot)
    out["block_remainder"] = wpn(rem)
    out["block_tails"] = wpn(tails)
    out["buckets"] = buckets
    return out


if __name__ == "__main__":
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    for quantum, frac in ((2, 0.01), (1, 0.01), (1, 0.005)):
        d = decompose(rows, quantum=quantum, budget_frac=frac)
        print(f"quantum={quantum} budget={frac:.3%}: "
              + " ".join(f"{k}={v:.4f}" if isinstance(v, float)
                         else f"{k}={v}" for k, v in d.items()))
