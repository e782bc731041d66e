"""Autotuner: pick an engine configuration for a corpus + recall target.

The reference ships four pre-built FPGA variants (cores x MHz x bits,
test_spmv_topk.py:42-47) and the user picks one per workload; here the
codec/fold/rescore space is a trace-time config, so the library can pick
for you. `autotune` builds candidate engines on a row sample of the
corpus, measures per-query time and rescored precision against the exact
gold, and returns the fastest config meeting the precision target.

Off-TPU (tests, CPU sessions) pass measure=False: candidates are ranked
by the measured v5e constants (bench/capacity.py) instead of timed, and
precision is still verified by running the sample engines in interpret
mode — deterministic and hardware-free.

Usage:
    cfg, report = autotune(coo, k=100, target_precision=0.98)
    eng = TopKSpMV(coo, cfg)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from .api import TopKSpMV
from .config import LANES, TopKSpMVConfig
from .formats.coo import CooMatrix
from .formats.synthetic import create_sample_vector
from .ops.gold import topk_exact


def _candidates(k: int, max_cols: int, pool: int, expected_batch: int = 1):
    """Candidate configs, fastest-first by the measured v5e ladder
    (docs/TUNING.md §3: h16 159-181 > i4s 105-139 > i8s/f32 84-96).

    Layout depends on the workload: single-query headlines the octet
    transposed stream at quantum-2 (the measured sweet spot of padding
    vs bucket-branch count, experiments/octet_block_lab.py; +2.5% over
    quantum-1, 8x faster compiles than slice); batch serving
    (expected_batch >= 16) keeps
    the slice layout, whose multi-query kernel measured 2x the octet
    batch kernel's rate (237 vs 118 Gnnz/s/query at group 32 on the 10M
    corpus — the octet fori-over-octets body defeats Mosaic)."""
    h16_layout = (dict(fused_layout="slice", width_quantum=2)
                  if expected_batch >= 16
                  else dict(fused_layout="octet", width_quantum=2))
    alt_layout = (dict(fused_layout="octet", width_quantum=2)
                  if expected_batch >= 16
                  else dict(fused_layout="slice", width_quantum=2))
    cands = []
    if max_cols <= 1024:
        cands.append(dict(query_codec="h16", fold_tile=8, rescore_pool=pool,
                          **h16_layout))
        cands.append(dict(query_codec="h16", fold_tile=8, rescore_pool=pool,
                          **alt_layout))
        cands.append(dict(query_codec="h16", fold_tile=1, rescore_pool=pool,
                          **h16_layout))
    if max_cols <= 2048:
        cands.append(dict(query_codec="i4s", fold_tile=1, rescore_pool=pool,
                          fused_layout="slice", width_quantum=2))
    cands.append(dict(query_codec="i8s", fold_tile=1, rescore_pool=None,
                      fused_layout="slice", width_quantum=2))
    cands.append(dict(query_codec="f32", fold_tile=1, rescore_pool=None,
                      fused_layout="slice", width_quantum=2))
    return cands


def _sample(coo: CooMatrix, sample_rows: int) -> CooMatrix:
    if coo.num_rows <= sample_rows:
        return coo
    # contiguous prefix slice: cheap, and degree statistics are i.i.d.
    # across rows for embedding corpora (synthetic.py's generators are)
    return coo.row_slice(0, sample_rows)


def autotune(
    coo: CooMatrix,
    k: int = 100,
    *,
    target_precision: float = 0.98,
    sample_rows: int = 500_000,
    num_queries: int = 4,
    timing_reps: int = 5,
    measure: Optional[bool] = None,
    base: Optional[TopKSpMVConfig] = None,
    codecs: Optional[tuple] = None,
    expected_batch: int = 1,
    dense_hbm_budget_gb: float = 8.0,
    seed: int = 0,
    verbose: bool = False,
):
    """Pick the fastest TopKSpMVConfig meeting `target_precision` at `k`.

    Returns (config, report): report is one dict per candidate with its
    measured precision and (when measure) per-query milliseconds on the
    sample. measure=None auto-resolves to True on TPU backends.

    If the dense int8 form of the FULL corpus fits `dense_hbm_budget_gb`
    and `expected_batch` >= 16, the report's first entry recommends
    `DenseTopKSpMV` instead (docs/TUNING.md §1) — the sparse config is
    still returned for corpora that outgrow dense capacity.
    """
    import jax

    if measure is None:
        measure = jax.default_backend() == "tpu"
    max_cols = -(-coo.num_cols // LANES) * LANES
    pool = max(4 * k, 100)
    sample = _sample(coo, sample_rows)
    queries = [create_sample_vector(coo.num_cols, seed=seed + i)
               for i in range(num_queries)]
    golds = [topk_exact(sample, q, k) for q in queries]

    report = []
    dense_gb = coo.num_rows * max_cols / 1e9
    if expected_batch >= 16 and dense_gb <= dense_hbm_budget_gb:
        report.append(dict(
            engine="DenseTopKSpMV", dense_int8_gb=round(dense_gb, 2),
            note=f"dense int8 fits ({dense_gb:.1f} GB) and batch >= 16: "
                 "the MXU sweep is ~3x the sparse batch rate "
                 "(docs/TUNING.md §1) — prefer ops.dense.DenseTopKSpMV"))

    # capacity.py's measured ladder for the measure=False ranking
    from .bench.capacity import MEASURED

    cands = _candidates(k, max_cols, pool, expected_batch)
    if codecs is not None:  # restrict the search (faster off-TPU tuning)
        cands = [c for c in cands if c["query_codec"] in codecs]

    best = None
    for cand in cands:
        overrides = dict(cand, k=k, max_cols=max_cols)
        cfg = (dataclasses.replace(base, **overrides) if base
               else TopKSpMVConfig(**overrides))
        entry = dict(codec=cfg.query_codec, fold_tile=cfg.fold_tile,
                     rescore_pool=cfg.rescore_pool,
                     fused_layout=cfg.fused_layout,
                     width_quantum=cfg.width_quantum)
        try:
            eng = TopKSpMV(sample, cfg)
        except Exception as e:  # e.g. codec/geometry constraint
            entry["error"] = str(e)
            report.append(entry)
            continue

        precs = []
        for q, (gi, _) in zip(queries, golds):
            idx, _ = eng.query(q, k)
            precs.append(len(set(np.asarray(idx).tolist())
                              & set(gi.tolist())) / k)
        entry["precision"] = float(np.mean(precs))

        if measure:
            # chained on-device queries, slope-timed: a single dispatch is
            # dominated by host/tunnel latency (~40 ms here), which would
            # swamp sub-ms kernels and mis-rank codecs
            import jax
            import jax.numpy as jnp

            from .utils.profiling import timed_slope

            tabs8 = jnp.stack([eng._table(queries[i % num_queries])[0]
                               for i in range(8)])

            @jax.jit
            def run(tabs):
                def step(c, tab):
                    tv, tt = eng.candidates_traceable(tab)
                    return c, (tv.max(), tt.max())

                return jax.lax.scan(step, 0, tabs)[1]

            def run_n(n):
                t = jnp.concatenate([tabs8] * (-(-n // 8)))[:n]
                return np.asarray(run(t)[0])

            sweep_s = timed_slope(run_n, 4, 104, reps=timing_reps)
            entry["per_query_ms"] = round(sweep_s * 1e3, 4)
            entry["rank_key"] = entry["per_query_ms"]
        else:
            m = MEASURED.get(cfg.query_codec,
                             dict(gnnz_core=90.0))  # f32 ~ i8s rate
            # rank by the measured ladder; fold_tile=1 costs ~4.6%.
            # Octet vs slice single-query is parity on the 10M corpus
            # (168.9 vs 168.4 — BENCH r5) with lower padding, so the
            # layouts are not re-ranked here; _candidates orders them
            # by workload.
            rate = m["gnnz_core"] * (1.0 if cfg.fold_tile > 1 else 0.954)
            entry["rank_key"] = round(1e3 / rate, 4)
            entry["ranked_by"] = "measured v5e ladder (measure=False)"

        entry["meets_target"] = entry["precision"] >= target_precision
        report.append(entry)
        if entry["meets_target"] and (
                best is None or entry["rank_key"] < best[0]["rank_key"]):
            best = (entry, cfg)
        if verbose:
            print(entry)

    if best is None:
        # nothing met the bar: fall back to exact f32 (always 1.0 up to
        # bf16 storage noise) and say so in the report
        cfg = TopKSpMVConfig(k=k, max_cols=max_cols, width_quantum=2)
        report.append(dict(codec="f32", note="fallback: no candidate met "
                           f"target_precision={target_precision}"))
        return cfg, report
    return best[1], report
