#!/usr/bin/env python
"""Headline benchmark: fused Top-K SpMV throughput on one TPU chip.

Workload: synthetic 10M x 1024 gamma-sparsity embedding matrix (~195M
nnz, L2-normalized rows), quantized values, K=100 with lane_k=8, single
chip — the SAME nnz scale as the reference's 2x10^8-nnz single-card
headline (plot_roofline.py:201-209; best published number: 76.9 GNNZ/s
at 20-bit on 32 cores @ 225 MHz).

Headline config (autotune's pick for this corpus, docs/TUNING.md):
octet (slice-transposed) fused layout at width_quantum=2 — the kernel
body is pure `acc += decode(chunk)` with no sublane folds or boundary
splits; quantum-2 is the measured sweet spot of the padding-vs-
bucket-branch-count tradeoff (octet_block_lab.py) — with the h16 codec
(TWO nnz per 32-bit word) and exact host rescoring of the top-400
pool. The reference likewise headlines its best shipped build (20-bit
B=15, plot_roofline.py:362-364).

Timing protocol: the per-query kernel is iterated over a stream of
distinct queries inside one jitted lax.scan; throughput is taken from the
slope between a short and a long stream so dispatch/tunnel overhead
cancels (wall-clock of a single dispatch is meaningless through the axon
tunnel). Each measurement is forced with np.asarray.

Timeout-proofing (the round-4 lesson — BENCH_r04 timed out with zero
output): the PRIMARY headline JSON line is printed and flushed the
moment the single-query slope exists; the batch/dense sections only ever
APPEND a second, superset JSON line. Cold-start costs are cached on
disk: the corpus in .bench_cache/*.npz and the packed engine via
TopKSpMV.save()/load(), so a warm run reaches first measurement in well
under two minutes (plus the .jax_cache executable cache for compiles).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from spmv_topk_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

from spmv_topk_tpu.api import TopKSpMV
from spmv_topk_tpu.config import LANES, TopKSpMVConfig
from spmv_topk_tpu.formats import create_sparse_matrix, create_query_batch
from spmv_topk_tpu.formats.coo import CooMatrix

BASELINE_GNNZ = 76.9  # FPGA 32 cores, 20-bit fixed (BASELINE.md)

# headline corpus (the reference benchmark shape at 10x the rows);
# override for smoke runs: SPMV_BENCH_ROWS=300000 python bench.py
NUM_ROWS = int(os.environ.get("SPMV_BENCH_ROWS", 10_000_000))
NUM_COLS = int(os.environ.get("SPMV_BENCH_COLS", 1024))
AVG_DEG = 20
K = 100
# octet streams whole chunks at ANY width, so its quantum only moves the
# padding-vs-branch-count tradeoff: q2 (15 buckets, 0.576 words/nnz) beat
# q1 (28 buckets, 0.559) by ~2.5% and q4/q8 lose to padding —
# experiments/octet_block_lab.py ladder on this corpus. 2048+-sublane DMA
# blocks collapse the pipeline (11 Gnnz/s) — keep 1024.
# SPMV_BENCH_LAYOUT=slice reproduces the round-3 slice headline for A/B.
LAYOUT = os.environ.get("SPMV_BENCH_LAYOUT", "octet")
CACHE_DIR = os.environ.get("SPMV_BENCH_CACHE",
                           os.path.join(os.path.dirname(
                               os.path.abspath(__file__)), ".bench_cache"))


def _corpus() -> tuple[CooMatrix, float, bool]:
    """Headline corpus, disk-cached: (coo, seconds, was_cached)."""
    key = f"corpus_{NUM_ROWS}_{NUM_COLS}_{AVG_DEG}_gamma_s1.npz"
    path = os.path.join(CACHE_DIR, key)
    t0 = time.time()
    if os.path.exists(path):
        z = np.load(path)
        coo = CooMatrix(z["rows"], z["cols"], z["vals"],
                        int(z["dims"][0]), int(z["dims"][1]))
        coo._sorted = True  # generated row-major; invariant of the cache
        return coo, time.time() - t0, True
    coo = create_sparse_matrix(NUM_ROWS, NUM_COLS, AVG_DEG, "gamma", seed=1)
    os.makedirs(CACHE_DIR, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:  # uncompressed: load speed is the point
        np.savez(fh, rows=coo.rows, cols=coo.cols, vals=coo.vals,
                 dims=np.array([coo.num_rows, coo.num_cols], np.int64))
    os.replace(tmp, path)
    return coo, time.time() - t0, False


def _engine(coo: CooMatrix, cfg: TopKSpMVConfig):
    """Packed engine, disk-cached via save()/load: (eng, secs, cached)."""
    tag = (f"eng_{NUM_ROWS}_{NUM_COLS}_{AVG_DEG}_{cfg.fused_layout}"
           f"_q{cfg.width_quantum}_{cfg.query_codec}_f{cfg.fold_tile}"
           f"_b{cfg.fused_block_sublanes}_r{cfg.rescore_pool}_v4.npz")
    path = os.path.join(CACHE_DIR, tag)
    t0 = time.time()
    if os.path.exists(path):
        try:
            eng = TopKSpMV.load(path, matrix=coo)
            return eng, time.time() - t0, True
        except Exception as e:  # stale snapshot format: repack
            print(f"engine snapshot reload failed ({e!r}); repacking",
                  file=sys.stderr)
    eng = TopKSpMV(coo, cfg)
    try:
        os.makedirs(CACHE_DIR, exist_ok=True)
        tmp = path + ".tmp"
        eng.save(tmp)
        os.replace(tmp, path)
    except Exception as e:  # disk-full etc. must not kill the bench
        print(f"engine snapshot save skipped: {e!r}", file=sys.stderr)
    return eng, time.time() - t0, False


def main():
    t_start = time.time()
    time_budget_s = float(os.environ.get("SPMV_BENCH_BUDGET_S", "2100"))
    coo, gen_s, corpus_cached = _corpus()
    cfg = TopKSpMVConfig(k=K, lane_k=8, num_partitions=1, max_cols=NUM_COLS,
                         query_codec="h16",
                         fused_layout=LAYOUT,
                         width_quantum=2,
                         fused_block_sublanes=1024, fold_tile=8,
                         rescore_pool=400)
    eng, pack_s, eng_cached = _engine(coo, cfg)

    from spmv_topk_tpu.ops.kernel import (
        topk_spmv_fused_batch_device,
        topk_spmv_fused_device, topk_spmv_fused_octet_device)

    octet = cfg.fused_layout == "octet"
    dev_fn = topk_spmv_fused_octet_device if octet else topk_spmv_fused_device

    def stream_fn(n_queries: int):
        # matrix arrays are explicit jit arguments: closed-over device
        # arrays are inlined into the remote-compile request through the
        # axon tunnel (breaks at GB scale, bloats every compile before)
        tables = jnp.stack([
            eng._table(q)[0]
            for q in create_query_batch(n_queries, NUM_COLS, seed=2)
        ])

        @jax.jit
        def run(words, nreal, tabs):
            def step(carry, tab):
                topv, topt = dev_fn(
                    words, tab, nreal, cfg=cfg, plan=eng.fused.plan,
                    block_sublanes=eng.fused.block_sublanes,
                    num_blocks=eng.fused.num_blocks,
                    codec=cfg.query_codec)
                return carry, (topv.max(), topt.max())
            _, outs = jax.lax.scan(step, 0, tabs)
            return outs

        return lambda: np.asarray(run(eng._fwords, eng._fnreal, tables)[0])

    # Same-process HBM stream floor on the SAME words array: the chip's
    # deliverable bandwidth varies with tenancy (measured 480-870 GB/s on
    # this v5e across hours of the same day), so pct_of_stream_floor is
    # the chip-state-independent kernel-quality score (the reference's
    # roofline normalization, plot_roofline.py:197-209). Floor and kernel
    # slopes are measured INTERLEAVED so their ratio cancels contention
    # drift.
    from spmv_topk_tpu.ops.streamprobe import stream_words_device

    def floor_fn(n_iters: int):
        salts = jnp.arange(n_iters * LANES, dtype=jnp.int32).reshape(
            n_iters, 1, LANES)

        @jax.jit
        def go(words, salts):
            def step(c, s):
                out = stream_words_device(
                    words, s, block_sublanes=eng.fused.block_sublanes,
                    num_blocks=eng.fused.num_blocks)
                return c, out.max()
            _, outs = jax.lax.scan(step, 0, salts)
            return outs

        return lambda: np.asarray(go(eng._fwords, salts))

    # long streams ~35 ms of device time: the tunnel's wall-clock jitter
    # is O(10-100 ms), so slope signal must dominate it (a 104-iteration
    # stream measured IQR up to 70% under heavy contention)
    short, long_ = stream_fn(4), stream_fn(304)
    fs, fl = floor_fn(4), floor_fn(304)
    t_compile = time.time()
    short(); long_(); fs(); fl()  # compile + warm
    compile_s = time.time() - t_compile

    # Interleaved slope pairs: chip/tunnel contention drifts over minutes,
    # so each slope uses adjacent short/long runs; median rejects
    # outliers. Reproducibility guard: when the inter-rep spread exceeds
    # 10% of the median, keep adding rounds (the tunnel was congested) up
    # to a cap, and report every rep so a divergent headline run is
    # diagnosable from the JSON alone.

    def rep():
        k = (_timed(long_) - _timed(short)) / 300.0
        f = (_timed(fl) - _timed(fs)) / 300.0
        return k, f

    reps = [rep() for _ in range(7)]
    for _ in range(3):
        s = np.sort([k for k, _ in reps])
        med = float(np.median(s))
        iqr = float(s[(3 * len(s)) // 4] - s[len(s) // 4])
        if iqr <= 0.10 * med or time.time() - t_start > time_budget_s * 0.6:
            break
        reps += [rep() for _ in range(6)]
    slopes = [k for k, _ in reps]
    per_query = float(np.median(slopes))
    slope_spread = float(np.sort(slopes)[(3 * len(slopes)) // 4]
                         - np.sort(slopes)[len(slopes) // 4]) / per_query
    # per-rep kernel/floor ratio: contention hits adjacent measurements
    # alike, so the median ratio survives chip-state drift
    per_sweep_floor = float(np.median([f for _, f in reps]))
    pct_of_floor = float(np.median([f / k for k, f in reps])) * 100.0
    stream_floor_gbps = eng.hbm_bytes / per_sweep_floor / 1e9

    gnnz = coo.nnz / per_query / 1e9
    hbm_gbps = eng.hbm_bytes / per_query / 1e9

    # correctness spot check (differential oracle, reference protocol) —
    # exact gold straight off the engine's host CSR (already built for
    # the rescore stage; avoids a second 2+ GB scipy conversion)
    q = create_query_batch(1, NUM_COLS, seed=3)[0]
    gold_scores = eng._scipy_csr @ q
    gpart = np.argpartition(-gold_scores, K - 1)[:K]
    gi = gpart[np.argsort(-gold_scores[gpart], kind="stable")]
    ki, _ = map(np.asarray, eng.query(q))          # rescored (production)
    pool_i = np.asarray(eng.query(q, k=cfg.rescore_pool, rescore_pool=0)[0])
    rescore_ms = min(  # host-side cost of re-ranking the pool (warm)
        _timed(lambda: eng._rescore(pool_i, q, K)) for _ in range(10)
    ) * 1e3
    raw_i, _ = map(np.asarray, eng.query(q, rescore_pool=0))
    precision = len(set(gi.tolist()) & set(ki.tolist())) / K
    precision_raw = len(set(gi.tolist()) & set(raw_i.tolist())) / K

    result = {
        "metric": "topk_spmv_nnz_throughput",
        "value": round(gnnz, 2),
        "unit": "Gnnz/s",
        "vs_baseline": round(gnnz / BASELINE_GNNZ, 3),
        "fused_layout": cfg.fused_layout,
        "per_query_ms": round(per_query * 1e3, 3),
        "hbm_gbps": round(hbm_gbps, 1),
        "stream_floor_gbps": round(stream_floor_gbps, 1),
        "pct_of_stream_floor": round(pct_of_floor, 1),
        # the binding ceiling for single-query h16 is the VPU decode
        # envelope (~17-19 vector ops per 2048-nnz chunk at ~2 ops/cycle
        # ~= 226 Gnnz/s for the slice layout; the octet body sheds the
        # fold/split ops — counted and lab-measured in ROOFLINE.md §2),
        # not the DMA roofline; report both scores
        "vpu_envelope_gnnz": 226.0,
        "pct_of_vpu_envelope": round(gnnz / 226.0 * 100, 1),
        "precision_at_100": precision,
        "precision_raw_h16": precision_raw,
        "rescore_host_ms": round(rescore_ms, 3),
        "per_query_e2e_ms": round(per_query * 1e3 + rescore_ms, 3),
        "nnz": coo.nnz,
        "padding_ratio": round(eng.fused.padding_ratio, 3),
        "corpus_seconds": round(gen_s, 1),
        "corpus_cached": corpus_cached,
        "pack_seconds": round(pack_s, 1),
        "engine_cached": eng_cached,
        "compile_seconds": round(compile_s, 1),
        "slope_reps_ms": [round(s * 1e3, 3) for s in slopes],
        "slope_iqr_pct": round(slope_spread * 100, 1),
        "backend": jax.default_backend(),
    }
    # PRIMARY line out the door before any tertiary work can time out.
    print(json.dumps(result), flush=True)
    _write_latest(result)

    # ---- tertiary sections: batch sparse + dense MXU ------------------
    # Each is fenced (budget + exception) so it can only ever ADD fields;
    # the final line is a superset of the primary line.

    # secondary: grouped multi-query kernel (the serving batch path) —
    # each matrix block is decoded once for the whole group. The batch
    # engine is the SLICE layout even when the headline is octet: the
    # octet batch kernel's fori-over-octets body with dynamic VMEM
    # offsets defeats Mosaic (measured 118 vs 237 Gnnz/s per query at
    # group 32 on this corpus, and pathological compile times) — see
    # ROOFLINE.md §"octet batch". Trace-time configs make running two
    # variants free, like the reference's per-workload build points
    # (test_spmv_topk.py:42-47).
    if LAYOUT == "slice":
        beng, bcfg = eng, cfg
        batch_pack_s, batch_cached = 0.0, True
    else:
        bcfg = TopKSpMVConfig(
            k=K, lane_k=8, num_partitions=1, max_cols=NUM_COLS,
            query_codec="h16", fused_layout="slice", width_quantum=2,
            fused_block_sublanes=1024, fold_tile=8, rescore_pool=400)
        beng, batch_pack_s, batch_cached = _engine(coo, bcfg)

    def batch_fn(n_groups: int, Q: int):
        qs = create_query_batch(Q * n_groups, NUM_COLS, seed=4)
        groups = jnp.stack([
            jnp.stack([beng._table(q)[0] for q in qs[i * Q:(i + 1) * Q]])
            for i in range(n_groups)
        ])

        @jax.jit
        def go(words, nreal, gs):
            def step(c, g):
                tv, _ = topk_spmv_fused_batch_device(
                    words, g, nreal, cfg=bcfg,
                    plan=beng.fused.plan,
                    block_sublanes=beng.fused.block_sublanes,
                    num_blocks=beng.fused.num_blocks,
                    codec=bcfg.query_codec)
                return c, tv.max()
            _, outs = jax.lax.scan(step, 0, gs)
            return outs

        return lambda: np.asarray(go(beng._fwords, beng._fnreal, groups))

    # group 32: the measured sweet spot of the sparse batch path on this
    # corpus (201 / 236.8 / 258.5 Gnnz/s per query at groups 16 / 32 / 64
    # — experiments/batch_lab.py + round-3 A/B jobs); 64 only adds ~9%
    # for 2x the compile and group latency.
    QB = 32
    per_query_batch = None
    batch_e2e = None
    batch_e2e_raw = None
    try:
        if time.time() - t_start < time_budget_s:
            bs, bl = batch_fn(2, QB), batch_fn(12, QB)
            bs(); bl()
            bslopes = sorted((_timed(bl) - _timed(bs)) / 10.0 / QB
                             for _ in range(3))
            per_query_batch = bslopes[len(bslopes) // 2]
            # e2e batch serving incl. the THREADED host rescore
            # (api.query_batch overlaps group g's rescore with group
            # g+1's sweep). Compare against the same wall protocol with
            # rescore off: the difference is the rescore overhead (the
            # wall numbers themselves include per-group tunnel dispatch,
            # which the slope numbers above cancel — compare e2e vs
            # e2e_raw, not e2e vs slope).
            qs = create_query_batch(QB * 8, NUM_COLS, seed=6)
            beng.query_batch(qs[:QB], group_size=QB)             # warm
            beng.query_batch(qs[:QB], group_size=QB, rescore_pool=0)
            # force results inside the timed lambda: query_batch returns
            # async jax arrays, and an unforced raw path times only the
            # dispatch (the round-5 cold run reported a bogus 1942%
            # rescore overhead this way)
            batch_e2e = min(_timed(
                lambda: np.asarray(
                    beng.query_batch(qs, group_size=QB)[1]))
                for _ in range(3)) / len(qs)
            batch_e2e_raw = min(_timed(
                lambda: np.asarray(
                    beng.query_batch(qs, group_size=QB,
                                    rescore_pool=0)[1]))
                for _ in range(3)) / len(qs)
    except Exception as e:  # pragma: no cover - hardware-path guard
        print(f"batch section skipped: {e!r}", file=sys.stderr)

    result.update({
        "batch_engine_layout": bcfg.fused_layout,
        "batch_pack_seconds": round(batch_pack_s, 1),
        "batch_engine_cached": batch_cached,
        "batch32_gnnz_per_query": (
            round(coo.nnz / per_query_batch / 1e9, 2)
            if per_query_batch else None),
        "batch32_ms_per_query": (
            round(per_query_batch * 1e3, 3) if per_query_batch else None),
        "batch32_e2e_ms_per_query": (
            round(batch_e2e * 1e3, 3) if batch_e2e else None),
        "batch32_rescore_overhead_pct": (
            round((batch_e2e / batch_e2e_raw - 1) * 100, 1)
            if batch_e2e and batch_e2e_raw else None),
    })
    _write_latest(result)

    # tertiary: dense-MXU engine (matmul sweep + approx_max_k) — the
    # high-throughput serving mode when the dense form fits HBM. At this
    # corpus scale the bf16 form does not fit (10M x 1024 x 2 = 20.7 GB >
    # 16 GB v5e HBM) but the int8 per-row-scale form does (10.3 GB): the
    # MXU sweeps it at the same block cadence as bf16 (measured: the
    # (131072, 1024) block matmul takes ~0.6 ms for int8 OR bf16 at any
    # batch 64-512 — element-cadence-bound, not byte-bound), so int8
    # doubles the corpus the dense engine serves at zero speed cost.
    from spmv_topk_tpu.ops.dense import (DenseTopKSpMV, dense_topk_batch,
                                         quantize_queries_int8)

    per_query_dense = None
    per_query_dense256 = None
    precision_dense = None
    dense_dtype = None
    QD = 64
    # raw dense mode (no rescore) so the reported dense precision
    # matches the timed kernel path
    deng = None
    if time.time() - t_start < time_budget_s:
        for dt in ("bf16", "int8"):
            try:
                deng = DenseTopKSpMV(coo,
                                     TopKSpMVConfig(k=K, max_cols=NUM_COLS),
                                     hbm_budget_bytes=12 << 30, dtype=dt)
                dense_dtype = dt
                break
            except ValueError:
                continue
    else:
        print("dense section skipped: over time budget", file=sys.stderr)

    if deng is not None:
        def dense_fn(n_groups: int, Q: int):
            qf = [np.asarray(create_query_batch(Q, NUM_COLS, seed=5 + i),
                             np.float32) for i in range(n_groups)]
            if deng.dtype == "int8":
                pairs = [quantize_queries_int8(q) for q in qf]
                qss = jnp.stack([p[0] for p in pairs])
                scs = jnp.stack([p[1] for p in pairs])
            else:
                qss = jnp.stack([jnp.asarray(q) for q in qf])
                scs = jnp.zeros((n_groups, Q), jnp.float32)

            @jax.jit
            def go(A, rsc, qss, scs):
                def step(c, qs_sc):
                    qs, sc = qs_sc
                    if deng.dtype == "int8":
                        _, v = dense_topk_batch(
                            A, qs, None, rsc, sc, k=K,
                            block_rows=deng.block_rows,
                            recall_target=deng.recall_target)
                    else:
                        _, v = dense_topk_batch(
                            A, qs, k=K, block_rows=deng.block_rows,
                            recall_target=deng.recall_target)
                    return c, v.max()
                _, outs = jax.lax.scan(step, 0, (qss, scs))
                return outs

            return lambda: np.asarray(go(deng._A, deng._scales, qss, scs))

        try:
            ds, dl = dense_fn(2, QD), dense_fn(7, QD)
            ds(); dl()
            dslopes = sorted((_timed(dl) - _timed(ds)) / 5.0 / QD
                             for _ in range(3))
            per_query_dense = dslopes[len(dslopes) // 2]
            # wide batch: the sweep cost is per group, so per-query cost
            # drops ~4x at 256 (the matmul block time is batch-independent
            # up to ~512 — measured above)
            ds6, dl6 = dense_fn(2, 256), dense_fn(5, 256)
            ds6(); dl6()
            d6 = sorted((_timed(dl6) - _timed(ds6)) / 3.0 / 256
                        for _ in range(3))
            per_query_dense256 = d6[len(d6) // 2]
            di, _ = map(np.asarray, deng.query_batch(
                create_query_batch(1, NUM_COLS, seed=3)))
            precision_dense = len(set(gi.tolist())
                                  & set(di[0].tolist())) / K
        except Exception as e:  # pragma: no cover - hardware-path guard
            print(f"dense section skipped: {e!r}", file=sys.stderr)
            per_query_dense = per_query_dense256 = None

    result.update({
        "dense_dtype": dense_dtype,
        "dense_batch64_gnnz_per_query": (
            round(coo.nnz / per_query_dense / 1e9, 2)
            if per_query_dense else None),
        "dense_batch64_us_per_query": (
            round(per_query_dense * 1e6, 1) if per_query_dense else None),
        "dense_batch256_gnnz_per_query": (
            round(coo.nnz / per_query_dense256 / 1e9, 2)
            if per_query_dense256 else None),
        "dense_batch256_us_per_query": (
            round(per_query_dense256 * 1e6, 1)
            if per_query_dense256 else None),
        "dense_precision_at_100": precision_dense,
    })
    # Final line: the same metric with every section's fields attached.
    print(json.dumps(result), flush=True)
    _write_latest(result)


def _write_latest(result: dict) -> None:
    try:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results", "bench_latest.json")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            json.dump(result, fh, indent=1)
    except Exception:
        pass


def _timed(fn):
    t = time.perf_counter()
    fn()
    return time.perf_counter() - t


if __name__ == "__main__":
    main()
