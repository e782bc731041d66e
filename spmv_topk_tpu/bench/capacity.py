"""Capacity planning: size a TPU mesh for a corpus and project serving rates.

BASELINE.json config 5 asks for a 500M-row corpus served from a v4-32
slice. Only one v5e chip is physically reachable in this environment, so
this tool does what a deployment engineer would do with the same data: it
combines the MEASURED single-chip constants (bench.py / RESULTS.md slope
protocol) with the sharded engine's cost model — per-chip sweeps are
independent (the reference's embarrassingly-parallel partition property,
host_spmv_bscsr.cpp:323-397), the merge is an `all_gather` of k
(value, row) pairs (k*8 bytes per device over ICI), and the exact rescore
is row-sharded across hosts — to report HBM fit, per-query latency, qps,
and scaling efficiency for any (corpus, mesh) pair.

Every projected number is labeled; every constant is measured and says
where it was measured. The sharded execution path itself is validated
functionally on a virtual 8-device mesh in tests/test_capacity.py.

Usage:
  python -m spmv_topk_tpu.bench.capacity --rows 500e6 --mesh v4-32 --batch 64
  python -m spmv_topk_tpu.bench.capacity --baseline-config5 --json
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import math
from typing import Optional

# ---------------------------------------------------------------- constants
# Measured on the tunneled v5e (one TensorCore) by bench.py's interleaved
# slope protocol; see RESULTS.md c2/c3/c9 and ROOFLINE.md. Rates are per
# CORE: the fused kernel is VPU-bound (ROOFLINE.md §2), so a megacore chip
# (v4/v5p, 2 TensorCores) runs 2 partitions on the parallel grid axis.
# As of round 4 this is an EXECUTABLE path end to end — the sharded engine
# composes num_partitions>1 with shard_map (parallel/sharded_buckets.py::
# _local_sweep; correctness: tests/test_sharded_buckets.py::
# test_sharded_megacore_partitions_match_exact) — but the 2x per-chip rate
# remains an ASSUMPTION for v4/v5p (no megacore hardware in this lab; the
# v5e chip has one TensorCore), marked in the output.

MEASURED = {
    # per-core Gnnz/s (mid of the reproducible range) and words/nnz incl.
    # padding on the 10M-row gamma deg-20 corpus. Single-query = the
    # octet-q2 headline (BENCH r5: 172.1); batch = the slice-q2 engine
    # (the measured batch layout, ROOFLINE.md §"octet layout").
    "h16": dict(gnnz_core=172.0, gnnz_range=(158.0, 181.0),
                words_per_nnz=0.576,
                batch_gnnz_core={1: 172.0, 16: 201.0, 32: 238.0, 64: 258.0}),
    "i4s": dict(gnnz_core=127.0, gnnz_range=(117.0, 139.0),
                words_per_nnz=1.157,
                batch_gnnz_core={1: 127.0}),
    "i8s": dict(gnnz_core=90.0, gnnz_range=(86.0, 96.0),
                words_per_nnz=1.157,
                batch_gnnz_core={1: 90.0}),
}
RESCORE_MS_PER_QUERY = 0.09     # native csr_rescore, pool=400 (bench.py)
PACK_NNZ_PER_SEC = 2.0e6        # h16 native threaded scatter (RESULTS c3/c9)
MERGE_BYTES_PER_DEV = 8         # (f32 value, i32 row) per candidate

# Chip table: (HBM GB, deliverable-class HBM GB/s, TensorCores per chip,
# chips per host). v5e figures are measured here; v4/v5p are public
# nameplate specs (the kernel is compute-bound at <60% of even the v5e's
# bandwidth, so projections never hit the DMA ceiling on v4/v5p).
CHIPS = {
    "v5e": dict(hbm_gb=16.0, hbm_gbps=819.0, cores=1, chips_per_host=4),
    "v4": dict(hbm_gb=32.0, hbm_gbps=1228.0, cores=2, chips_per_host=4),
    "v5p": dict(hbm_gb=95.0, hbm_gbps=2765.0, cores=2, chips_per_host=4),
}


def parse_mesh(mesh: str):
    """'v4-32' -> (chip dict, num_chips, num_hosts). The slice number is
    TensorCore count (TPU naming), so v4-32 = 16 chips = 4 hosts."""
    name, _, n = mesh.partition("-")
    if name not in CHIPS or not n.isdigit():
        raise ValueError(f"unknown mesh {mesh!r}; use e.g. v4-32, v5e-8")
    chip = CHIPS[name]
    cores = int(n)
    chips = max(1, cores // chip["cores"])
    hosts = max(1, chips // chip["chips_per_host"])
    return dict(chip, name=name), chips, hosts


@dataclasses.dataclass
class Plan:
    """One sized deployment; every field is derived from measured
    constants except where `assumptions` says otherwise."""
    mesh: str
    rows: int
    cols: int
    nnz: int
    codec: str
    batch: int
    packed_gb: float
    per_chip_gb: float
    hbm_utilization: float
    fits: bool
    sweep_ms: float
    merge_ms: float
    rescore_ms: float
    per_query_ms: float
    qps: float
    aggregate_gnnz: float
    scaling_efficiency: float
    pack_minutes_per_host: float
    raw_precision_lower_bound: float
    assumptions: list

    def as_json(self):
        return json.dumps(dataclasses.asdict(self))


def plan(
    rows: int,
    cols: int = 1024,
    nnz_per_row: float = 20.0,
    codec: str = "h16",
    k: int = 100,
    lane_k: int = 8,
    mesh: str = "v4-32",
    batch: int = 64,
    rescore_pool: int = 400,
    words_per_nnz: Optional[float] = None,
) -> Plan:
    """Size `mesh` for a (rows x cols, nnz_per_row) corpus under `codec`.

    The model: corpus rows split evenly across chips (the reference's
    partition rule, host_spmv_bscsr.cpp:136-150, generalized); each core
    sweeps its packed words at the measured per-core rate; the merge
    all-gathers merge_k (value,row) pairs per device over ICI; hosts
    rescore their own row slice of the exact CSR concurrently."""
    m = MEASURED[codec]
    chip, chips, hosts = parse_mesh(mesh)
    cores = chips * chip["cores"]
    nnz = int(rows * nnz_per_row)
    wpn = m["words_per_nnz"] if words_per_nnz is None else words_per_nnz
    packed_gb = nnz * wpn * 4 / 1e9
    # row_ids + nreal metadata are < 1% of words; the rescore CSR lives in
    # HOST memory (row-sliced per host), not HBM.
    per_chip_gb = packed_gb / chips * 1.01
    hbm_util = per_chip_gb / chip["hbm_gb"]

    assumptions = [
        f"per-core rate = {m['gnnz_core']} Gnnz/s measured on v5e "
        f"(range {m['gnnz_range'][0]}-{m['gnnz_range'][1]} with chip "
        f"tenancy, RESULTS.md); "
        + ("MEASURED chip" if chip["name"] == "v5e" else
           f"{chip['name']} chips ASSUME per-core parity (VPU-bound "
           "kernel; the sharded engine runs the partitioned kernels with "
           "num_partitions=2 on megacore chips — a real, tested path "
           "since round 4 — but its 2x rate is unmeasured on v4/v5p)"),
    ]

    # Batch rate: interpolate measured group points (per-query Gnnz/s/core).
    pts = sorted(m["batch_gnnz_core"].items())
    if batch <= pts[0][0]:
        rate_core = pts[0][1]
    elif batch >= pts[-1][0]:
        rate_core = pts[-1][1]
        if batch > pts[-1][0]:
            assumptions.append(
                f"batch {batch} > largest measured group {pts[-1][0]}: "
                f"using the group-{pts[-1][0]} rate (conservative — the "
                f"shared-decode amortization only improves)")
    else:
        import bisect
        i = bisect.bisect_left([p[0] for p in pts], batch)
        (b0, r0), (b1, r1) = pts[i - 1], pts[i]
        rate_core = r0 + (r1 - r0) * (batch - b0) / (b1 - b0)

    # Compute-bound check: DMA demand per chip must stay under the chip's
    # deliverable bandwidth (with 15% headroom); clamp if not.
    demand_gbps = rate_core * chip["cores"] * wpn * 4
    cap_gbps = chip["hbm_gbps"] * 0.85
    if demand_gbps > cap_gbps:
        rate_core *= cap_gbps / demand_gbps
        assumptions.append(
            f"clamped to the DMA ceiling: demand {demand_gbps:.0f} GB/s > "
            f"85% of {chip['hbm_gbps']} GB/s")

    nnz_per_chip = nnz / chips
    sweep_ms = nnz_per_chip / (rate_core * chip["cores"] * 1e9) * 1e3
    merge_k = max(k, rescore_pool)
    # ICI all_gather of merge_k pairs per device; ~100 GB/s per link and
    # a ~5 us dispatch floor dominate — measured negligible on the CPU
    # mesh and bounded above here.
    merge_ms = max(5e-3, merge_k * MERGE_BYTES_PER_DEV * chips / 100e9 * 1e3)
    # hosts rescore their row slice concurrently; the measured 0.09 ms is
    # a full-corpus-on-one-host bound, so per-host cost only drops.
    rescore_ms = RESCORE_MS_PER_QUERY if rescore_pool else 0.0

    # sweep_ms is per QUERY at the batched rate; a group of `batch`
    # queries shares one merge, and each query pays the host rescore
    # (conservatively serial — in production it overlaps the next sweep).
    B = max(batch, 1)
    group_ms = sweep_ms * B + merge_ms + rescore_ms * B
    per_query_ms = group_ms / B
    qps = 1e3 / per_query_ms
    aggregate_gnnz = nnz / per_query_ms / 1e6
    single_chip_ms = nnz / (rate_core * chip["cores"] * 1e9) * 1e3
    scaling_eff = (single_chip_ms / chips) / per_query_ms

    pack_min = nnz / hosts / PACK_NNZ_PER_SEC / 60.0

    from ..eval.accuracy_model import closed_form_precision
    raw_prec = closed_form_precision(
        n=min(rows, 10**7), b=128, k=k, partition_k=lane_k)
    assumptions.append(
        "raw_precision_lower_bound is the closed-form single-device "
        "128-lane model (eval/accuracy_model.py); more devices only widen "
        "the candidate pool, and the exact rescore lifts measured "
        "precision to 0.98-1.00 (RESULTS.md)")

    return Plan(
        mesh=mesh, rows=rows, cols=cols, nnz=nnz, codec=codec, batch=batch,
        packed_gb=round(packed_gb, 2), per_chip_gb=round(per_chip_gb, 2),
        hbm_utilization=round(hbm_util, 3), fits=hbm_util < 0.9,
        sweep_ms=round(sweep_ms, 3), merge_ms=round(merge_ms, 4),
        rescore_ms=rescore_ms, per_query_ms=round(per_query_ms, 3),
        qps=round(qps, 1), aggregate_gnnz=round(aggregate_gnnz, 1),
        scaling_efficiency=round(scaling_eff, 3),
        pack_minutes_per_host=round(pack_min, 1),
        raw_precision_lower_bound=round(raw_prec, 4),
        assumptions=assumptions,
    )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--rows", type=float, default=500e6)
    ap.add_argument("--cols", type=int, default=1024)
    ap.add_argument("--nnz-per-row", type=float, default=20.0)
    ap.add_argument("--codec", default="h16", choices=sorted(MEASURED))
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--mesh", default="v4-32")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--baseline-config5", action="store_true",
                    help="the BASELINE.json config-5 geometry "
                         "(500M x 1024, v4-32, batched streaming)")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)

    if args.baseline_config5:
        p = plan(rows=500_000_000, cols=1024, mesh="v4-32", batch=64)
    else:
        p = plan(rows=int(args.rows), cols=args.cols,
                 nnz_per_row=args.nnz_per_row, codec=args.codec,
                 k=args.k, mesh=args.mesh, batch=args.batch)

    if args.json:
        print(p.as_json())
        return p
    d = dataclasses.asdict(p)
    assump = d.pop("assumptions")
    width = max(len(k_) for k_ in d)
    for k_, v in d.items():
        print(f"{k_:<{width}}  {v}")
    print("\nassumptions / provenance:")
    for a in assump:
        print(f"  - {a}")
    return p


if __name__ == "__main__":
    main()
