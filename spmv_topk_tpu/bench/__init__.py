from .harness import run_benchmark, BenchResult, CSV_HEADER
from .sweep import run_sweep
