#!/usr/bin/env python
"""Persistent TPU job worker: claims the (contended) chip once and execs
queued python snippets, so each experiment doesn't pay the multi-minute
claim wait.

Protocol: drop `<name>.py` files into /tmp/tpu_jobs/; the worker execs
them in a shared namespace (globals persist across jobs — device arrays
can be reused), writing stdout+traceback to /tmp/tpu_jobs/<name>.out and
renaming the job to <name>.done. A job named `quit.py` stops the worker.
"""
import io
import os
import sys
import time
import traceback
import contextlib

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

JOBS = "/tmp/tpu_jobs"
os.makedirs(JOBS, exist_ok=True)

print("claiming TPU...", flush=True)
t0 = time.time()
import jax  # noqa: E402
devs = jax.devices()
print(f"claimed {devs} in {time.time()-t0:.1f}s", flush=True)

from spmv_topk_tpu.utils.profiling import enable_compilation_cache  # noqa
enable_compilation_cache()

NS = {"__name__": "__tpu_worker__"}
while True:
    jobs = sorted(f for f in os.listdir(JOBS) if f.endswith(".py"))
    if not jobs:
        time.sleep(1.0)
        continue
    name = jobs[0]
    path = os.path.join(JOBS, name)
    src = open(path).read()
    if name == "quit.py":
        os.rename(path, path + ".done")
        print("quit requested", flush=True)
        break
    buf = io.StringIO()
    t0 = time.time()
    try:
        with contextlib.redirect_stdout(buf):
            exec(compile(src, path, "exec"), NS)
        status = "ok"
    except Exception:
        buf.write(traceback.format_exc())
        status = "error"
    dt = time.time() - t0
    out = os.path.join(JOBS, name[:-3] + ".out")
    with open(out, "w") as f:
        f.write(f"# status={status} wall={dt:.1f}s\n")
        f.write(buf.getvalue())
    os.rename(path, path + ".done")
    print(f"job {name}: {status} in {dt:.1f}s", flush=True)
