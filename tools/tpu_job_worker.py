"""Persistent TPU job worker: holds the TPU claim once, polls /tmp/tpu_jobs
for NNN.py files, execs each in-process, writes NNN.out (stdout+stderr+
traceback) and NNN.done.  Shared globals persist across jobs (G dict)."""
import os, sys, time, traceback, io, contextlib
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
print("worker up, devices:", jax.devices(), flush=True)
# warm the device
_ = float(jnp.zeros(()).sum())
print("device warm", flush=True)
G = {"jax": jax, "jnp": jnp, "np": np}
JOBS = "/tmp/tpu_jobs"
seen = set()
while True:
    if os.path.exists(os.path.join(JOBS, "STOP")):
        print("stop requested; exiting cleanly", flush=True)
        break
    for name in sorted(os.listdir(JOBS)):
        if not name.endswith(".py") or name in seen:
            continue
        seen.add(name)
        path = os.path.join(JOBS, name)
        out = io.StringIO()
        t0 = time.time()
        try:
            with contextlib.redirect_stdout(out), contextlib.redirect_stderr(out):
                exec(compile(open(path).read(), path, "exec"), G)
        except BaseException:
            out.write(traceback.format_exc())
        out.write(f"\n[job {name} took {time.time()-t0:.1f}s]\n")
        with open(path[:-3] + ".out", "w") as f:
            f.write(out.getvalue())
        open(path[:-3] + ".done", "w").close()
        print("done", name, flush=True)
    time.sleep(1)
