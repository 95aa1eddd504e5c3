"""Persistent TPU job worker: holds the TPU claim once, polls /tmp/tpu_jobs
for NNN.py files, execs each in-process, writes NNN.out (stdout+stderr+
traceback) and NNN.done.  Shared globals persist across jobs (G dict).

Writes its pid to /tmp/tpu_worker.pid (kill by pidfile, never by pgrep —
CLAUDE.md).  Stop cleanly with `touch /tmp/tpu_jobs/STOP`; the sentinel is
consumed on exit so the next launch starts fresh."""
import os, sys, time, traceback, io, contextlib
sys.path.insert(0, '/root/repo')
JOBS = "/tmp/tpu_jobs"
os.makedirs(JOBS, exist_ok=True)
# a STOP touched while no worker was alive (e.g. after a pidfile kill) is
# stale — clear it BEFORE paying the TPU claim wait, else this launch is
# stillborn: it would claim the chip, then consume the sentinel and exit.
# But if a PREVIOUS worker is still alive, the sentinel is live, not stale:
# it is mid-job and will consume STOP between jobs.  Consuming it here would
# orphan that worker (it never exits, keeps the single TPU claim) and
# overwrite its pidfile so it can no longer be killed the sanctioned way.
PIDFILE = "/tmp/tpu_worker.pid"


def _live_prior_worker():
    try:
        with open(PIDFILE) as f:
            pid = int(f.read().strip())
        os.kill(pid, 0)  # liveness probe only
        # A pidfile can outlive its worker (kill-by-pidfile leaves it behind)
        # and the PID can be recycled by an unrelated process; require the
        # process to actually BE a tpu_job_worker, else the takeover wait
        # below would spin forever on a stranger's PID.
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            if b"tpu_job_worker" not in f.read():
                return None
        return pid
    except (OSError, ValueError):
        return None


_stale = os.path.join(JOBS, "STOP")
_prior = _live_prior_worker()
if _prior is not None:
    print(
        f"previous worker pid {_prior} is still alive; leaving any STOP "
        "sentinel for it and waiting for it to exit...",
        flush=True,
    )
    while _live_prior_worker() is not None:
        time.sleep(1)
    print("previous worker exited; taking over", flush=True)
if os.path.exists(_stale):
    os.remove(_stale)
    print("cleared stale STOP sentinel from a previous worker", flush=True)
with open(PIDFILE, "w") as f:
    f.write(str(os.getpid()))
import jax, jax.numpy as jnp, numpy as np
print("worker up, devices:", jax.devices(), flush=True)
# warm the device
_ = float(jnp.zeros(()).sum())
print("device warm", flush=True)
# __name__ = "__main__" so job files with a main-guard actually run
G = {"__name__": "__main__", "jax": jax, "jnp": jnp, "np": np}
seen = set()
while True:
    stop = os.path.join(JOBS, "STOP")
    if os.path.exists(stop):
        os.remove(stop)  # consume, so the next worker launch isn't stillborn
        try:
            os.remove(PIDFILE)  # no stale pidfile for the next launch to probe
        except OSError:
            pass
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
