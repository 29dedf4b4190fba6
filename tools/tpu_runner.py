"""Long-lived TPU job runner.

The session's TPU is reached through a single-grant tunnel: every new Python
process that registers the PJRT plugin must wait (minutes) for the previous
holder's grant to lapse, and a crashed process makes it worse.  This runner
claims the grant once and then executes job files sequentially:

    python tools/tpu_runner.py /tmp/tpu_jobs &
    # submit: write foo.py into /tmp/tpu_jobs/ ; result appears as foo.out
    # (exceptions are captured into the .out file; the runner survives)

Job files run via exec() in this process with a fresh __main__-style globals
dict; they can import jax and use the already-initialized backend.
"""

from __future__ import annotations

import io
import os
import sys
import time
import traceback


def main(job_dir: str) -> None:
    os.makedirs(job_dir, exist_ok=True)
    import jax  # claim the grant now

    print("tpu_runner: devices =", jax.devices(), flush=True)
    ready = os.path.join(job_dir, ".ready")
    with open(ready, "w") as f:
        f.write(repr(jax.devices()))

    while True:
        jobs = sorted(
            f for f in os.listdir(job_dir)
            if f.endswith(".py") and not os.path.exists(
                os.path.join(job_dir, f[:-3] + ".out")
            )
        )
        for job in jobs:
            path = os.path.join(job_dir, job)
            out_path = os.path.join(job_dir, job[:-3] + ".out")
            tmp_path = out_path + ".tmp"
            print(f"tpu_runner: running {job}", flush=True)
            buf = io.StringIO()
            t0 = time.time()
            old_stdout, old_stderr = sys.stdout, sys.stderr
            try:
                sys.stdout = sys.stderr = buf
                with open(path) as f:
                    code = f.read()
                exec(compile(code, path, "exec"), {"__name__": "__tpu_job__"})
                status = "OK"
            except BaseException:
                traceback.print_exc(file=buf)
                status = "ERROR"
            finally:
                sys.stdout, sys.stderr = old_stdout, old_stderr
            dt = time.time() - t0
            with open(tmp_path, "w") as f:
                f.write(f"# status: {status} elapsed: {dt:.1f}s\n")
                f.write(buf.getvalue())
            os.replace(tmp_path, out_path)
            print(f"tpu_runner: {job} -> {status} ({dt:.1f}s)", flush=True)
        time.sleep(0.5)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_jobs")
