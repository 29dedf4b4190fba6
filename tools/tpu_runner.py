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


def _claim_devices():
    """Initialize the axon backend, retrying while the TPU grant is held.

    The sitecustomize registration is swallowed-on-failure; when it failed
    (previous grant still pending release) we re-register explicitly and
    retry until the chip is ours.
    """
    import uuid

    import jax

    # sitecustomize removes its own dir from sys.path after running, so a
    # failed/skipped registration leaves the ``axon`` module unimportable;
    # put the site dir back before re-registering.
    axon_site = os.environ.get("AXON_SITE", "/root/.axon_site")
    if os.path.isdir(axon_site) and axon_site not in sys.path:
        sys.path.insert(0, axon_site)

    for attempt in range(120):
        try:
            return jax.devices()
        except RuntimeError as e:
            print(f"tpu_runner: devices attempt {attempt}: {str(e)[:100]}", flush=True)
        try:
            from axon.register import register

            gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
            register(
                None,
                f"{gen}:1x1x1",
                so_path="/opt/axon/libaxon_pjrt.so",
                session_id=str(uuid.uuid4()),
                remote_compile=os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1",
            )
        except Exception as e:
            print(f"tpu_runner: register retry: {str(e)[:100]}", flush=True)
        time.sleep(15)
    raise RuntimeError("could not claim TPU devices")


def main(job_dir: str) -> None:
    os.makedirs(job_dir, exist_ok=True)
    devices = _claim_devices()

    print("tpu_runner: devices =", devices, flush=True)
    ready = os.path.join(job_dir, ".ready")
    with open(ready, "w") as f:
        f.write(repr(devices))

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
            t0 = time.time()
            old_stdout, old_stderr = sys.stdout, sys.stderr

            class _Tee(io.TextIOBase):
                """Line-buffered tee into the live .tmp file."""

                def __init__(self, fh):
                    self.fh = fh

                def write(self, s):
                    self.fh.write(s)
                    self.fh.flush()
                    return len(s)

            with open(tmp_path, "w") as live:
                tee = _Tee(live)
                try:
                    sys.stdout = sys.stderr = tee
                    # drop cached framework modules so edits between jobs
                    # take effect (jax stays initialized; the grant is kept)
                    for mod in [m for m in sys.modules
                                if m.split(".")[0] == "radar_signal_process_tpu"]:
                        del sys.modules[mod]
                    with open(path) as f:
                        code = f.read()
                    exec(compile(code, path, "exec"), {"__name__": "__tpu_job__"})
                    status = "OK"
                except BaseException:
                    traceback.print_exc(file=tee)
                    status = "ERROR"
                finally:
                    sys.stdout, sys.stderr = old_stdout, old_stderr
            dt = time.time() - t0
            with open(out_path, "w") as f:
                f.write(f"# status: {status} elapsed: {dt:.1f}s\n")
                with open(tmp_path) as tf:
                    f.write(tf.read())
            os.remove(tmp_path)
            print(f"tpu_runner: {job} -> {status} ({dt:.1f}s)", flush=True)
        time.sleep(0.5)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_jobs")
