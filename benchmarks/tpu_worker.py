#!/usr/bin/env python
"""Persistent TPU worker: holds the device claim and executes job files.

This environment's TPU claim is sporadically refused at process start, and
every new process pays compile/transfer costs again. The worker claims the
device once, then polls `<dir>/job_*.py` files, exec()s each in-process
(sharing the jax context, loaded params, and compiled executables via the
module-level `STATE` dict), and writes stdout + errors to `<jobfile>.out`.

Usage:
  python benchmarks/tpu_worker.py /tmp/tpu_jobs &
  cp myjob.py /tmp/tpu_jobs/job_001.py      # results in job_001.py.out
"""

import contextlib
import io
import os
import sys
import time
import traceback


def main():
    jobs_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_jobs"
    os.makedirs(jobs_dir, exist_ok=True)

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    for attempt in range(30):
        try:
            devs = jax.devices()
            break
        except RuntimeError as e:
            print(f"claim failed (attempt {attempt}): {e}", flush=True)
            time.sleep(30)
            # registration is once-per-process: re-exec
            os.execv(sys.executable, [sys.executable] + sys.argv)
    print(f"WORKER READY devices={devs}", flush=True)

    STATE = {}
    done = set()
    while True:
        if os.path.exists(os.path.join(jobs_dir, "STOP")):
            print("WORKER STOP", flush=True)
            return
        for name in sorted(os.listdir(jobs_dir)):
            if not (name.startswith("job_") and name.endswith(".py")):
                continue
            path = os.path.join(jobs_dir, name)
            out_path = path + ".out"
            if name in done or os.path.exists(out_path):
                done.add(name)
                continue
            done.add(name)
            print(f"RUN {name}", flush=True)
            buf = io.StringIO()
            t0 = time.time()
            try:
                with open(path) as f:
                    code = f.read()
                with contextlib.redirect_stdout(buf):
                    exec(compile(code, path, "exec"),
                         {"STATE": STATE, "__name__": "__tpu_job__"})
                status = "OK"
            except Exception:
                buf.write(traceback.format_exc())
                status = "FAIL"
            with open(out_path + ".tmp", "w") as f:
                f.write(f"# {status} in {time.time() - t0:.1f}s\n")
                f.write(buf.getvalue())
            os.rename(out_path + ".tmp", out_path)
            print(f"DONE {name} {status}", flush=True)
        time.sleep(2)


if __name__ == "__main__":
    main()
