#!/usr/bin/env python
"""Wait for a genuinely quiet box window, then launch one full bench run.

Quietness = all three telltales simultaneously (see BASELINE.md
"Scaling methodology"):
  * hypervisor steal ~0 over a 30 s sample,
  * guest busy ~0 (nothing else running in this guest),
  * a 1-thread STREAM-ish triad at >= TRIAD_MIN GB/s (catches the
    neighbor-VM DRAM-saturation mode that steal cannot see).

Usage:
    python scripts/quiet_bench.py [out.json] [max_wait_minutes]

Exits after ONE bench run (or after the wait budget, launching anyway so
the record exists — the bench's own box_load brackets label the window).
"""
import os
import subprocess
import sys
import time

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_quiet.out"
MAX_WAIT_MIN = float(sys.argv[2]) if len(sys.argv) > 2 else 90.0
TRIAD_MIN_GBS = float(os.environ.get("SZ_QUIET_TRIAD_GBS", "10.0"))
# launch thresholds, env-tunable: some host modes hold a steady 0.3-1.0
# cores of steal for hours with healthy DRAM (seen r5 session 4) — in
# that regime waiting for steal < 0.15 never fires and the right call
# is a documented higher bar (the run's own box_load brackets and the
# abort-on-burst guard still label/kill genuinely hostile windows)
BUSY_MAX = float(os.environ.get("SZ_QUIET_BUSY", "0.6"))
STEAL_MAX = float(os.environ.get("SZ_QUIET_STEAL", "0.15"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cpu_sample():
    with open("/proc/stat") as fh:
        v = [int(x) for x in fh.readline().split()[1:]]
    busy = v[0] + v[1] + v[2] + v[5] + v[6]
    return time.time(), busy, v[7]


def triad_gbs():
    import numpy as np

    n = 8_000_000
    a = np.ones(n)
    b = np.full(n, 2.0)
    c = np.empty(n)
    np.multiply(b, 1.5, out=c)  # first-touch c's pages OUTSIDE the
    c += a                      # timed region (cold run reads ~0.7 GB/s)
    t0 = time.time()
    for _ in range(4):
        np.multiply(b, 1.5, out=c)
        c += a
    el = time.time() - t0
    # 5 streams per iteration (ADVICE r4): mul reads b writes c; += reads
    # c and a, writes c
    return 4 * 5 * n * 8 / el / 1e9


def window_quiet():
    t0, b0, s0 = cpu_sample()
    time.sleep(30)
    t1, b1, s1 = cpu_sample()
    w = t1 - t0
    busy = (b1 - b0) / 100 / w
    steal = (s1 - s0) / 100 / w
    tri = triad_gbs()
    print(f"[quiet_bench] busy {busy:.2f} steal {steal:.2f} triad {tri:.1f} GB/s",
          flush=True)
    return busy < BUSY_MAX and steal < STEAL_MAX and tri >= TRIAD_MIN_GBS


def wait_for_quiet(deadline) -> bool:
    streak = 0
    while time.time() < deadline:
        streak = streak + 1 if window_quiet() else 0
        if streak >= 2:
            print("[quiet_bench] quiet window confirmed, launching bench",
                  flush=True)
            return True
        time.sleep(30)
    return False


def run_bench_abortable(deadline) -> bool:
    """Launch the bench; ABORT it if the box turns hostile early.

    Run J (BENCH_local_r5_runJ.json) showed the failure mode this
    guards: the launch window read clean, then a ~50-minute hypervisor
    burst arrived minutes in and contaminated every probe.  While the
    bench runs, sample steal+external-busy every 60 s; if the first
    ~7 minutes accumulate 3 hostile samples (steal > 0.8 cores or
    external busy > 1.5 cores), kill the run, discard the partial
    output, and let the caller re-wait — a wasted 7 minutes beats a
    wasted 50.  After the early window the run is left to finish
    (late contamination is visible in its own box_load brackets).
    Returns True when the bench ran to completion."""
    with open(OUT, "w") as out, open(OUT + ".err", "w") as err:
        proc = subprocess.Popen(
            [sys.executable, os.path.join(REPO, "bench.py")],
            stdout=out, stderr=err,
        )
        t_start = time.time()
        hostile = 0
        while proc.poll() is None:
            t0, b0, s0 = cpu_sample()
            time.sleep(60)
            t1, b1, s1 = cpu_sample()
            w = t1 - t0
            steal = (s1 - s0) / 100 / w
            # our own bench is in this guest: hostile means STEAL (the
            # hypervisor withholding cycles), not guest-busy
            if steal > 0.8:
                hostile += 1
                print(f"[quiet_bench] hostile sample steal={steal:.2f} "
                      f"({hostile}/3)", flush=True)
            if time.time() - t_start > 7 * 60:
                break  # early window over; let it finish either way
            if hostile >= 3 and time.time() < deadline - 15 * 60:
                print("[quiet_bench] burst confirmed, aborting run to "
                      "re-wait", flush=True)
                proc.terminate()
                try:
                    proc.wait(timeout=30)
                except subprocess.TimeoutExpired:
                    proc.kill()
                return False
        proc.wait()
        return True


deadline = time.time() + MAX_WAIT_MIN * 60
while True:
    if not wait_for_quiet(deadline):
        print("[quiet_bench] wait budget exhausted, launching anyway",
              flush=True)
        with open(OUT, "w") as out, open(OUT + ".err", "w") as err:
            subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                           stdout=out, stderr=err, check=False)
        break
    if run_bench_abortable(deadline):
        break
print(f"[quiet_bench] done -> {OUT}", flush=True)
