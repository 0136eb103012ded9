"""In-run host-interference sampler for long timing runs.

The start/end cpu-probe pair in the sweep/bench host sentinel can
STRADDLE bursty interference: r12's round-close re-verification ran the
same-code full registry three times at sf0.01 and read 529 s / 429 s /
365 s against the quiet-host 275 s, with DISJOINT pathological spike
sets per run (st_* trigger-bound queries at 10-19x in one run, dd_*/
sim_* shuffle-heavy queries at 3-8x in another) while the start AND end
probes of the worst run both sat in the quiet band (0.097 / 0.102 s).
A probe taken only at the endpoints cannot see a mid-run burst, and a
CPU probe cannot see host-side DISK interference at all (the guest's
IO PSI can: /proc/pressure/io).

This sampler closes both holes: a detached child process samples every
``period`` seconds
  - the fixed single-core cpu probe (bench._cpu_probe_s's work),
  - the instantaneous runnable count (4th /proc/loadavg field, NOT the
    1-minute EMA -- load1 lags a just-started 32-way stage by tens of
    seconds, which would misclassify the sweep's own load as external),
  - cumulative IO-stall seconds since sampler start (PSI 'some').
The parent folds the series into a summary for the artifact's host
block.  A sample is a BURST -- evidence of interference external to
the measured workload -- only when the probe is contended
(>= 0.15 s, tools/regress.py's gate) while the host is NOT
CPU-saturated by the workload itself (runnable <= half the cores):
an elevated probe under full runnable queues is ordinary fair-share
scheduling of the sweep's own stages and must not flag.

Subprocess, not a thread: an in-process sampler thread would measure
GIL availability (driver-side pandas canonicalization holds the GIL
for long stretches), not host speed.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

_CHILD = r"""
import json, os, sys, time

def _probe():
    t0 = time.perf_counter()
    acc = 0
    for i in range(2_000_000):
        acc += i * i
    return round(time.perf_counter() - t0, 4)

def _io_some_total():
    try:
        with open("/proc/pressure/io") as fh:
            for ln in fh:
                if ln.startswith("some"):
                    return int(ln.rsplit("total=", 1)[1])
    except (OSError, ValueError):
        pass
    return None

def _runnable():
    try:
        with open("/proc/loadavg") as fh:
            return int(fh.read().split()[3].split("/")[0])
    except (OSError, ValueError, IndexError):
        return -1

out, period, parent_pid = sys.argv[1], float(sys.argv[2]), int(sys.argv[3])
t0, io0 = time.time(), _io_some_total()
while True:
    time.sleep(period)
    # The parent passes ITS OWN pid explicitly: comparing getppid()
    # against a boot-time snapshot instead would fail both ways — a
    # parent that dies before this interpreter boots leaves the
    # snapshot already pointing at the reaper (never-exit leak under a
    # non-pid-1 subreaper), and a legitimate pid-1 parent (container
    # entrypoint) would read as "already orphaned".
    if os.getppid() != parent_pid:
        # parent died without stop() (hard crash / SIGKILL): don't
        # loop as an orphan forever; clean our own output too
        try:
            os.unlink(out)
        except OSError:
            pass
        break
    rec = {
        "offset_s": round(time.time() - t0, 1),
        "probe_s": _probe(),
        "runnable": _runnable(),
    }
    io1 = _io_some_total()
    if io0 is not None and io1 is not None:
        rec["io_stall_s"] = round((io1 - io0) / 1e6, 2)
    with open(out, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
"""

# Single source of truth for the contention threshold: regress.py (same
# directory, stdlib-only) — a drifted copy here would bake bursts into
# artifacts at a different bar than the gate that reads them. Fallback
# only for import contexts without tools/ on the path.
try:
    from regress import CONTENTION_PROBE_S as PROBE_CONTENDED_S
except ImportError:  # pragma: no cover
    PROBE_CONTENDED_S = 0.15


class InRunSampler:
    """Start/stop wrapper; ``stop()`` returns the host-block summary."""

    def __init__(self, period_s: float = 20.0):
        self._period = period_s
        fd, self._path = tempfile.mkstemp(prefix="host_sentinel_", suffix=".jsonl")
        os.close(fd)
        self._proc: subprocess.Popen | None = None

    def start(self) -> None:
        self._proc = subprocess.Popen(
            [sys.executable, "-c", _CHILD, self._path, str(self._period),
             str(os.getpid())],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )

    def stop(self, ncpus: int | None = None) -> dict:
        if self._proc is not None:
            self._proc.terminate()
            try:
                self._proc.wait(timeout=5)
            except subprocess.TimeoutExpired:
                self._proc.kill()
        samples = []
        try:
            with open(self._path) as fh:
                for ln in fh:
                    try:
                        samples.append(json.loads(ln))
                    except ValueError:
                        pass  # torn final line from terminate()
        except OSError:
            pass
        finally:
            try:
                os.unlink(self._path)
            except OSError:
                pass
        if not samples:
            return {"in_run_n": 0}
        half = (ncpus or os.cpu_count() or 32) // 2
        probes = sorted(s["probe_s"] for s in samples)
        bursts = [
            s
            for s in samples
            if s["probe_s"] >= PROBE_CONTENDED_S and 0 <= s["runnable"] <= half
        ]
        out = {
            "in_run_n": len(samples),
            "in_run_probe_med_s": probes[len(probes) // 2],
            "in_run_probe_max_s": probes[-1],
            "in_run_bursts": len(bursts),
        }
        if bursts:
            # where in the run, for correlating with per-query timings
            out["in_run_burst_offsets_s"] = [s["offset_s"] for s in bursts[:20]]
        last_io = samples[-1].get("io_stall_s")
        if last_io is not None:
            out["in_run_io_stall_s"] = last_io
        return out
