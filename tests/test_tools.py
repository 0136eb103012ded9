"""The measurement tooling itself (tools/regress.py's contention gate,
tools/oracle_sweep.py's host sentinel): the r10 rounds proved twice
that host contention — sometimes invisible to guest loadavg — reads as
phantom per-query regressions, so the comparison tool must refuse to
flag when either side's committed artifact proves it was contended.
Pure-subprocess tests; no Spark session needed."""

from __future__ import annotations

import json
import os
import subprocess
import sys

TOOLS = os.path.join(os.path.dirname(__file__), os.pardir, "tools")


def _regress(tmp_path, old, new, threshold="1.5"):
    po, pn = f"{tmp_path}/old.json", f"{tmp_path}/new.json"
    json.dump(old, open(po, "w"))
    json.dump(new, open(pn, "w"))
    return subprocess.run(
        [sys.executable, os.path.join(TOOLS, "regress.py"), po, pn,
         threshold],
        capture_output=True, text=True,
    )


def test_regress_flags_real_regression_on_quiet_hosts(tmp_path):
    """Baseline behavior: both sides quiet (probe in band) — a 3x
    per-query drift is flagged and the exit code is 1."""
    old = {"sf": "x", "host": {"load1_start": 1.0, "cpu_probe_s": 0.09},
           "queries": {"q_a": 1.0, "q_b": 2.0}}
    new = {"sf": "x",
           "host": {"load1_start": 1.2, "cpu_probe_start_s": 0.091,
                    "cpu_probe_end_s": 0.095},
           "queries": {"q_a": 3.0, "q_b": 2.1}}
    r = _regress(tmp_path, old, new)
    assert r.returncode == 1
    assert "REGRESSED q_a" in r.stdout
    assert "CONTENDED" not in r.stdout


def test_regress_suppresses_flags_when_either_side_contended(tmp_path):
    """The planted-fixture gate (r10 verdict ask): the NEW side's
    sentinel reads a 0.22 s probe — the exact hypervisor-contention
    signature r10 measured (load1 can even look quiet) — so the 3x
    drift must NOT be flagged; instead a loud CONTENDED banner and
    exit code 3 ('re-run on a quiet host', distinct from regressed=1
    and clean=0)."""
    old = {"sf": "x", "host": {"load1_start": 1.0, "cpu_probe_s": 0.09},
           "queries": {"q_a": 1.0, "q_b": 2.0}}
    new = {"sf": "x",
           "host": {"load1_start": 0.05, "cpu_probe_start_s": 0.22,
                    "cpu_probe_end_s": 0.1},
           "queries": {"q_a": 3.0, "q_b": 2.1}}
    r = _regress(tmp_path, old, new)
    assert r.returncode == 3
    assert "CONTENDED" in r.stdout and "NEW" in r.stdout
    assert "REGRESSED" not in r.stdout
    # ... and symmetrically when the OLD side was the contended one
    # (a contended baseline reads as a phantom IMPROVEMENT)
    r2 = _regress(tmp_path, new, old)
    assert r2.returncode == 3 and "OLD" in r2.stdout


def test_regress_ungated_without_host_block(tmp_path):
    """Pre-r11 artifacts carry no host block: compared ungated, exactly
    as before (no banner, flags live)."""
    old = {"sf": "x", "queries": {"q_a": 1.0}}
    new = {"sf": "x", "queries": {"q_a": 3.0}}
    r = _regress(tmp_path, old, new)
    assert r.returncode == 1
    assert "REGRESSED q_a" in r.stdout
    assert "CONTENDED" not in r.stdout


def test_regress_reads_host_block_under_driver_parsed_wrapper(tmp_path):
    """The driver wraps bench.py's JSON under "parsed": the sentinel
    must be found there too, so BENCH_r{N}.json comparisons are gated
    the same way as raw bench output."""
    old = {"parsed": {"host": {"cpu_probe_s": 0.19},
                      "queries": {"q_a": 1.0}}}
    new = {"sf": "x", "host": {"cpu_probe_s": 0.09},
           "queries": {"q_a": 3.0}}
    r = _regress(tmp_path, old, new)
    assert r.returncode == 3
    assert "CONTENDED" in r.stdout and "OLD" in r.stdout


def test_regress_skips_non_numeric_detail_pointer(tmp_path):
    """bench.py's stdout line may carry {"_detail": "BENCH_DETAIL.json"}
    instead of inline numbers: regress must skip non-numeric entries
    rather than crash, and still compare whatever numeric names remain."""
    old = {"sf": "x", "queries": {"_detail": "BENCH_DETAIL.json",
                                  "q_a": 1.0}}
    new = {"sf": "x", "queries": {"q_a": 1.1}}
    r = _regress(tmp_path, old, new)
    assert r.returncode == 0
    assert "shared 1 queries" in r.stdout
