"""Diff two bench JSON files (bench.py output / BENCH_r{N}.json) and
flag per-query drifts, so round-over-round comparisons are mechanical
instead of eyeballed.

Run: python tools/regress.py OLD.json NEW.json [threshold]
Default threshold 2.0 (flag queries slower than 2x old). Queries only
present on one side are listed as added/removed, not flagged. Exit 1
if any query regresses past the threshold.

Both files may use either the round-1 schema (queries = single-pass
times) or the round-2+ schema (best-of-2 with raw passes alongside);
the headline `queries` map is compared in both cases.

CONTENTION GATE (r11, from the r10 finding): when either file carries
a ``host`` sentinel block whose single-core cpu probe reads >=
CONTENTION_PROBE_S (0.15 s; quiet band on this host 0.09-0.12), the
comparison is CONTENDED — r10's final sweeps read a phantom 1.27x
under hypervisor-level contention invisible to guest loadavg. A loud
banner is printed, per-query flag chasing is SUPPRESSED (the flags
would be position/contention noise, not code), and the exit code is 3
so callers can distinguish "re-run on a quiet host" from "regressed"
(1) and "clean" (0). Files without a host block (pre-r11 artifacts)
are compared ungated, as before.

BURSTY GATE (r12): the endpoint probes can STRADDLE interference —
the worst of three same-code r12 re-runs read 1.9x total with BOTH
endpoint probes in the quiet band. Sweeps since r12 carry an in-run
sampler summary (tools/host_sentinel.py): probe samples taken while
the host was NOT saturated by the workload itself (runnable <= half
the cores). When the bursty side also carries per-query start offsets
(sweep artifacts since r12), only the queries whose run window
overlaps a recorded burst (+/- one sampler period) are EXCLUDED from
the comparison — listed loudly as status-unknown — and the rest
proceeds normally. Real flags among the compared queries still exit 1;
a comparison left partial by exclusions exits 3 even with zero flags
(the excluded set was never compared — not a clean bill). A bursty
artifact WITHOUT offsets, or with more bursts than its capped offsets
list localizes, still suppresses everything and exits 3 exactly like
the endpoint gate.
"""

from __future__ import annotations

import json
import re
import sys


def _from_tail(tail: str) -> dict[str, float]:
    """Recover per-query timings from a truncated stdout-tail fragment
    (BENCH_r02.json lost its `parsed` to tail truncation; the per-query
    dicts are flat, so the LAST surviving complete map is extractable).
    Prefers the pass2/headline dict if its key survived; otherwise takes
    the last numeric value seen per query name across the fragment."""
    m = None
    for marker in ('"queries"', '"pass2_queries"'):
        hit = tail.rfind(marker + ": {")
        if hit >= 0:
            m = tail[hit + len(marker) + 3:]
            end = m.find("}")
            if end >= 0:
                m = m[:end]
            break
    region = m if m is not None else tail
    out: dict[str, float] = {}
    for name, val in re.findall(r'"([A-Za-z0-9_]+)":\s*([0-9.]+)', region):
        if name not in ("value", "init_s", "sf", "n_queries"):
            out[name] = float(val)  # last occurrence wins
    return out


CONTENTION_PROBE_S = 0.15


def _probe_max(host: dict | None) -> float | None:
    """Worst single-core cpu-probe reading in a host sentinel block
    (bench.py emits cpu_probe_s; oracle_sweep emits start/end)."""
    if not host:
        return None
    vals = [
        v for k, v in host.items()
        if k.startswith("cpu_probe") and isinstance(v, (int, float))
    ]
    return max(vals) if vals else None


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    def queries_of(
        path: str,
    ) -> tuple[dict[str, float], dict | None, dict | None]:
        d = json.load(open(path))
        # the driver wraps bench.py's JSON line under "parsed"; fall
        # back to the raw tail fragment when parsing failed driver-side
        p = d.get("parsed") or (d if "queries" in d else None)
        if p is not None:
            return p["queries"], p.get("host"), p.get("offsets")
        q = _from_tail(d.get("tail", ""))
        if not q:
            raise SystemExit(f"{path}: no parsed queries and no "
                             f"recoverable tail fragment")
        print(f"note: {path} parsed=null — recovered "
              f"{len(q)} queries from its tail fragment")
        return q, None, None

    old, host_old, off_old = queries_of(sys.argv[1])
    new, host_new, off_new = queries_of(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0

    contended = []
    bursty = []
    for side, path, host in (
        ("OLD", sys.argv[1], host_old), ("NEW", sys.argv[2], host_new)
    ):
        probe = _probe_max(host)
        if probe is not None and probe >= CONTENTION_PROBE_S:
            contended.append((side, path, probe))
        # r12: the endpoint probes can straddle bursty interference
        # (worst same-code re-run read 1.9x with both endpoints quiet);
        # the in-run sampler (tools/host_sentinel.py) records probe
        # samples taken while the host was NOT saturated by the
        # workload itself — any such burst poisons the comparison the
        # same way an endpoint-probe hit does.
        elif host and host.get("in_run_bursts", 0) > 0:
            offs = off_old if side == "OLD" else off_new
            bursty.append((side, path, host["in_run_bursts"],
                           host.get("in_run_probe_max_s"),
                           host.get("in_run_burst_offsets_s"), offs))

    # drop non-numeric entries (bench.py's stdout line may carry a
    # "_detail" pointer instead of inline per-query numbers — compare
    # BENCH_DETAIL.json files in that case)
    old = {k: v for k, v in old.items() if isinstance(v, (int, float))}
    new = {k: v for k, v in new.items() if isinstance(v, (int, float))}

    # Selective burst suppression (r12): when a bursty side carries
    # per-query start offsets, exclude only the queries whose run
    # window [start-MARGIN, start+duration+MARGIN] on THAT side
    # overlaps a recorded burst (a burst sample at T indicates
    # interference somewhere in the preceding sampler period, hence the
    # margin on both ends) — the rest of the comparison stays usable.
    # A bursty side WITHOUT offsets (older artifact) still discards
    # the whole comparison below.
    BURST_MARGIN_S = 25.0
    burst_excluded: set[str] = set()
    full_suppress = []
    for side, path, n, pmax, burst_offs, offs in bursty:
        qmap = old if side == "OLD" else new
        # the artifact caps the offsets list (host-block size); if more
        # bursts occurred than were localized, the un-localized ones
        # could hit any query — selective exclusion is unsound, fall
        # back to full suppression
        if not offs or not burst_offs or n > len(burst_offs):
            full_suppress.append((side, path, n, pmax))
            continue
        for name, start in offs.items():
            dur = qmap.get(name)
            if not isinstance(dur, (int, float)):
                continue
            lo, hi = start - BURST_MARGIN_S, start + dur + BURST_MARGIN_S
            if any(lo <= b <= hi for b in burst_offs):
                burst_excluded.add(name)

    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    flagged = []
    for name in sorted((set(old) & set(new)) - burst_excluded):
        ratio = new[name] / old[name] if old[name] else float("inf")
        if ratio > threshold:
            flagged.append((name, old[name], new[name], ratio))

    shared = (set(old) & set(new)) - burst_excluded
    t_old = sum(old[n] for n in shared)
    t_new = sum(new[n] for n in shared)
    print(f"shared {len(shared)} queries: {t_old:.1f}s -> {t_new:.1f}s "
          f"({t_new / t_old:.2f}x)" if shared else "no shared queries")
    if added:
        print(f"added ({len(added)}):", ", ".join(added))
    if removed:
        print(f"removed ({len(removed)}):", ", ".join(removed))
    if contended:
        print("!" * 66)
        for side, path, probe in contended:
            print(f"!!! CONTENDED: {side} ({path}) cpu probe "
                  f"{probe:.3f}s >= {CONTENTION_PROBE_S}s gate "
                  f"(quiet band ~0.09-0.12s)")
        print("!!! per-query flags SUPPRESSED — the totals above are "
              "host noise,")
        print("!!! not code. Re-run the contended side on a quiet host "
              "before")
        print("!!! chasing any regression.")
        print("!" * 66)
        return 3
    if full_suppress:
        print("!" * 66)
        for side, path, n, pmax in full_suppress:
            print(f"!!! BURSTY: {side} ({path}) {n} in-run probe "
                  f"sample(s) >= {CONTENTION_PROBE_S}s at low runnable "
                  f"(max {pmax}s) not all localizable to query windows "
                  f"(missing offsets or truncated burst list)")
        print("!!! endpoint probes were quiet but interference hit "
              "mid-run —")
        print("!!! per-query flags SUPPRESSED; re-run the bursty side "
              "on a quiet")
        print("!!! host before chasing any regression.")
        print("!" * 66)
        return 3
    if burst_excluded:
        print(f"BURST-EXCLUDED ({len(burst_excluded)}): timings taken "
              f"inside an interference burst window on a bursty side — "
              f"NOT compared, status UNKNOWN, re-run to cover: "
              + ", ".join(sorted(burst_excluded)))
    for name, o, n, r in flagged:
        print(f"REGRESSED {name}: {o:.2f}s -> {n:.2f}s ({r:.1f}x)")
    if not flagged:
        print(f"no query regressed past {threshold}x"
              + (" among the compared queries — the burst-excluded "
                 "set is STATUS-UNKNOWN, not clean"
                 if burst_excluded else ""))
    if flagged:
        return 1
    # exclusions without flags are NOT a clean bill: the excluded
    # queries were never compared — same "re-run to cover" exit as the
    # full-suppression gates, so exit-code callers cannot record the
    # round as clean on a partial comparison
    return 3 if burst_excluded else 0


if __name__ == "__main__":
    raise SystemExit(main())
