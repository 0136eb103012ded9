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


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    def queries_of(path: str) -> dict[str, float]:
        d = json.load(open(path))
        # the driver wraps bench.py's JSON line under "parsed"; fall
        # back to the raw tail fragment when parsing failed driver-side
        p = d.get("parsed") or (d if "queries" in d else None)
        if p is not None:
            return p["queries"]
        q = _from_tail(d.get("tail", ""))
        if not q:
            raise SystemExit(f"{path}: no parsed queries and no "
                             f"recoverable tail fragment")
        print(f"note: {path} parsed=null — recovered "
              f"{len(q)} queries from its tail fragment")
        return q

    old = queries_of(sys.argv[1])
    new = queries_of(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0

    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    flagged = []
    for name in sorted(set(old) & set(new)):
        ratio = new[name] / old[name] if old[name] else float("inf")
        if ratio > threshold:
            flagged.append((name, old[name], new[name], ratio))

    shared = set(old) & set(new)
    t_old = sum(old[n] for n in shared)
    t_new = sum(new[n] for n in shared)
    print(f"shared {len(shared)} queries: {t_old:.1f}s -> {t_new:.1f}s "
          f"({t_new / t_old:.2f}x)" if shared else "no shared queries")
    if added:
        print(f"added ({len(added)}):", ", ".join(added))
    if removed:
        print(f"removed ({len(removed)}):", ", ".join(removed))
    for name, o, n, r in flagged:
        print(f"REGRESSED {name}: {o:.2f}s -> {n:.2f}s ({r:.1f}x)")
    if not flagged:
        print(f"no query regressed past {threshold}x")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
