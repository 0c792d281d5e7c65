"""Bench-noise arbitration as a diff, not prose (VERDICT r12 #4).

QUIET_REFS.json records, per bench key, the quiet-box min-of-N seconds
measured on an idle box at sf0.1, with the round and code state that
produced it. This script compares any BENCH_r{N}.json (or a raw bench
JSON line) against those references and flags ONLY keys whose driver
number exceeds quiet_ref x BAND — everything else is inside the
documented box band and needs no arbitration.

Usage:
    python scripts/compare_quiet.py BENCH_r13.json [--band 2.0]
    python bench.py | tail -1 | python scripts/compare_quiet.py -
    python scripts/compare_quiet.py --refs QUIET_REFS_sf1.json BENCH_sf1_r14.json

Regenerate the references after perf-relevant changes:
    python bench.py 2>/dev/null | tail -1 > /tmp/quiet.json
    python scripts/compare_quiet.py --update /tmp/quiet.json --round 13

The sf1.0 references live in QUIET_REFS_sf1.json (VERDICT r13 #7 —
scale-regression arbitration as a diff too): pass --refs to compare
a BENCH_sf1_r{N}.json against them, and --refs + --sf 1.0 with
--update to regenerate them.

Band rationale: BASELINE.md's 5-run spread evidence shows 31-37 of 48
sub-second keys moving >±10% run-to-run, and the r12 driver box ran
this suite's keys up to ~1.6x slower than the quiet box; 2.0x of the
quiet min-of-N is therefore the arbitration line (it is also the
judge's perf gate multiplier).
"""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFS_PATH = os.path.join(REPO, "QUIET_REFS.json")


def load_bench(arg: str) -> dict:
    raw = sys.stdin.read() if arg == "-" else open(arg).read()
    d = json.loads(raw)
    # driver artifacts wrap the parsed line under "parsed"
    if "parsed" in d:
        d = d["parsed"]
    return d


def wave_banner(bench: dict, refs: dict | None = None) -> str | None:
    """Machine arbitration of a co-tenant interference wave from the
    artifact's own evidence (VERDICT r14 #1): the single-thread CPU
    probe slowing >1.4x across the run, the ALL-CORES Spark probe
    slowing >1.4x across the run or vs the quiet-window level stored
    in the refs (the r15 mode: parallel throughput stolen while any
    one core stays fast), or a pre-run 1-minute load average over
    half the cores BEFORE this process generated any load — all say
    the box, not the code, moved. Returns the banner line, or None
    when the evidence is quiet."""
    info = bench.get("interference")
    if not info:
        return None
    b, a = info.get("before", {}), info.get("after", {})
    ncpu = info.get("ncpu") or os.cpu_count() or 1
    reasons = []
    pb, pa = b.get("probe_ms"), a.get("probe_ms")
    if pb and pa and pa / pb > 1.4:
        reasons.append(
            f"single-thread probe slowed {pa / pb:.2f}x across the run "
            f"({pb:.0f} -> {pa:.0f} ms)"
        )
    sb, sa = b.get("spark_probe_ms"), a.get("spark_probe_ms")
    if sb and sa and sa / sb > 1.4:
        reasons.append(
            f"all-cores Spark probe slowed {sa / sb:.2f}x across the "
            f"run ({sb:.0f} -> {sa:.0f} ms)"
        )
    bb, ba = b.get("blas_probe_ms"), a.get("blas_probe_ms")
    if bb and ba and max(ba, bb) / min(ba, bb) > 2.0:
        reasons.append(
            "memory-bandwidth (BLAS) probe unstable across the run "
            f"({bb:.0f} / {ba:.0f} ms) — dense-kernel keys "
            "(neardup_blocked, pq_*) unreliable this window"
        )
    ref_blas = (refs or {}).get("blas_probe_ms")
    run_blas = min(x for x in (bb, ba) if x) if (bb or ba) else None
    if ref_blas and run_blas and run_blas / ref_blas > 2.0:
        reasons.append(
            f"BLAS probe {run_blas:.0f} ms vs quiet-window "
            f"{ref_blas:.0f} ms = {run_blas / ref_blas:.2f}x (memory "
            "bandwidth stolen — dense-kernel keys unreliable)"
        )
    ref_probe = (refs or {}).get("spark_probe_ms")
    run_probe = min(x for x in (sb, sa) if x) if (sb or sa) else None
    if ref_probe and run_probe and run_probe / ref_probe > 1.4:
        reasons.append(
            f"all-cores Spark probe {run_probe:.0f} ms vs quiet-window "
            f"{ref_probe:.0f} ms = {run_probe / ref_probe:.2f}x (box "
            "slower than when the refs were taken)"
        )
    load = b.get("loadavg_1m")
    if load is not None and load == load and load > 0.5 * ncpu:
        reasons.append(
            f"pre-run loadavg_1m {load:.1f} on {ncpu} cores (box was "
            "busy before this run started)"
        )
    if not reasons:
        return None
    return (
        "WAVE SUSPECTED — discount OVER flags on this artifact: "
        + "; ".join(reasons)
    )


def main() -> int:
    args = sys.argv[1:]
    band = 2.0
    refs_path = REFS_PATH
    sf = 0.1
    if "--band" in args:
        i = args.index("--band")
        band = float(args[i + 1])
        del args[i : i + 2]
    if "--refs" in args:
        i = args.index("--refs")
        refs_path = os.path.join(REPO, args[i + 1])
        del args[i : i + 2]
    if "--sf" in args:
        i = args.index("--sf")
        sf = float(args[i + 1])
        del args[i : i + 2]

    if args and args[0] == "--update":
        src = args[1]
        rnd = None
        if "--round" in args:
            rnd = int(args[args.index("--round") + 1])
        bench = load_bench(src)
        queries = bench["queries"]
        refs = {
            "round": rnd,
            "unit": "sec",
            "sf": sf,
            "method": "bench.py min-of-N per key on an idle box",
            "keys": {k: v for k, v in sorted(queries.items())},
        }
        # pin the quiet window's all-cores throughput level so later
        # artifacts can self-arbitrate "box slower than the refs"
        for field in ("spark_probe_ms", "blas_probe_ms"):
            probes = [
                s.get(field)
                for s in bench.get("interference", {}).values()
                if isinstance(s, dict) and s.get(field)
            ]
            if probes:
                refs[field] = min(probes)
        with open(refs_path, "w") as f:
            json.dump(refs, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {refs_path}: {len(queries)} keys (round {rnd})")
        return 0

    if not args:
        print(__doc__)
        return 2
    bench = load_bench(args[0])
    queries = bench["queries"]
    refs = json.load(open(refs_path))
    banner = wave_banner(bench, refs)
    if banner:
        print(banner)
    # r16: per-key wave brackets — bench.py snapshots probes every
    # ~10 keys and brackets each key into a window with a wavy bit,
    # so an OVER flag can name its own interference evidence instead
    # of inheriting one whole-run banner
    info = bench.get("interference", {})
    wavy_keys: dict[str, str] = {}
    for i, w in enumerate(info.get("windows", [])):
        if w.get("wavy"):
            ev = "; ".join(w.get("evidence", [])) or "wavy bracket"
            for k in w.get("keys", []):
                wavy_keys[k] = f"window {i}: {ev}"
    retimed = set(info.get("retimed", []))
    if wavy_keys:
        note = info.get("retime_note")
        print(
            f"{len(wavy_keys)} keys bracketed by wavy probe windows"
            + (f" — {note}" if note else "")
        )
    keys = refs["keys"]
    over, missing = [], []
    for k, v in sorted(queries.items()):
        ref = keys.get(k)
        if ref is None:
            missing.append(k)
            continue
        if v > ref * band:
            over.append((k, ref, v, v / ref))
    for k, ref, v, ratio in over:
        tag = ""
        if k in wavy_keys:
            tag = f"  [WAVY {wavy_keys[k]}"
            tag += "; re-timed, still over]" if k in retimed else "]"
        print(f"OVER  {k}: {v:.3f}s vs quiet {ref:.3f}s = {ratio:.2f}x "
              f"(band {band}x){tag}")
    for k in missing:
        print(f"NEW   {k}: {queries[k]:.3f}s (no quiet ref — add one)")
    ok = len(queries) - len(over) - len(missing)
    print(f"{ok} keys inside band, {len(over)} over, {len(missing)} new "
          f"(quiet refs from round {refs.get('round')})")
    return 1 if over else 0


if __name__ == "__main__":
    sys.exit(main())
