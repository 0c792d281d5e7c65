"""Regenerate the machine-readable sf1.0 scale-gate artifacts
(VERDICT r12 #5: the sf1.0 evidence lived only as BASELINE.md prose).

Writes, in the repo root:
  BENCH_sf1_r{N}.json        full bench at sf1.0 with spill totals
  CORRECTNESS_sf1_r{N}.json  oracle sweep at sf1.0 (49 entries via
                             check_correctness.py + fuzzy_pairs via
                             its sharded one-shot oracle dump)

Each phase runs in its own subprocess (static confs pin per JVM; the
bench needs the UI/retention confs). The quadratic fuzzy oracle dump
(/tmp/fuzzy_sf1_oracle_rows.json) is reused if present — the corpus
builder is deterministic, and fuzzy_sf1_check compares exactly, so a
stale dump fails loudly rather than silently passing.

Usage:
  python scripts/make_sf1.py                    # corpus, if absent
  python scripts/sf1_artifacts.py --round 13 [--sf-dir /tmp/lmr_sf1.0]
      [--use-bench /tmp/captured_bench_stdout]  # reuse a finished run
      [--skip-bench | --skip-correctness]
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str, use: str | None) -> dict:
    if use:
        out = open(use).read()
    else:
        env = dict(os.environ, SPARK_GRAFT_UI="true", SPARK_GRAFT_SF_DIR=sf_dir)
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, cwd=REPO,
        )
        out = p.stdout
    line = out.strip().splitlines()[-1]
    return json.loads(line)


def run_correctness(sf_dir: str) -> dict:
    sys.path.insert(0, REPO)
    import __spark_entry__ as em

    names = [n for n in em.queries() if n != "fuzzy_pairs"]
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/check_correctness.py"),
         sf_dir, *names],
        capture_output=True, text=True, cwd=REPO,
    )
    entries: dict = {}
    for m in re.finditer(
        r"^(PASS|FAIL|ROWS-ONLY) (\S+?):? (.*)$", p.stdout, re.M
    ):
        status, name, detail = m.groups()
        name = name.rstrip(":")
        entries[name] = {"status": status, "detail": detail.strip()}
    tail = [l for l in p.stdout.strip().splitlines() if "pass," in l]
    # fuzzy_pairs: exact compare against the sharded one-shot oracle
    fz = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/fuzzy_sf1_check.py"),
         sf_dir],
        capture_output=True, text=True, cwd=REPO,
    )
    try:
        fz_line = [l for l in fz.stdout.strip().splitlines()
                   if l.startswith("{")][-1]
        fuzzy = json.loads(fz_line)
        entries["fuzzy_pairs"] = {
            "status": "PASS" if fuzzy.get("exact_match") else "FAIL",
            "detail": (f"{fuzzy['spark_rows']} pairs exact vs sharded "
                       f"brute-force oracle ({fuzzy['spark_secs']}s)"),
        }
    except Exception as e:  # noqa: BLE001 — record, don't die
        entries["fuzzy_pairs"] = {"status": "FAIL",
                                  "detail": f"checker error: {e}"}
    n_pass = sum(1 for v in entries.values() if v["status"] == "PASS")
    n_fail = sum(1 for v in entries.values() if v["status"] == "FAIL")
    return {"summary": tail[-1] if tail else "",
            "n_pass": n_pass, "n_fail": n_fail,
            "n_entries": len(entries), "entries": entries}


def main() -> int:
    args = sys.argv[1:]
    def opt(name, default=None):
        if name in args:
            i = args.index(name)
            v = args[i + 1]
            del args[i:i + 2]
            return v
        return default

    rnd = int(opt("--round", "0"))
    sf_dir = opt("--sf-dir", "/tmp/lmr_sf1.0")
    use_bench = opt("--use-bench")
    if not os.path.isdir(sf_dir):
        print(f"corpus missing at {sf_dir}; run scripts/make_sf1.py first")
        return 2

    if "--skip-bench" not in args:
        bench = run_bench(sf_dir, use_bench)
        path = os.path.join(REPO, f"BENCH_sf1_r{rnd:02d}.json")
        with open(path, "w") as f:
            json.dump({"round": rnd, "sf_dir": sf_dir, "parsed": bench},
                      f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {path}: total={bench['value']}s "
              f"spill_mem={bench.get('spill_mem_mb')}MB "
              f"n_stages={bench.get('n_stages')}")

    if "--skip-correctness" not in args:
        corr = run_correctness(sf_dir)
        path = os.path.join(REPO, f"CORRECTNESS_sf1_r{rnd:02d}.json")
        with open(path, "w") as f:
            json.dump({"round": rnd, "sf_dir": sf_dir, **corr},
                      f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {path}: {corr['n_pass']} pass / {corr['n_fail']} fail "
              f"of {corr['n_entries']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
