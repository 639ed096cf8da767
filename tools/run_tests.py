"""Parallel test runner: child pytests over balanced test-file buckets.

The canonical gate stays `python -m pytest tests/ -q` (single process,
~26-31 min on this box); this runner targets the same selection in a
fraction of the wall by fanning test FILES out over worker subprocesses
(the `test_c_oracle.py` isolation pattern — each child is its own
process, which also sidesteps the vm.max_map_count ceiling the conftest
otherwise has to raise).

  python tools/run_tests.py --parallel        # all tests, N=cpu workers
  python tools/run_tests.py --parallel -n 3   # explicit worker count
  python tools/run_tests.py --quick           # TPU-path quick tier

The quick tier is the documented pre-chip_sweep selection for TPU-path
changes: the pallas kernels, their transform consumers, and the sharded
twins.  Durations are recorded to tools/.test_durations.json after each
full run and drive the next run's bucket balancing (first run balances
by file size).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS = os.path.join(ROOT, "tests")
DUR_FILE = os.path.join(ROOT, "tools", ".test_durations.json")

# TPU-path quick tier: kernels + their consumers + sharding twins
QUICK = [
    "test_pallas.py", "test_pallas_fft.py", "test_pallas_cwt.py",
    "test_pallas_scatter.py", "test_pallas_spectrogram.py",
    "test_pallas_unwrap.py", "test_spectrogram.py", "test_stft.py",
    "test_cwt.py", "test_pwt.py", "test_synsq.py", "test_st.py",
    "test_nsgt.py", "test_cqt.py", "test_mir.py", "test_sharded_full.py",
    "test_sharding.py", "test_dsp.py",
]


def _files():
    return sorted(f for f in os.listdir(TESTS)
                  if f.startswith("test_") and f.endswith(".py"))


def _buckets(files, n):
    try:
        with open(DUR_FILE) as f:
            dur = json.load(f)
    except (OSError, ValueError):
        dur = {}
    # greedy longest-first into the lightest bucket; unknown files weigh
    # by size (compile-heavy files are big files, roughly)
    def weight(f):
        return dur.get(f) or os.path.getsize(os.path.join(TESTS, f)) / 2e3

    order = sorted(files, key=weight, reverse=True)
    buckets = [[] for _ in range(n)]
    loads = [0.0] * n
    for f in order:
        i = loads.index(min(loads))
        buckets[i].append(f)
        loads[i] += weight(f)
    return [b for b in buckets if b], loads


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parallel", action="store_true")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("-n", type=int, default=0, help="worker count")
    ap.add_argument("rest", nargs="*", help="extra pytest args")
    args = ap.parse_args()

    files = QUICK if args.quick else _files()
    missing = [f for f in files
               if not os.path.exists(os.path.join(TESTS, f))]
    if missing:
        print(f"quick-tier files missing: {missing}", file=sys.stderr)
        return 2
    n = args.n or min(os.cpu_count() or 1, 4)
    if not (args.parallel or args.quick):
        ap.error("pick --parallel and/or --quick")
    if n == 1 or len(files) == 1:
        buckets = [files]
    else:
        buckets, loads = _buckets(files, n)
        print(f"{len(files)} files over {len(buckets)} workers "
              f"(est. loads: {[round(x) for x in loads]}s)")

    t0 = time.time()
    procs = []
    logs = []
    xmls = []
    handles = []
    for i, b in enumerate(buckets):
        log = os.path.join(ROOT, f".pytest_worker_{i}.log")
        xml = os.path.join(ROOT, f".pytest_worker_{i}.xml")
        logs.append(log)
        xmls.append(xml)
        cmd = [sys.executable, "-m", "pytest", "-q", f"--junitxml={xml}",
               "-o", "junit_family=xunit2",
               *args.rest, *[os.path.join(TESTS, f) for f in b]]
        fh = open(log, "w")
        handles.append(fh)
        procs.append(subprocess.Popen(
            cmd, cwd=ROOT, stdout=fh, stderr=subprocess.STDOUT))

    rc = 0
    for i, p in enumerate(procs):
        r = p.wait()
        handles[i].close()
        if r == 5:  # pytest: no tests collected (e.g. a -k filter missed
            r = 0   # every test in this bucket) — not a failure
        tail = open(logs[i]).read().splitlines()
        summary = [ln for ln in tail if " passed" in ln or " failed"
                   in ln or "error" in ln.lower()][-1:] or tail[-1:]
        print(f"worker {i} rc={r}: {summary[0] if summary else '(no output)'}")
        if r:
            rc = 1
            print(f"  full log: {logs[i]}")
            for ln in tail[-30:]:
                print("  " + ln)
    wall = time.time() - t0
    print(f"total wall: {wall:.0f}s rc={rc}")

    # refresh the balance table from the junit per-test times (summed per
    # file) so the next run's buckets balance on measured durations
    if not args.quick and rc == 0:
        import xml.etree.ElementTree as ET
        durations = {}
        for xml in xmls:
            try:
                for case in ET.parse(xml).iter("testcase"):
                    # classname is "tests.test_foo" or
                    # "tests.test_foo.TestBar" — the module is always
                    # the component right after the package
                    parts = (case.get("classname") or "").split(".")
                    mod = (parts[1] if len(parts) > 1 and parts[0] == "tests"
                           else parts[0])
                    if not mod:
                        continue
                    f = mod + ".py"
                    durations[f] = (durations.get(f, 0.0)
                                    + float(case.get("time") or 0.0))
            except (OSError, ET.ParseError):
                pass
        if durations:
            # merge into the existing table: a filtered run (extra pytest
            # args) must not discard other files' measured durations
            try:
                with open(DUR_FILE) as f:
                    merged = json.load(f)
            except (OSError, ValueError):
                merged = {}
            merged.update({k: round(v, 1) for k, v in durations.items()})
            with open(DUR_FILE, "w") as f:
                json.dump(merged, f, indent=0, sort_keys=True)
    for xml in xmls:
        try:
            os.remove(xml)
        except OSError:
            pass
    return rc


if __name__ == "__main__":
    sys.exit(main())
