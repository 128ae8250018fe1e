"""First-party parallel pytest runner with per-file timeouts.

The environment bakes in pytest but not pytest-xdist/pytest-timeout, so
this fills both roles (VERDICT r3 item 4: CI-budget the suite):

- Dynamic work queue of test FILES over ``-n`` worker subprocesses
  (per-file pytest processes; files are the natural shard unit here —
  every test file is independent, fixtures are file- or
  function-scoped, goldens are read-only).
- A hard ``--timeout`` per file (subprocess kill) so one hung test
  can't hang a lane — the protection pytest-timeout would give, made
  process-level (a wedged C++ call ignores SIGALRM anyway).
- Per-file wall-clock recorded and printed sorted, so the slowest
  files are visible every run (the data CI budgeting needs).

Usage:
    python tools/partest.py                      # default lane (-m "not slow")
    python tools/partest.py -m slow              # examples lane
    python tools/partest.py -n 4 --timeout 900   # explicit knobs
    python tools/partest.py tests/test_md.py ... # explicit files

Exit code: 0 iff every file lane passed (pytest rc 0 or 5=no tests
collected after mark filtering).
"""

import argparse
import json
import os
import queue
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def collect_files(paths):
    files = []
    for p in paths:
        if os.path.isdir(p):
            files += [os.path.join(p, f) for f in sorted(os.listdir(p))
                      if f.startswith("test_") and f.endswith(".py")]
        else:
            files.append(p)
    return files


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="*",
                    default=[os.path.join(REPO, "tests")])
    ap.add_argument("-n", "--workers", default="auto",
                    help="worker count; auto = cpu count (>=1)")
    ap.add_argument("-m", "--markexpr", default="not slow")
    ap.add_argument("--timeout", type=float, default=1200.0,
                    help="hard per-shard wall-clock limit (seconds)")
    ap.add_argument("--per-test", action="store_true",
                    help="shard by individual TEST id instead of by "
                         "file (for single-file lanes like the 40 "
                         "example smokes, where a whole-file shard "
                         "outlives any sane timeout)")
    ap.add_argument("--json", dest="json_out", default=None,
                    help="write per-file results to this path")
    args = ap.parse_args()

    files = collect_files(args.paths or [os.path.join(REPO, "tests")])
    if args.per_test:
        cmd = [sys.executable, "-m", "pytest", *files, "-q",
               "-p", "no:cacheprovider", "-m", args.markexpr,
               "--collect-only"]
        r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
        # Test-id lines only (a warnings-summary section also prints
        # ids — a bare '::' filter would duplicate shards), in order,
        # deduplicated.  Id lines are unindented; warning-message lines
        # are indented, so indentation is the discriminator — the id
        # itself may contain spaces/brackets (parametrize ids), so the
        # whole line past the `.py::` infix is kept.
        import re
        id_re = re.compile(r"^[\w./-]+\.py::\S")
        seen = {}
        for ln in r.stdout.splitlines():
            if ln[:1].isspace():
                continue  # warning/message continuation line
            ln = ln.rstrip()
            if id_re.match(ln):
                seen.setdefault(ln, None)
        files = list(seen)
        if not files:
            print(f"no tests collected for -m {args.markexpr!r}")
            return 1
        # Cross-check against pytest's own collected-count summary so a
        # filtered-out id can never be silently dropped from the lanes.
        counts = re.findall(r"(\d+)(?:/\d+)? tests? collected",
                            r.stdout)
        if counts and int(counts[-1]) != len(files):
            print(f"collection mismatch: pytest collected {counts[-1]} "
                  f"tests but {len(files)} ids were parsed — refusing "
                  "to run an incomplete lane")
            return 1
    if args.workers == "auto":
        n_workers = max(os.cpu_count() or 1, 1)
    else:
        n_workers = max(int(args.workers), 1)
    n_workers = min(n_workers, len(files)) or 1

    todo = queue.Queue()
    for f in files:
        todo.put(f)
    results = []
    lock = threading.Lock()

    def worker():
        while True:
            try:
                f = todo.get_nowait()
            except queue.Empty:
                return
            cmd = [sys.executable, "-m", "pytest", f, "-q",
                   "-p", "no:cacheprovider", "-m", args.markexpr]
            t0 = time.monotonic()
            try:
                r = subprocess.run(cmd, cwd=REPO, capture_output=True,
                                   text=True, timeout=args.timeout)
                rc, out = r.returncode, r.stdout + r.stderr
            except subprocess.TimeoutExpired as e:
                rc = -9
                out = ((e.stdout or b"").decode(errors="replace")
                       + f"\nTIMEOUT after {args.timeout:.0f}s (killed)")
            dt = time.monotonic() - t0
            ok = rc in (0, 5)  # 5 = all tests deselected by the mark
            with lock:
                results.append({"file": os.path.relpath(f, REPO),
                                "rc": rc, "ok": ok,
                                "seconds": round(dt, 1)})
                tail = out.strip().splitlines()[-1] if out.strip() else ""
                print(f"[{len(results)}/{len(files)}] "
                      f"{'ok ' if ok else 'FAIL'} {dt:6.1f}s "
                      f"{os.path.basename(f)}  {tail[:100]}", flush=True)
                if not ok:
                    print(out[-3000:], flush=True)

    threads = [threading.Thread(target=worker) for _ in range(n_workers)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    total = time.monotonic() - t0

    results.sort(key=lambda r: -r["seconds"])
    print(f"\nslowest files (of {len(results)}, "
          f"{n_workers} workers, wall {total/60:.1f} min):")
    for r in results[:10]:
        print(f"  {r['seconds']:7.1f}s  {r['file']}")
    failed = [r for r in results if not r["ok"]]
    if args.json_out:
        with open(args.json_out, "w") as fp:
            json.dump({"wall_s": round(total, 1), "workers": n_workers,
                       "markexpr": args.markexpr, "files": results}, fp,
                      indent=1)
    if failed:
        print(f"\nFAILED files: {[r['file'] for r in failed]}")
        return 1
    print("\nall files passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
