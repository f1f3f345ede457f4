#!/usr/bin/env python
"""Pre-snapshot gate: run this before every end-of-round commit.

The reference checks in a hard regression rule — fail on >5% regression vs
the recorded baseline (/root/reference/docs/perf-targets.md:232-237) and
"conformance before throughput" (:52-54). This script is that rule for this
repo; a snapshot that hasn't passed it is not shippable.

Stages (each must pass):
  1. full pytest on the virtual 8-device CPU mesh (tests/conftest.py forces it)
  2. __graft_entry__.dryrun_multichip(8) on a forced 8-CPU mesh (both passes)
  3. bench.py --smoke on the default backend (end-to-end engine run)
  4. regression check: latest BENCH_r*.json roofline_frac/value vs the bench
     smoke is shape-incomparable, so the gate compares the *recorded* history:
     with --bench-full it re-runs the headline 7B bench and fails on >5%
     decode-rate regression vs the best recorded round.

Usage: python tools/preflight.py [--bench-full] [--skip-pytest]
Exit code 0 = gate passed.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(name: str, cmd: list[str], env: dict | None = None,
        timeout: int = 3600) -> tuple[bool, str]:
    t0 = time.time()
    print(f"[preflight] {name}: {' '.join(cmd)}", flush=True)
    e = dict(os.environ)
    if env:
        e.update(env)
    try:
        p = subprocess.run(cmd, cwd=REPO, env=e, timeout=timeout,
                           capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        print(f"[preflight] {name}: TIMEOUT after {timeout}s", flush=True)
        return False, ""
    ok = p.returncode == 0
    dt = time.time() - t0
    tail = "\n".join((p.stdout + p.stderr).strip().splitlines()[-8:])
    print(f"[preflight] {name}: {'ok' if ok else 'FAIL'} ({dt:.0f}s)",
          flush=True)
    if not ok:
        print(tail, flush=True)
    return ok, p.stdout


def best_recorded_decode() -> float | None:
    """Best headline decode tok/s over all recorded rounds (same preset)."""
    best = None
    for f in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        try:
            d = json.load(open(f))
            parsed = d.get("parsed") or {}
            if "7B" in str(parsed.get("metric", "")):
                v = float(parsed.get("value", 0))
                best = v if best is None else max(best, v)
        except Exception:
            continue
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench-full", action="store_true",
                    help="re-run the headline 7B bench and apply the >5% "
                         "regression rule vs the best recorded round")
    ap.add_argument("--skip-pytest", action="store_true")
    args = ap.parse_args()
    failures = []

    if not args.skip_pytest:
        ok, _ = run("pytest", [sys.executable, "-m", "pytest", "tests/",
                               "-q", "--tb=line"], timeout=1800)
        if not ok:
            failures.append("pytest")

    ok, _ = run("dryrun_multichip(8)", [
        sys.executable, "-c",
        "import os; os.environ['ZGML_TPU_INTERPRET']='1'\n"
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        env={"XLA_FLAGS": "--xla_force_host_platform_device_count=8",
             "JAX_PLATFORMS": "cpu"}, timeout=1200)
    if not ok:
        failures.append("dryrun_multichip")

    ok, out = run("bench --smoke", [sys.executable, "bench.py", "--smoke"],
                  timeout=1200)
    if not ok:
        failures.append("bench-smoke")

    if args.bench_full:
        ok, out = run("bench (headline 7B)", [sys.executable, "bench.py"],
                      timeout=3600)
        if not ok:
            failures.append("bench-full")
        else:
            m = re.search(r'\{.*"value".*\}', out)
            cur = json.loads(m.group(0))["value"] if m else 0.0
            best = best_recorded_decode()
            if best is not None and cur < 0.95 * best:
                print(f"[preflight] REGRESSION: decode {cur:.1f} tok/s is "
                      f">5% below best recorded {best:.1f} tok/s", flush=True)
                failures.append("bench-regression")
            else:
                print(f"[preflight] decode {cur:.1f} tok/s vs best recorded "
                      f"{best} (gate: >= 95%)", flush=True)

    if failures:
        print(f"[preflight] GATE FAILED: {', '.join(failures)}", flush=True)
        return 1
    print("[preflight] GATE PASSED", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
