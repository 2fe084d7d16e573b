#!/usr/bin/env python
"""One-command CI: reproduce the round's green evidence.

Runs, in order, recording each stage's outcome + duration:

  1. fast test tier          python -m pytest tests/ -m "not slow" -q
  2. single-chip entry       jit-lower __graft_entry__.entry() on CPU
                             (the driver compile-checks the same callable
                             on the real chip; lowering catches tracing /
                             shape errors without a 20-min CPU compile)
  3. multi-chip dryrun       python __graft_entry__.py 8  (self-provisions
                             an 8-virtual-device CPU mesh when <8 real
                             devices are visible; hard layout asserts)
  4. (--bench) real bench    python bench.py on the attached TPU

and writes one JSON results file (--out, default CI_LAST.json) stamped
with the git HEAD, so "tests are green" is a committed artifact per
round instead of a convention. Exit code 0 iff every stage passed.

Usage:
    python tools/ci.py [--out CI_r04.json] [--bench] [--full-tier]
"""
import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _git_head() -> str:
    try:
        out = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                             capture_output=True, text=True, timeout=30)
        return out.stdout.strip()[:12] or "unknown"
    except Exception:  # noqa: BLE001
        return "unknown"


def _run(cmd, timeout, env=None) -> dict:
    t0 = time.time()
    try:
        out = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                             timeout=timeout, env=env or dict(os.environ))
        rc = out.returncode
        stdout, stderr = out.stdout, out.stderr
    except subprocess.TimeoutExpired as e:
        rc = -1
        stdout = (e.stdout or b"").decode() if isinstance(
            e.stdout, bytes) else (e.stdout or "")
        stderr = f"timeout after {timeout}s"
    tail = "\n".join((stdout.strip().splitlines() or [""])[-3:])
    return {"cmd": " ".join(cmd), "rc": rc,
            "seconds": round(time.time() - t0, 1),
            "tail": tail[-500:],
            "stderr_tail": (stderr.strip().splitlines() or [""])[-1][-300:],
            "_stdout": stdout}


def stage_tests(full_tier: bool) -> dict:
    cmd = [sys.executable, "-m", "pytest", "tests/", "-q"]
    if not full_tier:
        # "not slow" still opts IN to the slim-marked refparity tier
        # (committed full-depth parity, ~minutes) — local quick runs can
        # skip it with -m "not slow and not slim"
        cmd += ["-m", "not slow"]
    rec = _run(cmd, timeout=10800 if full_tier else 7200)
    # count from the FULL stdout, not the truncated tail: a long
    # warnings/summary footer must not flip a green run to passed=0
    stdout = rec.pop("_stdout")
    counts = {k: 0 for k in ("passed", "failed", "error")}
    for k in counts:
        m = re.findall(rf"(\d+) {k}", stdout)
        counts[k] = int(m[-1]) if m else 0
    rec["passed"] = counts["passed"]
    rec["failed"] = counts["failed"] + counts["error"]
    rec["ok"] = rec["rc"] == 0 and rec["passed"] > 0 and rec["failed"] == 0
    return rec


def stage_entry_lower() -> dict:
    code = (
        "import sys, jax\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import __graft_entry__ as g\n"
        "fn, args = g.entry()\n"
        "lowered = jax.jit(fn).lower(*args)\n"
        "outs = jax.eval_shape(fn, *args)\n"
        "print('entry lowered ok:', [o.shape for o in outs])\n"
    )
    rec = _run([sys.executable, "-c", code], timeout=600)
    stdout = rec.pop("_stdout")
    rec["ok"] = rec["rc"] == 0 and "entry lowered ok" in stdout
    return rec


def stage_dryrun(n: int) -> dict:
    rec = _run([sys.executable, "__graft_entry__.py", str(n)], timeout=900)
    stdout = rec.pop("_stdout")
    rec["ok"] = rec["rc"] == 0 and f"dryrun_multichip({n}): ok" in stdout
    return rec


def stage_bench() -> dict:
    rec = _run([sys.executable, "bench.py"], timeout=3600)
    stdout = rec.pop("_stdout")
    rec["ok"] = False
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                j = json.loads(line)
            except json.JSONDecodeError:
                continue
            rec["bench"] = j
            rec["ok"] = rec["rc"] == 0 and "error" not in j and \
                j.get("value", 0) > 0
            break
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "CI_LAST.json"))
    ap.add_argument("--bench", action="store_true",
                    help="also run the real TPU bench (adds ~2-10 min)")
    ap.add_argument("--full-tier", action="store_true",
                    help="run the full test suite incl. slow-marked tests")
    ap.add_argument("--devices", type=int, default=8,
                    help="dryrun mesh size")
    args = ap.parse_args()

    results = {"git_head": _git_head(),
               "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
               "stages": {}}
    stages = [
        ("tests", lambda: stage_tests(args.full_tier)),
        ("entry_lower", stage_entry_lower),
        ("dryrun_multichip", lambda: stage_dryrun(args.devices)),
    ]
    if args.bench:
        stages.append(("bench", stage_bench))

    all_ok = True
    for name, fn in stages:
        print(f"== {name} ==", flush=True)
        rec = fn()
        results["stages"][name] = rec
        all_ok &= rec["ok"]
        print(f"   {'PASS' if rec['ok'] else 'FAIL'} "
              f"({rec['seconds']}s)  {rec['tail'].splitlines()[-1] if rec['tail'] else ''}",
              flush=True)

    results["ok"] = all_ok
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"{'CI GREEN' if all_ok else 'CI RED'} -> {args.out}")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
