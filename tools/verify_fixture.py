#!/usr/bin/env python
"""Verify a refparity fixture directory against its pinned SHA256SUMS.

The full-scale fixture's 247MB weights are regenerate-only (gitignored);
the committed manifest pins the sha256 of the deterministic regeneration
(tools/make_refparity_fixture.py --full --steps 600, torch.manual_seed(0)
on CPU) so `make refparity-full` can prove a fresh regeneration
reproduced the exact victim the committed goldens were made from.

Usage:
    python tools/verify_fixture.py tests/fixtures/refparity_full
    python tools/verify_fixture.py <dir> --write   # (re)create manifest
"""
import argparse
import hashlib
import os
import sys

MANIFEST = "SHA256SUMS"


def sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def write_manifest(d: str) -> None:
    lines = []
    for name in sorted(os.listdir(d)):
        if name == MANIFEST or name.startswith("."):
            continue
        p = os.path.join(d, name)
        if os.path.isfile(p):
            lines.append(f"{sha256(p)}  {name}")
    with open(os.path.join(d, MANIFEST), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {os.path.join(d, MANIFEST)} ({len(lines)} entries)")


def verify(d: str) -> int:
    mpath = os.path.join(d, MANIFEST)
    if not os.path.exists(mpath):
        print(f"FAIL: no {mpath}; generate with --write", file=sys.stderr)
        return 1
    bad = missing = ok = 0
    with open(mpath) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            want, name = line.split(None, 1)
            p = os.path.join(d, name)
            if not os.path.exists(p):
                print(f"MISSING  {name}")
                missing += 1
                continue
            got = sha256(p)
            if got == want:
                ok += 1
            else:
                print(f"MISMATCH {name}\n  want {want}\n  got  {got}")
                bad += 1
    print(f"{ok} ok, {bad} mismatched, {missing} missing")
    return 0 if bad == 0 and missing == 0 else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("dir")
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()
    if args.write:
        write_manifest(args.dir)
        return 0
    return verify(args.dir)


if __name__ == "__main__":
    sys.exit(main())
