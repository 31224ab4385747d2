"""In-repo copy-paste self-check (VERDICT r4 item 10): flag any repo source
file >60% similar to a same-named or similar-sized reference file, the same
mechanical test the build driver runs after each round — here so a
regression surfaces BEFORE the round ends.

Run: python tools/copycheck.py [--threshold 0.6] [--json]
Exit code 1 when anything is flagged.
"""

from __future__ import annotations

import argparse
import difflib
import json
import os
import sys

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
REF = "/root/reference"
SKIP_DIRS = {".git", "__pycache__", "runs", ".claude", "tests"}


def _sources(root, exts=(".py", ".cpp", ".cc", ".h")):
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if d not in SKIP_DIRS]
        for fn in filenames:
            if fn.endswith(exts):
                yield os.path.join(dirpath, fn)


def _lines(path):
    try:
        with open(path, errors="replace") as f:
            return [ln.strip() for ln in f if ln.strip()]
    except OSError:
        return []


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--threshold", type=float, default=0.6)
    p.add_argument("--json", action="store_true")
    args = p.parse_args(argv)

    ref_files = list(_sources(REF))
    ref_lines = {f: _lines(f) for f in ref_files}
    by_name = {}
    for f in ref_files:
        by_name.setdefault(os.path.basename(f).lower(), []).append(f)

    flagged = []
    checked = 0
    for mine in _sources(REPO):
        ml = _lines(mine)
        if len(ml) < 30:
            continue
        checked += 1
        cands = list(by_name.get(os.path.basename(mine).lower(), []))
        # similar-sized reference files (within 40%)
        for rf, rl in ref_lines.items():
            if rl and 0.6 <= len(rl) / max(len(ml), 1) <= 1.67:
                cands.append(rf)
        best, best_r = None, 0.0
        for rf in set(cands):
            rl = ref_lines[rf]
            if not rl:
                continue
            r = difflib.SequenceMatcher(None, ml, rl, autojunk=False).ratio()
            if r > best_r:
                best, best_r = rf, r
        if best_r > args.threshold:
            flagged.append({
                "file": os.path.relpath(mine, REPO),
                "reference": os.path.relpath(best, REF),
                "similarity": round(best_r, 3),
            })

    out = {"checked": checked, "threshold": args.threshold, "flagged": flagged}
    print(json.dumps(out) if args.json else json.dumps(out, indent=2))
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
