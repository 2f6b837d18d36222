#!/usr/bin/env python
"""Fail loudly on malformed committed evidence (VERDICT r4 weak #2 /
next-round #5b: a crashed rerun's one-line stdout corpse shipped as a
round headline — parse everything BEFORE committing).

Checks every ``*.json`` under evidence/ parses as JSON and every
``*.jsonl`` parses line-by-line. Exit 1 with a listing otherwise.

Usage: python scripts/validate_evidence.py   (run from anywhere)
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "evidence"
)


def main():
    bad = []
    n = 0
    for dirpath, _, files in os.walk(ROOT):
        for name in files:
            path = os.path.join(dirpath, name)
            rel = os.path.relpath(path, ROOT)
            try:
                if name.endswith(".json"):
                    n += 1
                    with open(path) as f:
                        json.load(f)
                elif name.endswith(".jsonl"):
                    n += 1
                    with open(path) as f:
                        for i, line in enumerate(f, 1):
                            if line.strip():
                                json.loads(line)
            except Exception as e:  # noqa: BLE001 — report, don't raise
                bad.append(f"{rel}: {type(e).__name__}: {e}")
    if bad:
        print(f"MALFORMED evidence ({len(bad)} of {n} checked):")
        for b in bad:
            print(" ", b)
        return 1
    print(f"evidence ok: {n} json/jsonl files parse")
    return 0


if __name__ == "__main__":
    sys.exit(main())
