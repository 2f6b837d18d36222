"""Filesystem helpers (reference: utils/system_utils.py:16-28)."""

from __future__ import annotations

import os


def mkdir_p(path):
    os.makedirs(path, exist_ok=True)


def search_for_max_iteration(folder):
    iters = [
        int(name.split("_")[-1])
        for name in os.listdir(folder)
        if name.startswith("iteration_")
    ]
    return max(iters) if iters else None
