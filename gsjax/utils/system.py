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


def safe_state(quiet: bool = False, seed: int = 0):
    """Reference ``safe_state`` parity (utils/general_utils.py:112-133):
    wrap stdout so every line ends with a timestamp, silence under
    ``--quiet``, and seed python/numpy (JAX keys are explicit; the device
    is whatever JAX selected rather than a pinned cuda:0)."""
    import random
    import sys
    from datetime import datetime

    import numpy as np

    old_f = sys.stdout

    class F:
        def write(self, x):
            if not quiet:
                if x.endswith("\n"):
                    old_f.write(
                        x.replace(
                            "\n",
                            " [{}]\n".format(
                                datetime.now().strftime("%d/%m %H:%M:%S")
                            ),
                        )
                    )
                else:
                    old_f.write(x)

        def flush(self):
            old_f.flush()

    sys.stdout = F()
    random.seed(seed)
    np.random.seed(seed)


def to_device_chunked(x, max_bytes: int = 96 << 20):
    """Host -> device transfer in bounded slices along axis 0.

    A single large transfer through the remote-device tunnel rides the
    compile endpoint's HTTP payload (rejected with 413 above ~256MB) and
    a ~300MB device_put can wedge the remote worker outright; slicing the
    transfer sidesteps both. No-op cheap for small arrays and for values
    that are already on device.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    if isinstance(x, jax.Array):
        return x
    x = np.ascontiguousarray(x)
    if x.nbytes <= max_bytes or x.ndim == 0 or x.shape[0] <= 1:
        return jnp.asarray(x)
    rows = max(1, int(max_bytes // max(x.nbytes / x.shape[0], 1)))
    return jnp.concatenate(
        [jnp.asarray(x[i:i + rows]) for i in range(0, x.shape[0], rows)],
        axis=0,
    )
