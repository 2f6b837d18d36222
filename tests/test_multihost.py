"""Multi-process (multi-"host") training semantics on CPU.

Launches ``train_multiscene.py`` as two coordinated OS processes (a local
``jax.distributed`` cluster, 2 virtual CPU devices each) and checks that
each process trains and saves only its own scenes — the BASELINE.json
config-5 path (4 scenes x N hosts) at test scale: 2 scenes x 2 processes.

This is the multi-host story the reference cannot have (its rasterizer
binds one CUDA device; SURVEY.md §2.3): one jitted program spanning
processes, scene-sharded, with jax.distributed bootstrap from env vars.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def two_scenes(tmp_path_factory):
    from fixtures import make_blender_scene

    paths = []
    for i in range(2):
        p = str(tmp_path_factory.mktemp(f"scene{i}"))
        make_blender_scene(p, n_train=6, n_test=2, width=32, height=32)
        paths.append(p)
    return paths


def test_two_process_multiscene_training(two_scenes, tmp_path):
    port = _free_port()
    outs = [str(tmp_path / "outA"), str(tmp_path / "outB")]
    iters = 40
    procs = []
    logs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            GSJAX_PLATFORM="cpu",
            GSJAX_COORDINATOR=f"127.0.0.1:{port}",
            GSJAX_NUM_PROCESSES="2",
            GSJAX_PROCESS_ID=str(pid),
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_PLATFORMS="cpu",
        )
        env.pop("PYTEST_CURRENT_TEST", None)
        log = open(str(tmp_path / f"proc{pid}.log"), "w")
        logs.append(log)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "train_multiscene.py",
                    "-s", *two_scenes, "-m", *outs,
                    "--iterations", str(iters),
                    "--save_iterations", str(iters),
                    "--capacity", "128",
                    "--steps_per_dispatch", "10",
                ],
                cwd=REPO, env=env, stdout=log, stderr=subprocess.STDOUT,
            )
        )
    try:
        for p in procs:
            assert p.wait(timeout=900) == 0, _dump(tmp_path)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for log in logs:
            log.close()

    # each scene was saved exactly once, by its owning process
    from gsjax.models.gaussians import load_gaussian_ply

    for out in outs:
        ply = os.path.join(
            out, "point_cloud", f"iteration_{iters}", "point_cloud.ply"
        )
        assert os.path.exists(ply), _dump(tmp_path)
        state = load_gaussian_ply(ply, capacity=128)
        xyz = np.asarray(state.params["xyz"])[: int(state.num_active)]
        assert np.isfinite(xyz).all() and len(xyz) > 0

    # the bootstrap really was multi-process: each log names its process
    log0 = open(str(tmp_path / "proc0.log")).read()
    assert "process 0 owns scenes [0]" in log0, log0[-2000:]


def _dump(tmp_path):
    msg = []
    for pid in range(2):
        f = str(tmp_path / f"proc{pid}.log")
        if os.path.exists(f):
            msg.append(f"--- proc{pid} ---\n" + open(f).read()[-3000:])
    return "\n".join(msg)
