"""CLI surface tests: train -> render -> metrics round trip on a tiny
synthetic scene (reference entry points P1-P3, SURVEY.md §2.1)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fixtures import make_blender_scene  # noqa: E402


@pytest.fixture(scope="module")
def trained_model(tmp_path_factory):
    scene_dir = str(tmp_path_factory.mktemp("scene"))
    model_dir = str(tmp_path_factory.mktemp("model"))
    make_blender_scene(scene_dir, n_train=6, n_test=2, width=64, height=64)

    import train

    train.main(
        [
            "-s", scene_dir, "-m", model_dir, "--eval",
            "--iterations", "40", "--test_iterations", "40",
            "--save_iterations", "40", "--disable_viewer", "--quiet",
            "--densify_from_iter", "1000",
        ]
    )
    return model_dir


def test_render_cli_writes_sets(trained_model):
    import render

    render.main(["-m", trained_model, "--quiet"])
    for split, count in [("train", 6), ("test", 2)]:
        rdir = os.path.join(trained_model, split, "ours_40", "renders")
        gdir = os.path.join(trained_model, split, "ours_40", "gt")
        assert len(os.listdir(rdir)) == count
        assert len(os.listdir(gdir)) == count


def test_metrics_cli_writes_results(trained_model):
    import metrics

    results = metrics.evaluate([trained_model])
    out = os.path.join(trained_model, "results.json")
    assert os.path.exists(out)
    with open(out) as f:
        res = json.load(f)
    assert "ours_40" in res
    assert 0.0 < res["ours_40"]["SSIM"] <= 1.0
    assert res["ours_40"]["PSNR"] > 5.0


def test_cfg_args_roundtrip(trained_model):
    from gsjax.configs import load_cfg_args

    cfg = load_cfg_args(trained_model)
    assert cfg["sh_degree"] == 3
    assert cfg["white_background"] is False


def test_convert_cli_requires_colmap(tmp_path, monkeypatch, capsys):
    """convert.py exits with a clear message when colmap is missing."""
    import shutil

    import convert

    monkeypatch.setattr(shutil, "which", lambda _: None)
    with pytest.raises(SystemExit) as e:
        convert.main(["-s", str(tmp_path)])
    assert e.value.code == 1
    assert "colmap" in capsys.readouterr().out.lower()


def test_metrics_cli_survives_missing_model(tmp_path, capsys):
    import metrics

    results = metrics.evaluate([str(tmp_path / "nonexistent")])
    assert results == {}
    assert "Unable to compute metrics" in capsys.readouterr().out


def test_scene_rejects_unknown_source(tmp_path):
    from gsjax.configs import ModelParams
    from gsjax.train.scene import Scene

    model = ModelParams(
        source_path=str(tmp_path), model_path=str(tmp_path / "out")
    )
    with pytest.raises(Exception):
        Scene(model)


def test_render_bench_script(trained_model, capsys):
    """scripts/render_bench.py loads a saved model and prints the one-line
    JSON fps record (CPU here; the number only means something on TPU)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import render_bench

    render_bench.main(["-m", trained_model, "--views", "2"])
    line = [l for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["unit"] == "frames/s" and rec["value"] > 0
    assert rec["extra"]["n_views"] == 2
