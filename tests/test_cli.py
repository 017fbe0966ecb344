"""CLI integration tests (argparse wiring + dataset-branch selection).

The heavy CLI surfaces are driven live on hardware (scripts/e2e_gate.py,
BASELINE.md runs); these cover the argument plumbing that no other test
exercises: the CSV training path (lineage ``--dataset csv`` parity,
SURVEY.md §2 #18) and the data-argument validation errors."""

import os
import sys

import numpy as np
import pytest


def _make_csv_set(root):
    from PIL import Image

    rng = np.random.default_rng(3)
    lines = []
    for i in range(4):
        img = rng.integers(0, 255, (96, 128, 3)).astype(np.uint8)
        img[20:60, 30:90] = [200, 40, 40]
        name = f"img{i}.jpg"
        Image.fromarray(img).save(os.path.join(root, name))
        lines.append(f"{name},30,20,90,60,thing")
    with open(os.path.join(root, "train.csv"), "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(root, "classes.csv"), "w") as f:
        f.write("thing,0\n")


def _run_train_cli(argv, monkeypatch):
    from detjax.cli import train as train_cli

    monkeypatch.setattr(sys, "argv", ["detjax-train"] + argv)
    train_cli.main()


def test_train_cli_csv_path(tmp_path, monkeypatch, capsys):
    _make_csv_set(str(tmp_path))
    _run_train_cli(
        ["--csv-train", str(tmp_path / "train.csv"),
         "--csv-classes", str(tmp_path / "classes.csv"),
         "--train-images", str(tmp_path),
         "--steps", "2",
         "--set", "model.image_size=(64,64)",
         "--set", "model.backbone_depth=18",
         "--set", "train.batch_size=2",
         "--set", "train.eval_every_steps=1000000",
         "--set", "train.checkpoint_every_steps=1000000"],
        monkeypatch)
    out = capsys.readouterr().out
    # num_classes auto-adopted from the class map (80-class preset → 1)
    assert "num_classes=1" in out
    assert "done: step=2" in out


def test_train_cli_spatial_mesh(monkeypatch, capsys):
    """--spatial K builds the 2-D (data, space) mesh and trains on it
    (synthetic data; 8 virtual CPU devices → data=4, space=2)."""
    _run_train_cli(
        ["--synthetic", "--spatial", "2", "--steps", "2",
         "--set", "model.image_size=(64,64)",
         "--set", "model.backbone_depth=18",
         "--set", "model.num_classes=4",
         "--set", "train.batch_size=4",
         "--set", "train.eval_every_steps=1000000",
         "--set", "train.checkpoint_every_steps=1000000"],
        monkeypatch)
    out = capsys.readouterr().out
    assert "'space': 2" in out and "DP×SP" in out
    assert "done: step=2" in out


def test_train_cli_requires_a_dataset(monkeypatch, capsys):
    with pytest.raises(SystemExit):
        _run_train_cli(["--steps", "1"], monkeypatch)
    assert "--csv-train or" in capsys.readouterr().err


def test_train_cli_csv_requires_classes(tmp_path, monkeypatch, capsys):
    with pytest.raises(SystemExit):
        _run_train_cli(["--csv-train", str(tmp_path / "x.csv")], monkeypatch)
    assert "--csv-classes" in capsys.readouterr().err
