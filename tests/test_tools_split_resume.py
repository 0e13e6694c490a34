"""Tests for the dataset splitter (reference split_M3FD-8-2.py:6-50) and the
interrupted-run finder (reference utils/aws/resume.py:1-37)."""

import os
import sys

import numpy as np
import pytest
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def _make_m3fd_tree(root, n=10):
    from PIL import Image
    for sub in ("Vis", "Ir", "labels"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        img = (rng.random((8, 8, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, "Vis", f"{i:05d}.png"))
        Image.fromarray(255 - img).save(
            os.path.join(root, "Ir", f"{i:05d}.png"))
        with open(os.path.join(root, "labels", f"{i:05d}.txt"), "w") as fh:
            fh.write("0 0.5 0.5 0.2 0.2\n")


def test_create_split_keeps_modalities_aligned(tmp_path):
    from tools.split_dataset import create_split

    root = str(tmp_path)
    _make_m3fd_tree(root, n=10)
    create_split(root, ratio=0.8, seed=0)

    def basenames(split, sub):
        d = os.path.join(root, split, sub)
        return sorted(os.path.splitext(f)[0] for f in os.listdir(d))

    train_v = basenames("train_8_2", "Vis")
    val_v = basenames("val_8_2", "Vis")
    assert len(train_v) == 8 and len(val_v) == 2
    assert not set(train_v) & set(val_v)
    for split in ("train_8_2", "val_8_2"):
        v = basenames(split, "Vis")
        assert basenames(split, "Ir") == v          # paired alignment
        assert basenames(split, "labels") == v      # labels follow images


def test_create_split_deterministic_per_seed(tmp_path):
    from tools.split_dataset import create_split

    r1, r2 = str(tmp_path / "a"), str(tmp_path / "b")
    for r in (r1, r2):
        _make_m3fd_tree(r, n=10)
        create_split(r, ratio=0.8, seed=7)
    v1 = sorted(os.listdir(os.path.join(r1, "val_8_2", "Vis")))
    v2 = sorted(os.listdir(os.path.join(r2, "val_8_2", "Vis")))
    assert v1 == v2


def _make_run(root, name, epochs, last_epoch):
    workdir = os.path.join(root, name)
    os.makedirs(os.path.join(workdir, "ckpt", str(last_epoch)))
    with open(os.path.join(workdir, "opt.yaml"), "w") as fh:
        yaml.safe_dump({"epochs": epochs, "model": "yolov5t_add"}, fh)
    return workdir


def test_find_interrupted(tmp_path):
    from tools.resume_all import find_interrupted

    root = str(tmp_path)
    w_int = _make_run(root, "interrupted", epochs=10, last_epoch=3)
    _make_run(root, "finished", epochs=10, last_epoch=9)
    os.makedirs(os.path.join(root, "no_ckpt"))
    with open(os.path.join(root, "no_ckpt", "opt.yaml"), "w") as fh:
        yaml.safe_dump({"epochs": 10}, fh)

    found = find_interrupted(root)
    assert [w for w, _, _ in found] == [w_int]
    _, opt, last = found[0]
    assert last == 3 and opt["epochs"] == 10
