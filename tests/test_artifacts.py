"""Artifact subsystem round-trips (reference wandb_utils.py:80-306 parity):
dataset artifact up/download, model artifact with aliases/metadata, and
``wandb-artifact://`` trainer resume — all against the offline LocalBackend
(this image has no wandb package)."""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from mmidet_tpu.utils.artifacts import (LocalBackend, get_run_info,
                                        is_artifact_path,
                                        log_dataset_artifact,
                                        log_model_artifact,
                                        resolve_data_artifacts,
                                        resume_from_artifact)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    from mmidet_tpu.data.synthetic import make_synthetic_pair_dataset
    root = tmp_path_factory.mktemp("synth")
    yaml_path = make_synthetic_pair_dataset(str(root), n=6, img=96)
    import yaml
    with open(yaml_path) as fh:
        return yaml_path, yaml.safe_load(fh)


def test_run_info_parsing():
    rid, proj, name = get_run_info("wandb-artifact://myproj/abc123")
    assert (rid, proj, name) == ("abc123", "myproj", "run_abc123_model")
    assert is_artifact_path("wandb-artifact://p/x")
    assert not is_artifact_path("/data/M3FD")


def test_dataset_artifact_roundtrip(synth, tmp_path):
    """Upload the paired synthetic set, resolve the artifact paths back,
    and load the result with PairedDataset — labels must survive."""
    _, data = synth
    be = LocalBackend(root=str(tmp_path / "store"))
    logged = log_dataset_artifact(data, be,
                                  out_yaml=str(tmp_path / "data_wandb.yaml"))
    for k in ("train_rgb", "train_ir", "val_rgb", "val_ir"):
        assert is_artifact_path(logged[k]), logged[k]
    assert os.path.isfile(tmp_path / "data_wandb.yaml")

    resolved = resolve_data_artifacts(logged, be)
    from mmidet_tpu.data.datasets import PairedDataset
    ds = PairedDataset(resolved["train_rgb"], resolved["train_ir"], nc=2)
    assert len(ds) == 6
    assert any(len(l) for l in ds.labels), "labels lost in the round-trip"
    s = ds[0]
    assert s["rgb"].shape == s["ir"].shape


def test_dataset_artifact_versions(synth, tmp_path):
    """Re-logging bumps the version; 'latest' follows, v0 stays pinned."""
    _, data = synth
    be = LocalBackend(root=str(tmp_path / "store"))
    log_dataset_artifact(data, be)
    log_dataset_artifact(data, be)
    latest = be.download("train_rgb:latest")
    assert latest.endswith("v1")
    assert be.download("train_rgb:v0").endswith("v0")
    with pytest.raises(FileNotFoundError):
        be.download("train_rgb:nope")


def test_model_artifact_aliases_and_resume_gate(tmp_path):
    be = LocalBackend(root=str(tmp_path / "store"), project="proj")
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    (ckpt / "state.bin").write_bytes(b"\x00" * 16)
    log_model_artifact(be, "run7", str(ckpt), epoch=0, total_epochs=3,
                       fitness=0.1, best=False, project="proj",
                       opt={"epochs": 3})
    log_model_artifact(be, "run7", str(ckpt), epoch=1, total_epochs=3,
                       fitness=0.5, best=True, project="proj",
                       opt={"epochs": 3})
    # alias map: latest == best == v1, "epoch 1" pinned to v0
    assert be.download("proj/run_run7_model:latest").endswith("v1")
    assert be.download("proj/run_run7_model:best").endswith("v1")
    assert be.download("proj/run_run7_model:epoch 1").endswith("v0")

    local, meta = resume_from_artifact("wandb-artifact://proj/run7", be)
    assert meta["epochs_trained"] == 2 and meta["fitness_score"] == 0.5
    assert os.path.isfile(os.path.join(local, "ckpt", "state.bin")) or \
        os.path.isfile(os.path.join(local, "state.bin"))

    # finished-run refusal (ref wandb_utils.py:172-177)
    log_model_artifact(be, "run7", str(ckpt), epoch=2, total_epochs=3,
                       fitness=0.6, project="proj")
    with pytest.raises(AssertionError):
        resume_from_artifact("wandb-artifact://proj/run7", be)


def test_trainer_artifact_resume_end_to_end(synth, tmp_path, monkeypatch):
    """Train 1 epoch with --log-artifacts, then resume the run from its
    wandb-artifact:// reference: epoch counter and stored total epochs must
    carry over through the artifact store."""
    monkeypatch.setenv("MMIDET_ARTIFACT_ROOT", str(tmp_path / "store"))
    yaml_path, _ = synth
    from mmidet_tpu.train.trainer import TrainConfig, train
    cfg = TrainConfig(model="yolov5s_add", data=yaml_path, epochs=1,
                      batch_size=2, img_size=64, mosaic_prob=0.0,
                      dtype="float32", autoanchor=False, eval_every=1,
                      workdir=str(tmp_path / "runs/exp"),
                      log_artifacts=True)
    out = train(cfg)
    run_id = os.path.basename(out["workdir"])
    store = LocalBackend(root=str(tmp_path / "store"))
    art = store.download(f"run_{run_id}_model:latest")
    meta = store.metadata(f"run_{run_id}_model:latest")
    assert meta["epochs_trained"] == 1 and meta["total_epochs"] == 1
    assert os.path.isdir(os.path.join(art, "ckpt"))
    assert meta["opt"]["epochs"] == 1
    # per-epoch progress artifact (val prediction dump) rode along
    prog = store.download(f"run_{run_id}_progress:latest")
    assert os.path.isfile(os.path.join(prog, "val_predictions.json"))
    assert "mAP50" in store.metadata(f"run_{run_id}_progress:latest")

    # emulate an interrupted longer run: same checkpoint, total_epochs=2
    # (a live interruption would leave exactly this artifact state)
    log_model_artifact(store, run_id, os.path.join(art, "ckpt"),
                       epoch=0, total_epochs=2, fitness=0.0,
                       opt={"epochs": 2})
    cfg2 = TrainConfig(model="yolov5s_add", data=yaml_path, epochs=5,
                       batch_size=2, img_size=64, mosaic_prob=0.0,
                       dtype="float32", autoanchor=False, notest=True,
                       workdir=str(tmp_path / "runs/resumed"),
                       resume=f"wandb-artifact://mmidet_tpu/{run_id}")
    out2 = train(cfg2)
    # resumed run restored total_epochs=2 from the artifact metadata
    # (NOT the cfg2 value 5) and continued from epoch 1
    with open(os.path.join(out2["workdir"], "results.txt")) as fh:
        lines = fh.read().strip().splitlines()
    assert lines and lines[-1].startswith("1/1")
