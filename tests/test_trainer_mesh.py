"""Production multi-chip training (VERDICT r4 #1): the ('data','model')
mesh wired into ``trainer.train`` — not just the dryrun harness.

The reference's default multi-GPU modes are DataParallel (train.py:641-643)
and DDP (train.py:683-686); here GSPMD shards the batch over 'data' (psum
implicit) and wide kernels optionally over 'model'."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from mmidet_tpu.train.trainer import TrainConfig, setup_mesh, train


@pytest.fixture(scope="module")
def data_yaml(tmp_path_factory):
    from mmidet_tpu.data.synthetic import make_synthetic_pair_dataset
    root = tmp_path_factory.mktemp("synth_mesh")
    return make_synthetic_pair_dataset(str(root), n=4, img=96)


def test_setup_mesh_shapes():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest should provide 8 CPU devices"
    mesh, bsh = setup_mesh(TrainConfig(batch_size=8, n_model=2))
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    # clamp: batch 3 over 8 devices -> data axis 3
    mesh, _ = setup_mesh(TrainConfig(batch_size=3))
    assert mesh.shape["data"] == 3
    # off
    mesh, bsh = setup_mesh(TrainConfig(batch_size=8, mesh="off"))
    assert mesh is None and bsh is None
    # single device -> no mesh
    mesh, _ = setup_mesh(TrainConfig(batch_size=8), devices=devs[:1])
    assert mesh is None
    with pytest.raises(ValueError):
        setup_mesh(TrainConfig(batch_size=8, n_model=16))


def test_train_on_mesh_data_by_model(data_yaml, tmp_path):
    """cli-equivalent training over the 8-device mesh (data=4 x model=2)
    with REAL 'model'-axis kernel shards (s-scale widths reach 512 >=
    tp_min_out 256): loss finite, checkpoints written, and the returned
    params carry 'model'-sharded leaves."""
    cfg = TrainConfig(
        model="yolov5s_add", data=data_yaml, epochs=1, batch_size=4,
        img_size=64, workdir=str(tmp_path / "mesh_run"), mosaic_prob=0.0,
        dtype="float32", autoanchor=False, seed=3,
        mesh="on", n_model=2)
    out = train(cfg)
    assert os.path.isfile(os.path.join(out["workdir"], "results.txt"))
    params = out["state"].params
    leaves = jax.tree_util.tree_leaves_with_path(params)
    model_sharded = [
        p for p, v in leaves
        if hasattr(v, "sharding") and v.sharding is not None
        and "model" in str(getattr(v.sharding, "spec", ""))]
    assert model_sharded, "no 'model'-axis shards in the trained params"


def test_mesh_single_device_bitmatch(data_yaml, tmp_path, monkeypatch):
    """The mesh machinery degrades to the plain single-device path at
    n_devices=1: final params/EMA bit-match a mesh='off' run."""
    real = jax.devices()

    def run(name, mesh_mode, one_device):
        if one_device:
            monkeypatch.setattr(jax, "devices",
                                lambda *a, **k: real[:1])
        else:
            monkeypatch.setattr(jax, "devices", lambda *a, **k: real)
        cfg = TrainConfig(
            model="yolov5s_add", data=data_yaml, epochs=1, batch_size=2,
            img_size=64, workdir=str(tmp_path / name), mosaic_prob=0.0,
            dtype="float32", autoanchor=False, seed=5, notest=True,
            nosave=True, mesh=mesh_mode)
        return train(cfg)

    try:
        a = run("off", "off", one_device=False)
        b = run("auto1", "auto", one_device=True)
    finally:
        monkeypatch.setattr(jax, "devices", lambda *a, **k: real)
    for attr in ("params", "ema"):
        la = jax.tree_util.tree_leaves(getattr(a["state"], attr))
        lb = jax.tree_util.tree_leaves(getattr(b["state"], attr))
        assert len(la) == len(lb)
        for xa, xb in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
