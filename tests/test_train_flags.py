"""Reference train-CLI flag parity: --weights / --freeze / --single-cls /
--multi-scale / --image-weights / --rect / --notest / --nosave.
Ref surface: train.py:948-983 argparse + their behaviors in train_rgb_ir."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")


@pytest.fixture(scope="module")
def data_yaml(tmp_path_factory):
    from mmidet_tpu.data.synthetic import make_synthetic_pair_dataset
    root = tmp_path_factory.mktemp("synth_flags")
    return make_synthetic_pair_dataset(str(root), n=6, img=96)


def test_freeze_labels_and_zero_update():
    import jax.numpy as jnp
    import optax
    from mmidet_tpu.train.optimizer import build_optimizer, label_params
    from mmidet_tpu.train.schedule import ScheduleConfig

    params = {"backbone_rgb": {"layer0": {"kernel": jnp.ones((3, 4))}},
              "head": {"layer1": {"kernel": jnp.ones((4, 2)),
                                  "bias": jnp.zeros((2,))}}}
    labels = label_params(params, freeze=("backbone_rgb",))
    assert labels["backbone_rgb"]["layer0"]["kernel"] == "frozen"
    assert labels["head"]["layer1"]["kernel"] == "weight"

    sched = ScheduleConfig(epochs=1, steps_per_epoch=2)
    tx, _ = build_optimizer(params, sched, weight_decay=0.0,
                            total_batch_size=64,
                            freeze=("backbone_rgb",))
    st = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    new = params
    for _ in range(3):  # step past warmup's lr=0 at step 0
        upd, st = tx.update(grads, st, new)
        new = optax.apply_updates(new, upd)
    assert np.allclose(new["backbone_rgb"]["layer0"]["kernel"],
                       params["backbone_rgb"]["layer0"]["kernel"])
    assert not np.allclose(new["head"]["layer1"]["kernel"],
                           params["head"]["layer1"]["kernel"])


def test_transfer_matching_shape_tolerant():
    import jax.numpy as jnp
    from mmidet_tpu.train.trainer import transfer_matching

    template = {"params": {"a": {"kernel": jnp.zeros((3, 3))},
                           "b": {"kernel": jnp.zeros((2, 2))}}}
    loaded = {"params": {"a": {"kernel": np.ones((3, 3))},
                         "b": {"kernel": np.ones((5, 5))}}}  # shape mismatch
    merged, n_cp, n_tot = transfer_matching(template, loaded)
    assert (n_cp, n_tot) == (1, 2)
    assert np.allclose(merged["params"]["a"]["kernel"], 1.0)
    assert np.allclose(merged["params"]["b"]["kernel"], 0.0)


def test_single_cls_multi_scale_notest_nosave(data_yaml, tmp_path):
    from mmidet_tpu.train.trainer import TrainConfig, train
    cfg = TrainConfig(
        model="yolov5s_add", data=data_yaml, epochs=2, batch_size=2,
        img_size=64, workdir=str(tmp_path / "runs/exp"), mosaic_prob=0.0,
        dtype="float32", single_cls=True, multi_scale=True, notest=True,
        nosave=True, autoanchor=False, freeze=("backbone_ir",))
    out = train(cfg)
    # single_cls: evaluator saw 1 class
    assert out["nc"] == 1 and out["names"] == ["item"]
    # notest: only the final epoch evaluated -> one results line
    lines = open(os.path.join(out["workdir"], "results.txt")).read()
    assert lines.count("\n") == 1
    # nosave: only the final epoch checkpointed
    import orbax.checkpoint as ocp
    with ocp.CheckpointManager(
            os.path.abspath(os.path.join(out["workdir"], "ckpt"))) as mgr:
        assert list(mgr.all_steps()) == [1]
    assert out["best_fitness"] is not None


def test_weights_transfer_and_image_weights(data_yaml, tmp_path):
    from mmidet_tpu.train.trainer import (TrainConfig, train,
                                          load_pretrained_variables)
    first = TrainConfig(
        model="yolov5s_add", data=data_yaml, epochs=1, batch_size=2,
        img_size=64, workdir=str(tmp_path / "runs/first"), mosaic_prob=0.0,
        dtype="float32", autoanchor=False)
    out1 = train(first)
    ckpt = os.path.join(out1["workdir"], "ckpt")

    loaded = load_pretrained_variables(
        ckpt, {"params": None, "batch_stats": None})
    assert "params" in loaded and loaded["params"]

    second = TrainConfig(
        model="yolov5s_add", data=data_yaml, epochs=2, batch_size=2,
        img_size=64, workdir=str(tmp_path / "runs/second"),
        mosaic_prob=0.0, dtype="float32", autoanchor=False,
        weights=ckpt, image_weights=True, eval_every=1)
    out2 = train(second)
    assert os.path.isfile(os.path.join(out2["workdir"], "results.txt"))


def test_convert_torch_tolerant():
    """strict=False keeps template leaves on missing keys AND shape
    mismatches (the reference's intersect_dicts + strict=False transfer,
    train.py:544-547) — e.g. transferring a COCO-80 head onto nc=6."""
    import jax.numpy as jnp
    from mmidet_tpu.train.checkpoint import (_torch_key,
                                             convert_torch_state_dict)
    template = {"params": {"l0_conv": {"conv": {"kernel":
                                                jnp.zeros((3, 3, 3, 8))}}}}
    key, kind = _torch_key(("l0_conv", "conv", "kernel"), "params")
    assert kind == "conv"
    # missing key: tolerant keeps template, strict raises
    out = convert_torch_state_dict(template, {}, strict=False)
    assert out["params"]["l0_conv"]["conv"]["kernel"].shape == (3, 3, 3, 8)
    with pytest.raises(KeyError):
        convert_torch_state_dict(template, {}, strict=True)
    # shape mismatch (torch OIHW (16,3,3,3) -> HWIO (3,3,3,16) != (...,8)):
    # tolerant keeps template, strict raises
    sd = {key: np.ones((16, 3, 3, 3), np.float32)}
    out = convert_torch_state_dict(template, sd, strict=False)
    assert np.allclose(
        np.asarray(out["params"]["l0_conv"]["conv"]["kernel"]), 0.0)
    with pytest.raises(ValueError):
        convert_torch_state_dict(template, sd, strict=True)


def test_save_period_independent_of_nosave_and_eval(data_yaml, tmp_path):
    """--save-period must write periodic checkpoints even when every epoch
    evaluates (eval_every=1) and --nosave suppresses the eval-branch save
    (the reference's save_period is unconditional, train.py:896-899)."""
    from mmidet_tpu.train.trainer import TrainConfig, train
    cfg = TrainConfig(
        model="yolov5s_add", data=data_yaml, epochs=2, batch_size=2,
        img_size=64, workdir=str(tmp_path / "runs/sp"), mosaic_prob=0.0,
        dtype="float32", autoanchor=False, nosave=True, save_period=1,
        eval_every=1)
    out = train(cfg)
    import orbax.checkpoint as ocp
    with ocp.CheckpointManager(
            os.path.abspath(os.path.join(out["workdir"], "ckpt"))) as mgr:
        assert list(mgr.all_steps()) == [0, 1]


def test_image_weights_resample_every_epoch(data_yaml, tmp_path,
                                            monkeypatch):
    """--image-weights resamples EVERY epoch (ref train.py:715-727), not
    only on eval epochs — with --notest the resample must still happen."""
    import mmidet_tpu.utils.general as general
    calls = []
    orig = general.labels_to_image_weights
    monkeypatch.setattr(
        general, "labels_to_image_weights",
        lambda *a, **k: (calls.append(1), orig(*a, **k))[1])
    from mmidet_tpu.train.trainer import TrainConfig, train
    cfg = TrainConfig(
        model="yolov5s_add", data=data_yaml, epochs=2, batch_size=2,
        img_size=64, workdir=str(tmp_path / "runs/iw"), mosaic_prob=0.0,
        dtype="float32", autoanchor=False, image_weights=True, notest=True)
    train(cfg)
    # resampled after every non-final epoch (epoch 0 of 2), even w/o eval
    assert len(calls) == 1


def test_resume_continues_epochs_and_state(data_yaml, tmp_path):
    """Resume restores epoch counter + full state (opt/EMA) and continues
    where training stopped — fixing the reference quirk where the
    dual-stream resume block is commented out (train.py:604-630) and
    restarts at epoch 0 with weights only."""
    import dataclasses as dc
    from mmidet_tpu.train.trainer import TrainConfig, train
    wd = str(tmp_path / "runs/resume")
    cfg1 = TrainConfig(
        model="yolov5s_add", data=data_yaml, epochs=2, batch_size=2,
        img_size=64, workdir=wd, mosaic_prob=0.0, dtype="float32",
        autoanchor=False, eval_every=1, exist_ok=True)
    train(cfg1)
    cfg2 = dc.replace(cfg1, epochs=4, resume="latest")
    out = train(cfg2)
    txt = open(os.path.join(out["workdir"], "results.txt")).read()
    # the resumed run appended epochs 2 and 3 only (no epoch-0 restart)
    assert "2/3 " in txt and "3/3 " in txt
    assert txt.count("0/") == 1  # only the first run's epoch 0
    import orbax.checkpoint as ocp
    with ocp.CheckpointManager(
            os.path.abspath(os.path.join(out["workdir"], "ckpt"))) as mgr:
        # max_to_keep=3 retains the last three epoch checkpoints
        assert sorted(mgr.all_steps()) == [1, 2, 3]


def test_rect_training_smoke(data_yaml, tmp_path):
    from mmidet_tpu.train.trainer import TrainConfig, train
    cfg = TrainConfig(
        model="yolov5s_add", data=data_yaml, epochs=1, batch_size=2,
        img_size=64, workdir=str(tmp_path / "runs/rect"), dtype="float32",
        rect=True, autoanchor=False, notest=False)
    out = train(cfg)
    assert out["best_fitness"] >= 0 or out["best_fitness"] == -1.0


def test_quad_batch_semantics():
    """Device-side --quad (ref collate_fn4): mosaic branch tiles + label
    offsets, upscale branch keeps only tile-0 labels at unchanged coords."""
    import jax.numpy as jnp
    from mmidet_tpu.data.augment import quad_batch

    s, t = 8, 3
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.random((8, s, s, 3)), jnp.float32)
    ir = rgb * 0.5
    targets = np.zeros((8, t, 5), np.float32)
    mask = np.zeros((8, t), bool)
    for i in range(8):
        targets[i, 0] = [i % 3, 0.5, 0.25, 0.2, 0.1]
        mask[i, 0] = True
    key = jax.random.PRNGKey(3)
    out = quad_batch(rgb, ir, jnp.asarray(targets), jnp.asarray(mask), key)
    assert out["rgb"].shape == (2, 2 * s, 2 * s, 3)
    assert out["targets"].shape == (2, 4 * t, 5)
    take_up = np.asarray(jax.random.uniform(key, (2,)) < 0.5)
    for g in range(2):
        tg = np.asarray(out["targets"][g])
        mg = np.asarray(out["mask"][g])
        img = np.asarray(out["rgb"][g])
        if take_up[g]:
            # only tile-0 labels, coords unchanged (normalized)
            assert mg.sum() == 1
            np.testing.assert_allclose(tg[0], targets[4 * g, 0], atol=1e-6)
        else:
            assert mg.sum() == 4
            # tile placement: left col = tiles 0 (top) / 1 (bottom),
            # right col = 2 / 3
            np.testing.assert_allclose(img[:s, :s], np.asarray(rgb[4 * g]))
            np.testing.assert_allclose(img[s:, :s],
                                       np.asarray(rgb[4 * g + 1]))
            np.testing.assert_allclose(img[:s, s:],
                                       np.asarray(rgb[4 * g + 2]))
            np.testing.assert_allclose(img[s:, s:],
                                       np.asarray(rgb[4 * g + 3]))
            # label remap: tile k at offset (+x for 2/3, +y for 1/3), /2
            got = {tuple(np.round(r[1:3], 5)) for r, v in
                   zip(tg.reshape(4, t, 5).reshape(-1, 5),
                       mg.reshape(-1)) if v}
            exp = set()
            offs = [(0, 0), (0, 1), (1, 0), (1, 1)]
            for k_, (ox, oy) in enumerate(offs):
                l0 = targets[4 * g + k_, 0]
                exp.add(tuple(np.round([(l0[1] + ox) / 2,
                                        (l0[2] + oy) / 2], 5)))
            assert got == exp


def test_cache_images_dataset(data_yaml, tmp_path):
    from mmidet_tpu.data.datasets import PairedDataset, load_data_yaml
    data = load_data_yaml(data_yaml)
    ds = PairedDataset(data["train_rgb"], data["train_ir"],
                       cache_dir=str(tmp_path), cache_images=True)
    a = ds[0]["rgb"]
    # cached object is returned on re-access (identity, not re-decode)
    assert ds[0]["rgb"] is a
    ds2 = PairedDataset(data["train_rgb"], data["train_ir"],
                        cache_dir=str(tmp_path))
    b = ds2[0]["rgb"]
    assert ds2[0]["rgb"] is not b  # no cache by default


def test_gsutil_upload_graceful_without_gsutil(tmp_path):
    from mmidet_tpu.utils.general import gsutil_upload
    p = tmp_path / "x.txt"
    p.write_text("hi")
    import shutil
    if shutil.which("gsutil") is None:
        assert gsutil_upload("some-bucket", str(p)) is False
    assert gsutil_upload("", str(p)) is False


def test_quad_label_smoothing_bbox_interval_train(data_yaml, tmp_path):
    """End-to-end smoke: --quad + --label-smoothing + --bbox-interval +
    --cache-images + --noautoanchor through the trainer."""
    from mmidet_tpu.train.trainer import TrainConfig, train
    import yaml
    cfg = TrainConfig(
        model="yolov5s_add", data=data_yaml, epochs=1, batch_size=4,
        img_size=64, workdir=str(tmp_path / "runs/quad"), mosaic_prob=0.0,
        dtype="float32", autoanchor=False, quad=True, cache_images=True,
        label_smoothing=0.05, bbox_interval=1)
    out = train(cfg)
    # label-smoothing override persisted to the run's hyp.yaml
    hyp = yaml.safe_load(open(os.path.join(out["workdir"], "hyp.yaml")))
    assert hyp["label_smoothing"] == 0.05
    # bbox media dumped for the (final) eval epoch
    media = os.path.join(out["workdir"], "media", "epoch0")
    assert os.path.isdir(media) and os.listdir(media)


def test_quad_batch_matches_reference_collate_fn4():
    """Direct cross-implementation parity: quad_batch vs the live
    reference LoadMultiModalImagesAndLabels.collate_fn4 (datasets.py) on
    both branches (2x upscale and 2x2 mosaic), images and labels."""
    import sys
    torch = pytest.importorskip("torch")
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, "/root/reference")
    import types
    if "torchvision" not in sys.modules:  # not installed in this image
        tv = types.ModuleType("torchvision")
        for sub in ("ops", "models", "utils", "transforms"):
            mod = types.ModuleType(f"torchvision.{sub}")
            setattr(tv, sub, mod)
            sys.modules[f"torchvision.{sub}"] = mod
        tv.__version__ = "0.0-stub"
        sys.modules["torchvision"] = tv
    import utils.datasets as rds

    import jax.numpy as jnp
    from mmidet_tpu.data.augment import quad_batch

    s, t = 16, 2
    rng = np.random.default_rng(5)
    imgs = rng.random((4, s, s, 3)).astype(np.float32)
    labs = np.zeros((4, t, 5), np.float32)
    mask = np.zeros((4, t), bool)
    for i in range(4):
        labs[i, 0] = [i % 2, 0.3 + 0.1 * i, 0.6 - 0.1 * i, 0.2, 0.25]
        mask[i, 0] = True

    # reference batch: (img CHW tensor, label (n,6) with img-idx col, ...)
    batch = []
    for i in range(4):
        batch.append((torch.from_numpy(imgs[i].transpose(2, 0, 1)),
                      torch.from_numpy(np.concatenate(
                          [np.zeros((1, 1), np.float32), labs[i, :1]],
                          axis=1)),
                      f"p{i}.jpg", ((s, s), ((1.0, 1.0), (0, 0)))))

    # our branch selector: find keys that take each branch for the group
    def key_for(up: bool):
        for seed in range(100):
            k = jax.random.PRNGKey(seed)
            if bool(jax.random.uniform(k, (1,))[0] < 0.5) == up:
                return k
        raise AssertionError

    fn = rds.LoadMultiModalImagesAndLabels.collate_fn4
    old_random = rds.random.random
    try:
        for up in (True, False):
            rds.random.random = (lambda: 0.1) if up else (lambda: 0.9)
            rimg, rlab, _, _ = fn(batch)
            ours = quad_batch(jnp.asarray(imgs), jnp.asarray(imgs) * 0.5,
                              jnp.asarray(labs), jnp.asarray(mask),
                              key_for(up))
            oimg = np.asarray(ours["rgb"][0])
            np.testing.assert_allclose(
                oimg, rimg[0].numpy().transpose(1, 2, 0),
                rtol=2e-5, atol=2e-5)
            got = {tuple(np.round(r, 5)) for r, v in
                   zip(np.asarray(ours["targets"][0]),
                       np.asarray(ours["mask"][0])) if v}
            exp = {tuple(np.round(r, 5)) for r in rlab[:, 1:].numpy()}
            assert got == exp, (got, exp)
    finally:
        rds.random.random = old_random


def test_multi_scale_sizes_bucketed_and_full():
    from mmidet_tpu.train.trainer import multi_scale_sizes

    # default 5 buckets at the reference's 640/32: endpoints included,
    # evenly spaced, all /32
    s5 = multi_scale_sizes(640, 32, 5)
    assert s5.tolist() == [320, 480, 640, 800, 960]
    # 0 = full reference range (train.py:778-783): every /32 size in
    # [0.5, 1.5]x
    full = multi_scale_sizes(640, 32, 0)
    assert full.min() == 320 and full.max() == 960 and len(full) == 21
    assert all(s % 32 == 0 for s in full)
    # more buckets than distinct sizes collapses to unique sizes
    s99 = multi_scale_sizes(64, 32, 99)
    assert s99.tolist() == [32, 64, 96]


def test_fused_loop_matches_fallback(data_yaml, tmp_path):
    """The pipelined hot loop (one jit program: step N + augment N+1,
    device-side loss accumulation) must be bit-equivalent to the
    two-dispatch fallback: identical per-batch PRNG keys, identical final
    params/EMA."""
    from mmidet_tpu.train.trainer import TrainConfig, train

    def run(fused, name):
        cfg = TrainConfig(
            model="yolov5s_add", data=data_yaml, epochs=2, batch_size=2,
            img_size=64, workdir=str(tmp_path / name), mosaic_prob=1.0,
            dtype="float32", notest=True, nosave=True, autoanchor=False,
            seed=7, fused_loop=fused)
        return train(cfg)

    a = run(True, "fused")
    b = run(False, "fallback")
    for attr in ("params", "ema", "opt_state"):
        pa = jax.tree_util.tree_leaves(getattr(a["state"], attr))
        pb = jax.tree_util.tree_leaves(getattr(b["state"], attr))
        assert len(pa) == len(pb), attr
        for xa, xb in zip(pa, pb):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb),
                                          err_msg=attr)
