"""CLI integration tests: train one epoch on the synthetic set, then val and
detect with the resulting run directory."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")


@pytest.fixture(scope="module")
def data_yaml(tmp_path_factory):
    from mmidet_tpu.data.synthetic import make_synthetic_pair_dataset
    root = tmp_path_factory.mktemp("synth")
    return make_synthetic_pair_dataset(str(root), n=6, img=96)


def test_train_cli_one_epoch(data_yaml, tmp_path):
    from mmidet_tpu.cli.train import main
    out = main([
        "--cfg", "yolov5s_add", "--data", data_yaml,
        "--epochs", "1", "--batch-size", "2", "--img-size", "64",
        "--project", str(tmp_path / "runs"), "--name", "exp",
        "--no-mosaic", "--dtype", "float32",
    ])
    assert os.path.isfile(os.path.join(out["workdir"], "results.txt"))
    assert os.path.isdir(os.path.join(out["workdir"], "ckpt"))
    assert out["best_fitness"] >= 0 or out["best_fitness"] == -1.0


def test_detect_cli(data_yaml, tmp_path):
    from mmidet_tpu.cli.detect import main
    import yaml
    d = yaml.safe_load(open(data_yaml))
    out_dir = main([
        "--cfg", "yolov5s_add", "--source1", d["val_rgb"],
        "--source2", d["val_ir"], "--img-size", "64",
        "--conf-thres", "0.0001", "--nc", "2",
        "--project", str(tmp_path / "det"), "--name", "exp",
        "--save-txt",
    ])
    files = os.listdir(out_dir)
    assert any(f.endswith("_rgb.jpg") for f in files)
    assert any(f.endswith(".txt") for f in files)


def test_val_cli(data_yaml):
    from mmidet_tpu.cli.val import main
    res = main(["--cfg", "yolov5s_add", "--data", data_yaml,
                "--batch-size", "2", "--img-size", "64"])
    assert 0.0 <= res.map50 <= 1.0


def test_val_cli_int8(data_yaml):
    """--int8 (s8-storage quantized deploy, nn/quant.make_quant_deploy)
    runs the full val pipeline and stays sane vs float; --int8-clip
    scales the calibration absmax (0.9 measured best, PERF.md r4)."""
    from mmidet_tpu.cli.val import main
    res = main(["--cfg", "yolov5s_add", "--data", data_yaml,
                "--batch-size", "2", "--img-size", "64", "--int8",
                "--int8-clip", "0.9"])
    assert 0.0 <= res.map50 <= 1.0


def test_export_cli(tmp_path):
    """mmidet-export writes a loadable deploy bundle (ref export.py:24-127)."""
    from mmidet_tpu.deploy.export import main, load_deploy_bundle
    out = main(["--cfg", "yolov5s_add", "--nc", "2", "--img-size", "64",
                "--out", str(tmp_path / "bundle"),
                "--names", "thing", "stuff"])
    spec, variables, meta = load_deploy_bundle(out)
    assert meta["names"] == ["thing", "stuff"]
    assert "params" in variables


def test_train_cli_single_stream(data_yaml, tmp_path):
    """The reference's legacy single-stream driver (train.py:45-473):
    plain train/val dataset yaml + a no-fusion single-stream model, driven
    end-to-end through the trainer — loss descends over epochs and the
    checkpoint round-trips through resume (VERDICT r4 #9)."""
    import yaml
    d = yaml.safe_load(open(data_yaml))
    ss_yaml = str(tmp_path / "ss.yaml")
    with open(ss_yaml, "w") as fh:
        yaml.safe_dump({"train": d["train_rgb"], "val": d["val_rgb"],
                        "nc": d["nc"], "names": d["names"]}, fh)
    from mmidet_tpu.cli.train import main
    hyp_yaml = str(tmp_path / "hyp.yaml")
    with open(hyp_yaml, "w") as fh:
        yaml.safe_dump({"warmup_epochs": 0.0, "lr0": 0.001}, fh)
    out = main([
        "--cfg", "yolov5s", "--data", ss_yaml,
        "--epochs", "4", "--batch-size", "2", "--img-size", "64",
        "--project", str(tmp_path / "runs"), "--name", "ss",
        "--no-mosaic", "--dtype", "float32", "--eval-every", "1",
        # real optimizer steps from step 1: warmup off (floor 0 +
        # warmup_epochs 0) and nbs=batch (otherwise round(64/2)=32
        # accumulation micro-steps mean the optimizer never steps in a
        # short run); adam for reliable early descent over 12 steps
        "--warmup-floor", "0", "--hyp", hyp_yaml, "--nbs", "2", "--adam",
    ])
    results = os.path.join(out["workdir"], "results.txt")
    assert os.path.isfile(results)
    # loss descends: sum of box/obj/cls epoch means, first vs last epoch
    rows = []
    for line in open(results):
        parts = line.split()
        rows.append(float(parts[2]) + float(parts[4]) + float(parts[6]))
    assert len(rows) == 4
    assert rows[-1] < rows[0], rows

    # checkpoint round-trip: resume the finished run in place — the
    # trainer restores epoch/best_fitness and immediately returns (all
    # epochs done), proving the state was readable
    out2 = main([
        "--cfg", "yolov5s", "--data", ss_yaml,
        "--epochs", "3", "--batch-size", "2", "--img-size", "64",
        "--project", str(tmp_path / "runs"), "--name", "ss",
        "--no-mosaic", "--dtype", "float32",
        "--resume", out["workdir"],
    ])
    assert out2["workdir"] == out["workdir"]
    la = jax.tree_util.tree_leaves(out["state"].params)
    lb = jax.tree_util.tree_leaves(out2["state"].params)
    for xa, xb in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
