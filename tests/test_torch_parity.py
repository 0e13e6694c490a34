"""Full-model numerical parity against the PyTorch reference implementation.

Imports the reference (read-only, skipped when absent), builds a *miniature*
two-stream model from one shared YAML dict, converts the torch weights
through our checkpoint converter, and compares decoded predictions — this
validates the whole stack at once: graph assembly, every layer's math, the
fusion transformer, CEM, Detect decode, and the converter's name mapping.
"""

import os
import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")

# mini two-stream cfg: flagship grammar at 1/16 width, depth 1
MINI_CFG = {
    "nc": 2,
    "depth_multiple": 1.0,
    "width_multiple": 1.0,
    "anchors": [[10, 13, 16, 30, 33, 23],
                [30, 61, 62, 45, 59, 119],
                [116, 90, 156, 198, 373, 326]],
    "backbone": [
        [-1, 1, "Focus", [8, 3]],
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "C3", [16]],
        [-4, 1, "Focus", [8, 3]],
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "C3", [16]],
        [[2, 5], 1, "GPT1_fourier", [16]],
        [[2, 6], 1, "Add2", [16, 0]],
        [[5, 6], 1, "Add2", [16, 1]],
        [7, 1, "Conv", [24, 3, 2]],
        [-1, 1, "C3", [24]],
        [8, 1, "Conv", [24, 3, 2]],
        [-1, 1, "C3", [24]],
        [[10, 12], 1, "GPT", [24]],
        [[10, 13], 1, "Add2", [24, 0]],
        [[12, 13], 1, "Add2", [24, 1]],
        [14, 1, "Conv", [32, 3, 2]],
        [-1, 1, "C3", [32]],
        [15, 1, "Conv", [32, 3, 2]],
        [-1, 1, "C3", [32]],
        [[17, 19], 1, "GPT", [32]],
        [[17, 20], 1, "Add2", [32, 0]],
        [[19, 20], 1, "Add2", [32, 1]],
        [-2, 1, "Conv", [48, 3, 2]],
        [-1, 1, "SPP", [48, [5, 9, 13]]],
        [-1, 1, "C3", [48, False]],
        [22, 1, "Conv", [48, 3, 2]],
        [-1, 1, "SPP", [48, [5, 9, 13]]],
        [-1, 1, "C3", [48, False]],
        [[25, 28], 1, "GPT", [48]],
        [[25, 29], 1, "Add2", [48, 0]],
        [[28, 29], 1, "Add2", [48, 1]],
        [[14, 15], 1, "Add", [1]],
        [[21, 22], 1, "Add", [1]],
        [[30, 31], 1, "Add", [1]],
    ],
    "head": [
        [-1, 1, "Conv", [32, 1, 1]],
        [-1, 1, "nn.Upsample", [None, 2, "nearest"]],
        [[-1, 33], 1, "Concat", [1]],
        [-1, 1, "C3", [32, False]],
        [-1, 1, "Conv", [24, 1, 1]],
        [-1, 1, "nn.Upsample", [None, 2, "nearest"]],
        [[-1, 32], 1, "Concat", [1]],
        [-1, 1, "C3", [24, False]],
        [-1, 1, "Conv", [24, 3, 2]],
        [[-1, 39], 1, "Concat", [1]],
        [-1, 1, "C3", [32, False]],
        [-1, 1, "Conv", [32, 3, 2]],
        [[-1, 35], 1, "Concat", [1]],
        [-1, 1, "C3", [48, False]],
        [[42, 45, 48], 1, "Detect", ["nc", "anchors"]],
    ],
}


@pytest.fixture(scope="module")
def ref_model():
    sys.path.insert(0, REF)
    for name in ("thop", "torchsummary"):
        stub = types.ModuleType(name)
        stub.profile = lambda *a, **k: (0.0, 0.0)
        stub.clever_format = lambda *a, **k: ("0", "0")
        stub.summary = lambda *a, **k: None
        sys.modules.setdefault(name, stub)
    # torchvision isn't installed in this image; the reference only needs it
    # for NMS/classifier paths we don't touch here
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        for sub in ("ops", "models", "utils", "transforms"):
            mod = types.ModuleType(f"torchvision.{sub}")
            setattr(tv, sub, mod)
            sys.modules[f"torchvision.{sub}"] = mod
        tv.__version__ = "0.0-stub"
        sys.modules["torchvision"] = tv
    import copy
    from models.yolo_test import Model  # noqa: E402 (reference import)
    # the reference's GPT1_fourier uses .view on a tensor that is
    # non-contiguous on CPU (common.py:482) — fall back to reshape, which is
    # what it effectively computes on its own (contiguous CUDA) path
    orig_view = torch.Tensor.view

    def safe_view(self, *shape):
        try:
            return orig_view(self, *shape)
        except RuntimeError:
            return self.reshape(*shape)

    torch.Tensor.view = safe_view
    torch.manual_seed(0)
    m = Model(copy.deepcopy(MINI_CFG), ch=3, nc=2)
    m.eval().float()
    return m


def _our_model_and_vars(ref_model):
    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.models.spec import load_yolo_yaml
    from mmidet_tpu.train.checkpoint import convert_torch_state_dict

    cfg = {k: v for k, v in MINI_CFG.items()}
    cfg = {**cfg, "head": [row if row[2] != "Detect" else
                           [row[0], row[1], "Detect", []]
                           for row in cfg["head"]]}
    spec = load_yolo_yaml(cfg)
    model = TwoStreamDetector(spec=spec, use_cem=True, aux_mode="reference")
    x = jnp.zeros((1, 64, 64, 3))
    template = model.init({"params": jax.random.PRNGKey(0)}, x, x,
                          train=False)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    variables = convert_torch_state_dict(template, sd, strict=True)
    return model, variables


def test_converted_forward_matches_reference(ref_model):
    model, variables = _our_model_and_vars(ref_model)
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    ir = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        t_out, t_combine = ref_model(
            torch.from_numpy(rgb).permute(0, 3, 1, 2),
            torch.from_numpy(ir).permute(0, 3, 1, 2))
    t_pred, t_train = t_out  # eval mode: (decoded, per-level raw)

    out = model.apply(variables, jnp.asarray(rgb), jnp.asarray(ir),
                      train=False)

    # per-level raw outputs
    for lvl, (ours, theirs) in enumerate(zip(out["train_outs"], t_train)):
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), rtol=1e-3, atol=2e-4,
            err_msg=f"train_out level {lvl}")
    # decoded predictions
    np.testing.assert_allclose(np.asarray(out["pred"]), t_pred.numpy(),
                               rtol=1e-3, atol=2e-3)
    # fusion Combine loss (== SSIM term in the reference)
    np.testing.assert_allclose(float(out["aux"]["combine"]),
                               float(t_combine), rtol=1e-3, atol=1e-4)


def test_converter_covers_all_reference_params(ref_model):
    """Every torch parameter/buffer except the frozen constants and anchor
    buffers must be consumed by the converter's name map."""
    import flax
    model, variables = _our_model_and_vars(ref_model)
    from mmidet_tpu.train.checkpoint import _torch_key
    covered = set()
    for col in ("params", "batch_stats"):
        for path in flax.traverse_util.flatten_dict(variables[col]):
            covered.add(_torch_key(path, col)[0])
    skip = ("anchors", "anchor_grid", "sobel_weight", "num_batches_tracked",
            "contrastive_loss_func")
    missing = [k for k in ref_model.state_dict()
               if k not in covered and not any(s in k for s in skip)]
    assert not missing, f"unconverted reference keys: {missing[:10]}"


def test_gradient_parity(ref_model):
    """Backprop parity: d(detect-loss)/d(params) matches between frameworks
    on identical weights and batch — validates forward, loss, and autodiff
    end-to-end (and, by extension, training dynamics up to optimizer)."""
    import flax
    from mmidet_tpu.losses.detection import LossHyp, compute_loss
    from mmidet_tpu.train.checkpoint import _torch_key, _transform

    model, variables = _our_model_and_vars(ref_model)
    rng = np.random.default_rng(7)
    rgb = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    ir = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    t_pad = np.zeros((2, 4, 5), np.float32)
    m_pad = np.zeros((2, 4), bool)
    t_pad[0, 0] = [1, 0.5, 0.5, 0.4, 0.4]
    t_pad[1, 0] = [0, 0.3, 0.6, 0.3, 0.3]
    m_pad[0, 0] = m_pad[1, 0] = True
    targets_ref = torch.tensor([[0, 1, 0.5, 0.5, 0.4, 0.4],
                                [1, 0, 0.3, 0.6, 0.3, 0.3]])

    # ---- torch side: detect-only loss (Flag=False), full backward ----
    ref_model.zero_grad()
    ref_model.train()  # build_targets needs train-mode outputs
    # keep BN in eval so both sides use running stats
    for m in ref_model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.eval()
    # disable dropout for determinism
    for m in ref_model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.eval()
    ref_model.hyp = {"box": 0.05, "cls": 0.5, "cls_pw": 1.0, "obj": 1.0,
                     "obj_pw": 1.0, "anchor_t": 4.0, "fl_gamma": 0.0}
    ref_model.gr = 1.0
    from utils.loss import ComputeLoss  # reference import (fixture set path)
    loss_fn = ComputeLoss(ref_model)
    preds, _ = ref_model(torch.from_numpy(rgb).permute(0, 3, 1, 2),
                         torch.from_numpy(ir).permute(0, 3, 1, 2))
    total, _ = loss_fn(preds, targets_ref, [], Flag=False)
    total.backward()
    t_grads = {k: p.grad.detach().numpy() for k, p in
               ref_model.named_parameters() if p.grad is not None}
    ref_model.eval()  # restore for other tests sharing the fixture

    # ---- our side ----
    anchors = jnp.asarray(
        np.asarray(model.spec.anchors, np.float32).reshape(3, 3, 2)
        / np.asarray(model.spec.strides, np.float32)[:, None, None])

    def loss(params):
        out = model.apply({"params": params,
                           "batch_stats": variables["batch_stats"]},
                          jnp.asarray(rgb), jnp.asarray(ir), train=False,
                          decode=False)
        return compute_loss(out["train_outs"], jnp.asarray(t_pad),
                            jnp.asarray(m_pad), anchors, hyp=LossHyp())[0]

    g = jax.grad(loss)(variables["params"])
    flat = flax.traverse_util.flatten_dict(g)

    checked = 0
    for path, ours in flat.items():
        key, kind = _torch_key(path, "params")
        if key not in t_grads:
            continue
        want = _transform(t_grads[key], kind)
        ours = np.asarray(ours)
        scale = max(np.abs(want).max(), 1e-6)
        if scale < 1e-8:
            continue
        np.testing.assert_allclose(ours, want, rtol=0.05,
                                   atol=5e-3 * scale,
                                   err_msg=f"grad mismatch at {path}")
        checked += 1
    assert checked > 100, f"only {checked} grads compared"


def test_pt_checkpoint_roundtrip(ref_model, tmp_path):
    """Reference-format .pt (pickled module dict with 'ema'/'model') loads
    through load_torch_checkpoint + convert_torch_state_dict and reproduces
    the reference forward — the path the released M3FD checkpoint takes."""
    from mmidet_tpu.train.checkpoint import (convert_torch_state_dict,
                                             load_torch_checkpoint)
    ref_model.eval()  # fixture may have been left in train mode
    pt = str(tmp_path / "ckpt.pt")
    torch.save({"epoch": 42, "best_fitness": 0.5, "model": ref_model,
                "ema": None, "updates": 0, "optimizer": None,
                "training_results": "", "wandb_id": None}, pt)
    sd = load_torch_checkpoint(pt, reference_repo=REF)
    model, _ = _our_model_and_vars(ref_model)
    x = jnp.zeros((1, 64, 64, 3))
    template = model.init({"params": jax.random.PRNGKey(0)}, x, x,
                          train=False)
    variables = convert_torch_state_dict(template, sd, strict=True)
    rng = np.random.default_rng(3)
    rgb = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    ir = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        (t_pred, _), _ = ref_model(
            torch.from_numpy(rgb).permute(0, 3, 1, 2),
            torch.from_numpy(ir).permute(0, 3, 1, 2))
    out = model.apply(variables, jnp.asarray(rgb), jnp.asarray(ir),
                      train=False)
    np.testing.assert_allclose(np.asarray(out["pred"]), t_pred.numpy(),
                               rtol=1e-3, atol=2e-3)


def test_sgd_training_equivalence(ref_model):
    """Cross-framework TRAINING equivalence (the acceptance-gate fallback
    while the released checkpoint/M3FD are unavailable): from converted
    weights, run 3 identical plain-SGD(momentum) steps on the same batch
    in both frameworks — per-step losses and the resulting parameters
    must agree.  Pins forward + loss + autodiff + optimizer update
    end-to-end (torch SGD: buf = mu*buf + g; p -= lr*buf == optax
    trace(mu) + scale(-lr))."""
    import copy

    import flax
    import optax

    from mmidet_tpu.losses.detection import LossHyp, compute_loss
    from mmidet_tpu.train.checkpoint import _torch_key, _transform

    lr, mu, steps = 0.01, 0.937, 3
    tm = copy.deepcopy(ref_model)
    model, variables = _our_model_and_vars(tm)

    rng = np.random.default_rng(11)
    rgb = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    ir = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    t_pad = np.zeros((2, 4, 5), np.float32)
    m_pad = np.zeros((2, 4), bool)
    t_pad[0, 0] = [1, 0.5, 0.5, 0.4, 0.4]
    t_pad[1, 0] = [0, 0.3, 0.6, 0.3, 0.3]
    m_pad[0, 0] = m_pad[1, 0] = True
    targets_ref = torch.tensor([[0, 1, 0.5, 0.5, 0.4, 0.4],
                                [1, 0, 0.3, 0.6, 0.3, 0.3]])

    # ---- torch: 3 SGD steps (BN/dropout in eval for determinism) ----
    tm.train()
    for m in tm.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.Dropout)):
            m.eval()
    tm.hyp = {"box": 0.05, "cls": 0.5, "cls_pw": 1.0, "obj": 1.0,
              "obj_pw": 1.0, "anchor_t": 4.0, "fl_gamma": 0.0}
    tm.gr = 1.0
    from utils.loss import ComputeLoss  # reference import
    loss_fn = ComputeLoss(tm)
    opt = torch.optim.SGD(tm.parameters(), lr=lr, momentum=mu)
    t_losses = []
    for _ in range(steps):
        preds, _ = tm(torch.from_numpy(rgb).permute(0, 3, 1, 2),
                      torch.from_numpy(ir).permute(0, 3, 1, 2))
        total, _ = loss_fn(preds, targets_ref, [], Flag=False)
        opt.zero_grad()
        total.backward()
        opt.step()
        t_losses.append(float(total))

    # ---- ours: the same 3 steps ----
    anchors = jnp.asarray(
        np.asarray(model.spec.anchors, np.float32).reshape(3, 3, 2)
        / np.asarray(model.spec.strides, np.float32)[:, None, None])

    def loss(params):
        out = model.apply({"params": params,
                           "batch_stats": variables["batch_stats"]},
                          jnp.asarray(rgb), jnp.asarray(ir), train=False,
                          decode=False)
        return compute_loss(out["train_outs"], jnp.asarray(t_pad),
                            jnp.asarray(m_pad), anchors, hyp=LossHyp())[0]

    tx = optax.sgd(lr, momentum=mu)
    params = variables["params"]
    opt_state = tx.init(params)
    o_losses = []
    for _ in range(steps):
        l, g = jax.value_and_grad(loss)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        o_losses.append(float(l))

    np.testing.assert_allclose(o_losses, t_losses, rtol=5e-3,
                               err_msg=f"losses {o_losses} vs {t_losses}")

    # final parameters agree leaf-for-leaf through the converter name map
    t_final = {k: p.detach().numpy() for k, p in tm.named_parameters()}
    flat = flax.traverse_util.flatten_dict(params)
    checked = 0
    for path, ours in flat.items():
        key, kind = _torch_key(path, "params")
        if key not in t_final:
            continue
        want = _transform(t_final[key], kind)
        ours = np.asarray(ours)
        scale = max(np.abs(want).max(), 1e-6)
        np.testing.assert_allclose(
            ours, want, rtol=0.02, atol=2e-3 * scale,
            err_msg=f"param divergence after {steps} steps at {path}")
        checked += 1
    assert checked > 100, f"only {checked} params compared"


def test_sgd_training_equivalence_50step_mosaic(ref_model):
    """Long-horizon cross-framework training equivalence with mosaic ON
    (VERDICT round-2 #6): 50 identical SGD steps over mosaic-composed
    batches, both frameworks fp32 on the SAME inputs (mosaic composition
    is RNG-owned by whichever loader runs it, so equivalence is defined
    over identical augmented batches — the full aug->loss->autodiff->
    optimizer path).  Bounds end-to-end drift: per-step losses within 5%
    and final parameters leaf-for-leaf within 5%."""
    import copy

    import flax
    import optax

    from mmidet_tpu.data.augment import AugmentHyp, make_batch_augment
    from mmidet_tpu.losses.detection import LossHyp, compute_loss
    from mmidet_tpu.train.checkpoint import _torch_key, _transform

    lr, mu, steps, bsz, s = 0.01, 0.937, 50, 2, 64
    tm = copy.deepcopy(ref_model)
    model, variables = _our_model_and_vars(tm)

    # ---- generate mosaic batches with the on-device aug graph ----
    aug = jax.jit(make_batch_augment(s, AugmentHyp(), 20, mosaic=True))
    rng = np.random.default_rng(7)
    batches = []
    key = jax.random.PRNGKey(3)
    for step in range(steps):
        tiles = rng.uniform(0, 1, (bsz, 4, s, s, 3)).astype(np.float32)
        lab4 = np.zeros((bsz, 4, 20, 5), np.float32)
        m4 = np.zeros((bsz, 4, 20), bool)
        for b in range(bsz):
            for t in range(4):
                n = int(rng.integers(1, 3))
                for j in range(n):
                    lab4[b, t, j] = [rng.integers(0, 2), *rng.uniform(
                        0.3, 0.7, 2), *rng.uniform(0.2, 0.4, 2)]
                    m4[b, t, j] = True
        key, k = jax.random.split(key)
        out = aug({"rgb4": jnp.asarray(tiles), "ir4": jnp.asarray(tiles),
                   "labels4": jnp.asarray(lab4), "mask4": jnp.asarray(m4)},
                  k)
        batches.append({kk: np.asarray(vv) for kk, vv in out.items()})

    def to_ref_targets(lab, m):
        rows = []
        for b in range(lab.shape[0]):
            for j in range(lab.shape[1]):
                if m[b, j]:
                    c, x, y, w, h = lab[b, j]
                    rows.append([b, c, x, y, w, h])
        return torch.tensor(np.asarray(rows, np.float32))

    # ---- torch side ----
    tm.train()
    for mod in tm.modules():
        if isinstance(mod, (torch.nn.BatchNorm2d, torch.nn.Dropout)):
            mod.eval()
    tm.hyp = {"box": 0.05, "cls": 0.5, "cls_pw": 1.0, "obj": 1.0,
              "obj_pw": 1.0, "anchor_t": 4.0, "fl_gamma": 0.0}
    tm.gr = 1.0
    from utils.loss import ComputeLoss  # reference import
    loss_fn = ComputeLoss(tm)
    opt = torch.optim.SGD(tm.parameters(), lr=lr, momentum=mu)
    t_losses = []
    for bt in batches:
        preds, _ = tm(torch.from_numpy(bt["rgb"]).permute(0, 3, 1, 2),
                      torch.from_numpy(bt["ir"]).permute(0, 3, 1, 2))
        total, _ = loss_fn(preds, to_ref_targets(bt["targets"], bt["mask"]),
                           [], Flag=False)
        opt.zero_grad()
        total.backward()
        opt.step()
        t_losses.append(float(total))

    # ---- our side: one jitted step, same batches ----
    anchors = jnp.asarray(
        np.asarray(model.spec.anchors, np.float32).reshape(3, 3, 2)
        / np.asarray(model.spec.strides, np.float32)[:, None, None])
    tx = optax.sgd(lr, momentum=mu)

    def loss(params, batch):
        out = model.apply({"params": params,
                           "batch_stats": variables["batch_stats"]},
                          batch["rgb"], batch["ir"], train=False,
                          decode=False)
        return compute_loss(out["train_outs"], batch["targets"],
                            batch["mask"], anchors, hyp=LossHyp())[0]

    @jax.jit
    def step(params, opt_state, batch):
        l, g = jax.value_and_grad(loss)(params, batch)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    params = variables["params"]
    opt_state = tx.init(params)
    o_losses = []
    for bt in batches:
        jb = {k: jnp.asarray(v) for k, v in bt.items()}
        params, opt_state, l = step(params, opt_state, jb)
        o_losses.append(float(l))

    np.testing.assert_allclose(
        o_losses, t_losses, rtol=0.05,
        err_msg=f"loss trajectories diverged: {o_losses[-5:]} vs "
                f"{t_losses[-5:]}")

    t_final = {k: p.detach().numpy() for k, p in tm.named_parameters()}
    flat = flax.traverse_util.flatten_dict(params)
    checked = 0
    for path, ours in flat.items():
        k, kind = _torch_key(path, "params")
        if k not in t_final:
            continue
        want = _transform(t_final[k], kind)
        scale = max(np.abs(want).max(), 1e-6)
        np.testing.assert_allclose(
            np.asarray(ours), want, rtol=0.05, atol=0.01 * scale,
            err_msg=f"param divergence after {steps} mosaic steps at {path}")
        checked += 1
    assert checked > 100, f"only {checked} params compared"
