"""Checkpointing: orbax save/restore of the full train state, deploy
stripping, and the PyTorch reference-checkpoint converter.

Functional parity surface: reference checkpoint I/O (SURVEY §2 'Checkpoint
I/O') — ``train.py:881-899`` saves a pickled half-precision nn.Module +
EMA + optimizer; ``attempt_load`` (experimental.py:113-134) reads
``ckpt['ema' or 'model']``; ``strip_optimizer`` (general.py:584-598)
finalises for distribution.  We store proper state pytrees via orbax
(restorable across topologies) instead of pickled module objects — fixing,
not copying, the reference's fragile pickle format — plus a converter that
maps the reference's ``model.{i}.*`` torch parameter names onto our flax
pytree for the released M3FD checkpoint.
"""

from __future__ import annotations

import os
import re
import numpy as np


# ---------------------------------------------------------------------------
# orbax save / restore
# ---------------------------------------------------------------------------

def save_checkpoint(ckpt_dir: str, state, step: int, metadata: dict | None
                    = None, keep: int = 3):
    import orbax.checkpoint as ocp
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(
            ckpt_dir, options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True)) as mgr:
        payload = {"params": state.params, "batch_stats": state.batch_stats,
                   "opt_state": state.opt_state, "ema": state.ema,
                   "step": state.step}
        args = ocp.args.Composite(
            state=ocp.args.StandardSave(payload),
            **({"metadata": ocp.args.JsonSave(metadata)} if metadata else {}))
        mgr.save(step, args=args)
        mgr.wait_until_finished()


def restore_checkpoint(ckpt_dir: str, state_template, step: int | None = None):
    """Restore into the same structure as ``state_template`` (a TrainState).
    Returns (state, step, metadata)."""
    import orbax.checkpoint as ocp
    from mmidet_tpu.train.step import TrainState
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        step = step if step is not None else mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
        template = {"params": state_template.params,
                    "batch_stats": state_template.batch_stats,
                    "opt_state": state_template.opt_state,
                    "ema": state_template.ema,
                    "step": state_template.step}
        restored = mgr.restore(step, args=ocp.args.Composite(
            state=ocp.args.StandardRestore(template)))
        meta = None
        try:
            restored_meta = mgr.restore(step, args=ocp.args.Composite(
                metadata=ocp.args.JsonRestore()))
            meta = restored_meta.get("metadata")
        except Exception:
            pass
    s = restored["state"]
    return TrainState(params=s["params"], batch_stats=s["batch_stats"],
                      opt_state=s["opt_state"], ema=s["ema"],
                      step=s["step"]), step, meta


def strip_for_deploy(state) -> dict:
    """EMA params + stats only — the reference's strip_optimizer equivalent
    (swap model <- ema, drop training state, general.py:584-598)."""
    return {"params": state.ema["params"],
            "batch_stats": state.ema["batch_stats"]}


# ---------------------------------------------------------------------------
# torch reference checkpoint conversion
# ---------------------------------------------------------------------------

def _torch_key(path: tuple[str, ...], collection: str) -> tuple[str, str]:
    """Map a flax variable path to (reference torch name, transform kind).

    Transform kinds: 'conv' (OIHW->HWIO), 'linear' (out,in -> in,out),
    'raw', 'factor' ((out,1,1,1) -> (out,)).
    """
    segs = list(path)
    head = segs.pop(0)
    m = re.match(r"l(\d+)_(.+)", head)
    if m:
        prefix = f"model.{m.group(1)}"
        mod = m.group(2)
    elif head == "enhance":
        prefix = "Enhance"
        mod = "CEM"
    else:
        raise KeyError(f"unmapped top-level {head}")

    out: list[str] = []
    kind = "raw"
    i = 0
    while i < len(segs):
        s = segs[i]
        leaf = i == len(segs) - 1
        if leaf:
            if s == "kernel":
                # dense kernels live under projections/mlp; conv under conv
                kind = "linear" if any(
                    p in ("que_proj", "key_proj", "val_proj", "out_proj",
                          "mlp_fc1", "mlp_fc2", "linear", "q", "k", "v",
                          "fc1", "fc2") for p in out + segs[:i]) else "conv"
                out.append("weight")
            elif s == "scale":
                out.append("weight")
            elif s == "bias":
                out.append("bias")
            elif s == "mean":
                out.append("running_mean")
            elif s == "var":
                out.append("running_var")
            elif s == "pos_emb":
                out.append("pos_emb")
            elif s == "conv_kernel_s2d":
                # Focus stores the reference (k,k,4C,out) kernel directly
                kind = "conv"
                out.append("conv.conv.weight")
            elif s == "sobel_factor":
                kind = "factor"
                out.append("sobel_factor")
            else:
                out.append(s)
        else:
            if re.fullmatch(r"m\d+", s):        # C3/CSP repeat blocks
                out.append("m." + s[1:])
            elif re.fullmatch(r"block\d+", s):  # token transformer blocks
                out.append("trans_blocks." + s[len("block"):])
            elif s == "trans":                  # our wrapper level, flat in ref
                pass
            elif s == "pattern":                # _PatternGate wrapper
                pass
            elif s == "mlp_fc1":
                out.append("mlp.0")
            elif s == "mlp_fc2":
                out.append("mlp.2")
            elif s == "sobel":
                out.append("sobel")
            elif s == "conv_bn":     # Focus's BN (reference conv.bn)
                out.append("conv.bn")
            elif re.fullmatch(r"cv\d+_(conv|bn)", s):
                # CrossConv's flat cvN_conv/cvN_bn -> reference cvN.conv /
                # cvN.bn (its cv1/cv2 are Conv modules, experimental.py:17)
                out.append(s.replace("_", "."))
            else:
                out.append(s)
        i += 1
    return prefix + "." + ".".join(out), kind


def _transform(arr: np.ndarray, kind: str) -> np.ndarray:
    if kind == "conv":
        return np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
    if kind == "linear":
        return np.transpose(arr, (1, 0))
    if kind == "factor":
        return arr.reshape(-1)
    return arr


def convert_torch_state_dict(template_variables: dict,
                             torch_sd: dict[str, np.ndarray],
                             strict: bool = True) -> dict:
    """Fill a flax variables pytree (params + batch_stats) from a reference
    torch ``state_dict`` (numpy arrays).

    Returns new variables; raises on missing/shape-mismatched keys when
    ``strict``."""
    import flax
    out = {}
    report_missing = []
    for collection in ("params", "batch_stats"):
        flat = flax.traverse_util.flatten_dict(
            template_variables.get(collection, {}))
        new_flat = {}
        for path, leaf in flat.items():
            key, kind = _torch_key(path, collection)
            if key not in torch_sd:
                report_missing.append(key)
                new_flat[path] = leaf
                continue
            arr = _transform(np.asarray(torch_sd[key]), kind)
            if arr.shape != leaf.shape:
                if strict:
                    raise ValueError(
                        f"shape mismatch {path}: torch {key} {arr.shape} vs "
                        f"flax {leaf.shape}")
                # tolerant transfer (ref intersect_dicts, train.py:544-547):
                # keep the template leaf, e.g. a different-nc Detect head
                report_missing.append(key)
                new_flat[path] = leaf
                continue
            new_flat[path] = arr.astype(np.asarray(leaf).dtype)
        out[collection] = flax.traverse_util.unflatten_dict(new_flat)
    if strict and report_missing:
        raise KeyError(f"{len(report_missing)} torch keys missing, e.g. "
                       f"{report_missing[:5]}")
    return out


def load_torch_checkpoint(path: str, reference_repo: str | None = None,
                          prefer_ema: bool = True) -> dict[str, np.ndarray]:
    """Load a reference ``.pt`` (pickled-module checkpoint) and return a
    numpy state_dict.  The pickle embeds reference classes, so
    ``reference_repo`` (a checkout of MMI-Det) must be importable; optional
    stub modules cover its unused heavy imports."""
    import sys
    import types
    if reference_repo:
        sys.path.insert(0, reference_repo)
        for name in ("thop", "torchsummary"):
            if name not in sys.modules:
                stub = types.ModuleType(name)
                stub.profile = lambda *a, **k: (0, 0)
                stub.clever_format = lambda *a, **k: ("0", "0")
                stub.summary = lambda *a, **k: None
                sys.modules[name] = stub
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    model = None
    if isinstance(ckpt, dict):
        model = ckpt.get("ema") if prefer_ema and ckpt.get("ema") is not None \
            else ckpt.get("model", ckpt)
    if hasattr(model, "state_dict"):
        sd = model.float().state_dict()
    else:
        sd = model
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}
