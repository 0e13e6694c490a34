"""BatchNorm folding for inference deployment.

Functional parity surface: reference ``fuse_conv_and_bn``
(utils/torch_utils.py:181) + ``Model.fuse`` (yolo_test.py:304-312), invoked
by ``attempt_load`` on every checkpoint load.  On TPU this also removes one
elementwise memory pass per conv (the HBM-bandwidth bottleneck).

``fold_batchnorm(variables)`` maps train-mode variables (params +
batch_stats) to the fused param structure the modules expect when built with
``fused=True``:

  kernel' = kernel * scale / sqrt(var + eps)       (broadcast over out-dim)
  bias'   = bn_bias - mean * scale / sqrt(var + eps)

Patterns folded: ConvBnAct (``{conv, bn}`` siblings), Focus
(``conv_kernel_s2d`` + ``conv_bn`` -> ``conv_bias``), CEM
(``conv2/bn2``, ``conv3/bn3``).  Standalone BNs not adjacent to a single
conv (BottleneckCSP's post-concat bn, MixConv2d) are not folded — those
modules ignore ``fused`` and keep their BN.
"""

from __future__ import annotations

import jax.numpy as jnp

from mmidet_tpu.nn.layers import BN_EPS


def _fold(kernel, bn_p, bn_s):
    scale = bn_p["scale"] / jnp.sqrt(bn_s["var"] + BN_EPS)
    kernel2 = kernel * scale  # broadcast over trailing out-channel dim
    bias = bn_p["bias"] - bn_s["mean"] * scale
    return kernel2, bias


def fold_batchnorm(variables: dict) -> dict:
    """Returns {'params': ...} for a ``fused=True`` model (plus
    'batch_stats' for any BNs that could not be folded)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def walk(p: dict, s: dict) -> tuple[dict, dict]:
        out_p: dict = {}
        out_s: dict = {}
        keys = set(p.keys())
        pairs = {"conv": "bn", "conv2": "bn2", "conv3": "bn3"}
        # mark bn partners consumed up front (dict order is arbitrary)
        consumed: set[str] = set()
        for conv_name, bn_name in pairs.items():
            if conv_name in keys and bn_name in keys and \
                    isinstance(p[conv_name], dict) and \
                    "kernel" in p[conv_name] and bn_name in s:
                consumed.add(bn_name)
        if "conv_kernel_s2d" in keys and "conv_bn" in keys and \
                "conv_bn" in s:
            consumed.add("conv_bn")
        for name in sorted(keys):
            if name in consumed:
                continue
            child = p[name]
            if name in pairs and pairs[name] in keys and \
                    isinstance(child, dict) and "kernel" in child and \
                    pairs[name] in s:
                bn = pairs[name]
                k2, b = _fold(child["kernel"], p[bn], s[bn])
                out_p[name] = {"kernel": k2, "bias": b}
                consumed.add(bn)
            elif name == "conv_kernel_s2d" and "conv_bn" in keys and \
                    "conv_bn" in s:
                k2, b = _fold(child, p["conv_bn"], s["conv_bn"])
                out_p["conv_kernel_s2d"] = k2
                out_p["conv_bias"] = b
                consumed.add("conv_bn")
            elif isinstance(child, dict):
                cp, cs = walk(child, s.get(name, {}))
                out_p[name] = cp
                if cs:
                    out_s[name] = cs
            else:
                out_p[name] = child
        # any unfolded BN keeps its stats
        for name, child in s.items():
            if name in consumed or not isinstance(child, dict):
                continue
            if name in p and isinstance(p[name], dict) and \
                    "mean" in child:
                out_s[name] = child
        return out_p, out_s

    new_p, new_s = walk(params, stats)
    out = {"params": new_p}
    if new_s:
        out["batch_stats"] = new_s
    return out


def sparsity(variables: dict) -> float:
    """Global fraction of zero weights over all conv kernels.
    Ref: utils/torch_utils.py:163-167 (``sparsity``)."""
    import jax
    zeros = total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        name = str(path[-1])
        if leaf.ndim == 4 and "kernel" in name:
            zeros += int(jnp.sum(leaf == 0))
            total += leaf.size
    return zeros / max(total, 1)


def prune_variables(variables: dict, amount: float = 0.3) -> dict:
    """L1-unstructured pruning: per conv kernel, zero the smallest-|w|
    ``amount`` fraction.  Ref: utils/torch_utils.py:170-178 (``prune`` —
    torch.nn.utils.prune.l1_unstructured per Conv2d, made permanent).
    Returns a new variables pytree; shapes unchanged (sparse-in-dense),
    so the model/jit/checkpoint paths are oblivious."""
    import jax

    def leaf_prune(path, leaf):
        name = str(path[-1])
        if leaf.ndim != 4 or "kernel" not in name or amount <= 0:
            return leaf
        absw = jnp.abs(leaf)
        thresh = jnp.quantile(absw.reshape(-1).astype(jnp.float32), amount)
        return jnp.where(absw >= thresh.astype(leaf.dtype), leaf,
                         jnp.zeros_like(leaf))

    return jax.tree_util.tree_map_with_path(leaf_prune, variables)
