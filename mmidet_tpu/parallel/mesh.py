"""Device mesh + sharding rules: the TPU-native replacement for the
reference's NCCL DDP (train.py:1019-1028, DistributedSampler, SyncBN, the
``loss * world_size`` compensation — none of which exist here).

Design (SURVEY §2c): a ``Mesh`` with axes ``('data', 'model')``.
  * batch tensors shard over 'data' — gradient psum is implicit in pjit;
  * BatchNorm statistics are computed over the *global* batch under GSPMD, so
    cross-replica SyncBN is the default;
  * wide conv/dense kernels optionally shard their output-channel dim over
    'model' (tensor parallelism for the 512/1024-channel P5 stages and the
    fusion transformers) — XLA inserts the all-gathers/reduce-scatters over
    ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim over 'data', rest replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _leaf_spec(path: tuple[str, ...], leaf, n_model: int,
               tp_min_out: int) -> P:
    name = path[-1]
    shape = leaf.shape
    if n_model > 1 and name == "kernel" and len(shape) >= 2:
        out = shape[-1]
        if out >= tp_min_out and out % n_model == 0:
            return P(*([None] * (len(shape) - 1) + ["model"]))
    return P()


def param_shardings(params, mesh: Mesh, tp_min_out: int = 256):
    """NamedSharding pytree for the params: output-channel TP on wide
    kernels (out channels >= ``tp_min_out``), everything else replicated.
    Smoke tests on narrow specs lower ``tp_min_out`` so the 'model' axis
    still carries real shards."""
    import flax
    n_model = mesh.shape["model"]
    flat = flax.traverse_util.flatten_dict(params)
    specs = {k: NamedSharding(mesh, _leaf_spec(k, v, n_model, tp_min_out))
             for k, v in flat.items()}
    return flax.traverse_util.unflatten_dict(specs)


def shard_pytree_like(tree, template_shardings, mesh: Mesh):
    """Shardings for an arbitrary state pytree (opt state, EMA): leaves whose
    shape matches a sharded param get that sharding; others replicate.

    Simplification: we just replicate scalars and shard nothing else — optax
    SGD momentum buffers mirror param shapes, so jax.lax infers placements
    from the params via jit; this helper is used for explicit annotation when
    needed."""
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda _: rep, tree)


def shard_train_state(state, mesh: Mesh, tp_min_out: int = 256):
    """Place a TrainState on the mesh for production training: params and
    the EMA's params shard per ``param_shardings`` (output-channel TP on
    wide kernels, replicated otherwise); BatchNorm stats and the EMA
    update counter replicate.  Optimizer-state leaves whose shape matches
    a TP-sharded kernel (momentum traces mirror the params) get that
    kernel's sharding; everything else in it replicates.  Explicit
    placement of the WHOLE state matters on resume: orbax restores arrays
    committed to device 0, and jit rejects mixing those with mesh-committed
    params."""
    import flax
    psh = param_shardings(state.params, mesh, tp_min_out)
    rep = replicated(mesh)
    # shape -> sharding rule for TP-sharded kernels (the rule is a pure
    # function of shape at fixed tp_min_out, so this is unambiguous)
    shape_rule = {}
    pflat = flax.traverse_util.flatten_dict(state.params)
    sflat = flax.traverse_util.flatten_dict(psh)
    for k, v in pflat.items():
        s = sflat[k]
        if any(p is not None for p in s.spec):
            shape_rule[tuple(v.shape)] = s

    def place_like_params(leaf):
        return jax.device_put(
            leaf, shape_rule.get(tuple(getattr(leaf, "shape", ())), rep))

    ema = {"params": jax.device_put(state.ema["params"], psh),
           "batch_stats": jax.device_put(state.ema["batch_stats"], rep),
           "updates": jax.device_put(state.ema["updates"], rep)}
    return type(state)(
        params=jax.device_put(state.params, psh),
        batch_stats=jax.device_put(state.batch_stats, rep),
        opt_state=jax.tree_util.tree_map(place_like_params,
                                         state.opt_state),
        ema=ema,
        step=jax.device_put(state.step, rep))


def shard_inference(model, variables, mesh: Mesh, two_stream: bool = True,
                    decode: bool = True):
    """Build a data-parallel jitted inference fn over the mesh: batch shards
    over 'data', params replicate (TP optional via param_shardings).

    The multi-chip serving path: on a v5e-8, per-chip throughput scales
    linearly since there is no cross-chip communication in the forward pass.
    Returns fn(rgb, ir) -> pred.
    """
    import jax
    bsh = batch_sharding(mesh)
    rep = replicated(mesh)
    variables = jax.device_put(variables, rep)

    @jax.jit
    def fwd(variables, rgb, ir=None):
        args = (rgb, ir) if two_stream else (rgb,)
        out = model.apply(variables, *args, train=False, decode=decode)
        return out["pred"] if decode else out["train_outs"]

    def run(rgb, ir=None):
        rgb = jax.device_put(rgb, bsh)
        args = [variables, rgb]
        if two_stream:
            args.append(jax.device_put(ir, bsh))
        with mesh:
            return fwd(*args)

    return run
