"""End-to-end train-step tests: single-device and sharded over the virtual
8-device CPU mesh (dp + tp), verifying loss decreases and state updates."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mmidet_tpu.losses.detection import LossHyp
from mmidet_tpu.models.detector import TwoStreamDetector
from mmidet_tpu.models.zoo import two_stream_spec
from mmidet_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                      param_shardings)
from mmidet_tpu.train.optimizer import build_optimizer, label_params
from mmidet_tpu.train.schedule import ScheduleConfig
from mmidet_tpu.train.step import init_state, make_train_step


def _setup(batch=2, img=64):
    spec = two_stream_spec("s", "add", nc=2)
    model = TwoStreamDetector(spec=spec, aux_mode="reference")
    rng = jax.random.PRNGKey(0)
    rgb = jax.random.uniform(rng, (batch, img, img, 3))
    ir = jax.random.uniform(rng, (batch, img, img, 3))
    targets = np.zeros((batch, 8, 5), np.float32)
    targets[:, 0] = [1, 0.5, 0.5, 0.25, 0.25]
    targets[:, 1] = [0, 0.25, 0.25, 0.12, 0.2]
    mask = np.zeros((batch, 8), bool)
    mask[:, :2] = True
    batch_d = {"rgb": rgb, "ir": ir, "targets": jnp.asarray(targets),
               "mask": jnp.asarray(mask)}
    return model, batch_d


def _anchors(spec):
    a = np.asarray(spec.anchors, np.float32).reshape(3, 3, 2)
    return jnp.asarray(a / np.asarray(spec.strides, np.float32)[:, None, None])


def test_train_step_runs_and_descends():
    model, batch = _setup()
    sched = ScheduleConfig(epochs=3, steps_per_epoch=4, warmup_epochs=0.0)
    # bypass the 1000-step warmup floor for this test
    object.__setattr__(sched, "warmup_epochs", 0.0)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           batch["rgb"], batch["ir"], train=False)
    tx, labels = build_optimizer(variables["params"], sched,
                                 weight_decay=0.0005, total_batch_size=64)
    anchors = _anchors(model.spec)
    state = init_state(model, tx, jax.random.PRNGKey(0), batch["rgb"],
                       batch["ir"])
    step = jax.jit(make_train_step(model, tx, anchors, LossHyp()))
    rng = jax.random.PRNGKey(1)
    state, m0 = step(state, batch, rng)
    l0 = float(m0["total"])
    for _ in range(3):
        state, m = step(state, batch, rng)
    assert int(state.step) == 4
    assert np.isfinite(float(m["total"]))
    assert int(state.ema["updates"]) == 4


def test_accumulation_sums_gradients_and_rescales_schedule():
    """Reference accumulation semantics (train.py:796-804): gradients SUM
    over the accumulate window (not mean), and the LR schedule counts
    dataloader micro-iterations. k micro-steps with gradient g must equal
    one step with gradient k*g under a schedule pre-scaled to
    optimizer-step units."""
    import dataclasses as dc
    import optax
    params = {"m": {"kernel": jnp.ones((4, 4))},
              "b": {"bias": jnp.zeros((4,))}}
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    sched = ScheduleConfig(epochs=2, steps_per_epoch=8, warmup_epochs=0.0,
                           warmup_floor=1)
    # total_batch_size=16 -> accumulate = 64/16 = 4
    tx, _ = build_optimizer(params, sched, weight_decay=0.0,
                            total_batch_size=16)
    st = tx.init(params)
    p = params
    for i in range(4):
        upd, st = tx.update(g, st, p)
        p = optax.apply_updates(p, upd)
        if i < 3:  # no emit yet: params unchanged
            assert np.allclose(p["m"]["kernel"], 1.0)
    # manual control: accumulate=1 with the schedule already in
    # optimizer-step units and the 4x-summed gradient
    s1 = dc.replace(sched, steps_per_epoch=2, warmup_floor=1)
    tx1, _ = build_optimizer(params, s1, weight_decay=0.0,
                             total_batch_size=16, accumulate=1)
    st1 = tx1.init(params)
    g4 = jax.tree_util.tree_map(lambda x: 4.0 * x, g)
    upd1, st1 = tx1.update(g4, st1, params)
    p1 = optax.apply_updates(params, upd1)
    np.testing.assert_allclose(np.asarray(p["m"]["kernel"]),
                               np.asarray(p1["m"]["kernel"]), rtol=1e-6)


def test_ema_advances_only_on_optimizer_steps():
    """Reference ModelEMA updates inside 'if ni % accumulate == 0'
    (train.py:798-804) — with gradient accumulation the EMA (and its ramp
    counter) must not move on non-emit micro-steps."""
    model, batch = _setup()
    sched = ScheduleConfig(epochs=3, steps_per_epoch=4, warmup_epochs=0.0,
                           warmup_floor=1)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           batch["rgb"], batch["ir"], train=False)
    # total_batch_size=32 -> accumulate=2
    tx, _ = build_optimizer(variables["params"], sched, weight_decay=0.0,
                            total_batch_size=32)
    anchors = _anchors(model.spec)
    state = init_state(model, tx, jax.random.PRNGKey(0), batch["rgb"],
                       batch["ir"])
    step = jax.jit(make_train_step(model, tx, anchors, LossHyp()))
    rng = jax.random.PRNGKey(1)
    state, _ = step(state, batch, rng)   # micro-step 1: no emit
    assert int(state.ema["updates"]) == 0
    state, _ = step(state, batch, rng)   # micro-step 2: emit
    assert int(state.ema["updates"]) == 1
    state, _ = step(state, batch, rng)   # micro-step 3: no emit
    assert int(state.ema["updates"]) == 1


def test_param_labels():
    model, batch = _setup()
    v = model.init({"params": jax.random.PRNGKey(0)}, batch["rgb"],
                   batch["ir"], train=False)
    import flax
    labels = flax.traverse_util.flatten_dict(
        label_params(v["params"], groups="reference"))
    vals = set(labels.values())
    assert "frozen" in vals  # pos_emb/sobel_factor isolated in reference mode
    kinds = {}
    for path, lab in labels.items():
        if path[-1] == "pos_emb":
            assert lab == "frozen"
        if path[-1] == "kernel":
            assert lab == "weight"
        if path[-1] == "bias":
            assert lab == "bias"


def test_sharded_train_step_cpu_mesh():
    n = len(jax.devices())
    assert n == 8, "conftest must force 8 virtual CPU devices"
    mesh = make_mesh(n_data=4, n_model=2)
    model, batch = _setup(batch=4)
    sched = ScheduleConfig(epochs=2, steps_per_epoch=2)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           batch["rgb"], batch["ir"], train=False)
    tx, _ = build_optimizer(variables["params"], sched,
                            weight_decay=0.0005, total_batch_size=64)
    anchors = _anchors(model.spec)
    state = init_state(model, tx, jax.random.PRNGKey(0), batch["rgb"],
                       batch["ir"])

    bsh = batch_sharding(mesh)
    psh = param_shardings(state.params, mesh)
    state = state.__class__(
        params=jax.device_put(state.params, psh),
        batch_stats=jax.device_put(
            state.batch_stats, NamedSharding(mesh, P())),
        opt_state=state.opt_state, ema=state.ema, step=state.step)
    batch = {k: jax.device_put(v, bsh) for k, v in batch.items()}

    step = jax.jit(make_train_step(model, tx, anchors, LossHyp()))
    with mesh:
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        jax.block_until_ready(metrics["total"])
    assert np.isfinite(float(metrics["total"]))
    # at least one wide kernel actually sharded over the model axis
    sharded = [s for s in jax.tree_util.tree_leaves(psh)
               if s.spec != P()]
    assert sharded, "expected tensor-parallel sharded kernels"


def test_shard_inference_data_parallel():
    from mmidet_tpu.parallel.mesh import make_mesh, shard_inference
    mesh = make_mesh(n_data=8, n_model=1)
    model, batch = _setup(batch=8)
    v = model.init({"params": jax.random.PRNGKey(0)}, batch["rgb"],
                   batch["ir"], train=False)
    run = shard_inference(model, v, mesh)
    pred = run(batch["rgb"], batch["ir"])
    assert pred.shape[0] == 8
    assert np.isfinite(np.asarray(pred)).all()


def test_remat_train_step_matches():
    """remat='dots' must produce the same loss/gradients as the plain step
    (it only changes what is cached for backward)."""
    from mmidet_tpu.losses.detection import LossHyp
    from mmidet_tpu.train.optimizer import build_optimizer
    from mmidet_tpu.train.schedule import ScheduleConfig
    from mmidet_tpu.train.step import init_state, make_train_step
    model, batch = _setup()
    sched = ScheduleConfig(epochs=2, steps_per_epoch=2)
    v = model.init({"params": jax.random.PRNGKey(0)}, batch["rgb"],
                   batch["ir"], train=False)
    tx, _ = build_optimizer(v["params"], sched, 5e-4, total_batch_size=2)
    anchors = _anchors(model.spec)
    s0 = init_state(model, tx, jax.random.PRNGKey(0), batch["rgb"],
                    batch["ir"])
    step_plain = jax.jit(make_train_step(model, tx, anchors, LossHyp()))
    step_remat = jax.jit(make_train_step(model, tx, anchors, LossHyp(),
                                         remat="dots"))
    _, m0 = step_plain(s0, batch, jax.random.PRNGKey(1))
    _, m1 = step_remat(s0, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m0["total"]), float(m1["total"]),
                               rtol=1e-5)


def test_dp8_train_step_matches_single_device():
    """One train step on the same global batch must produce the SAME loss
    and the SAME updated parameters whether the batch is dp-sharded over 8
    devices or lives on one — data parallelism is a layout choice, not a
    semantics choice (the reference relies on DDP's mean-gradient matching
    single-process training, train.py:1019-1028; here XLA's psum under pjit
    plays that role)."""
    mesh = make_mesh(n_data=8, n_model=1)
    model, batch = _setup(batch=8)
    sched = ScheduleConfig(epochs=2, steps_per_epoch=2)
    v = model.init({"params": jax.random.PRNGKey(0)}, batch["rgb"],
                   batch["ir"], train=False)
    tx, _ = build_optimizer(v["params"], sched, weight_decay=5e-4,
                            total_batch_size=8)
    anchors = _anchors(model.spec)
    s0 = init_state(model, tx, jax.random.PRNGKey(0), batch["rgb"],
                    batch["ir"])
    step = jax.jit(make_train_step(model, tx, anchors, LossHyp()))
    rng = jax.random.PRNGKey(1)

    s_ref, m_ref = step(s0, batch, rng)  # single-device

    bsh = batch_sharding(mesh)
    rep = NamedSharding(mesh, P())
    s_sh = s0.__class__(
        params=jax.device_put(s0.params, rep),
        batch_stats=jax.device_put(s0.batch_stats, rep),
        opt_state=s0.opt_state, ema=s0.ema, step=s0.step)
    batch_sh = {k: jax.device_put(val, bsh) for k, val in batch.items()}
    with mesh:
        s_dp, m_dp = step(s_sh, batch_sh, rng)
        jax.block_until_ready(m_dp["total"])
        # per-device batch math: each of the 8 shards holds exactly 1 image
        shard_rows = {sh.data.shape[0]
                      for sh in batch_sh["rgb"].addressable_shards}
        assert shard_rows == {1}

    for key in ("total", "box", "obj", "cls"):
        np.testing.assert_allclose(float(m_ref[key]), float(m_dp[key]),
                                   rtol=2e-5, atol=1e-6)
    flat_ref = jax.tree_util.tree_leaves(s_ref.params)
    flat_dp = jax.tree_util.tree_leaves(s_dp.params)
    for a, b in zip(flat_ref, flat_dp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_shard_inference_matches_single_device():
    """dp-sharded forward must produce the same predictions as unsharded."""
    from mmidet_tpu.parallel.mesh import make_mesh, shard_inference
    mesh = make_mesh(n_data=4, n_model=1)
    model, batch = _setup(batch=4)
    v = model.init({"params": jax.random.PRNGKey(0)}, batch["rgb"],
                   batch["ir"], train=False)
    want = model.apply(v, batch["rgb"], batch["ir"], train=False)["pred"]
    run = shard_inference(model, v, mesh)
    got = run(batch["rgb"], batch["ir"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_dp8_inference_matches_single_device():
    """The deploy forward sharded dp=8 equals the single-device forward —
    the zero-collective inference scaling claim (PERF.md 'Multi-chip
    scaling'): params replicated, batch sharded, outputs identical."""
    mesh = make_mesh(n_data=8, n_model=1)
    model, batch = _setup(batch=8)
    infer = TwoStreamDetector(spec=model.spec, aux_mode="off", fused=False)
    v = infer.init({"params": jax.random.PRNGKey(0)}, batch["rgb"],
                   batch["ir"], train=False)

    fwd = jax.jit(lambda vv, r, i: infer.apply(vv, r, i, train=False)["pred"])
    ref = np.asarray(fwd(v, batch["rgb"], batch["ir"]))

    bsh = batch_sharding(mesh)
    rep = NamedSharding(mesh, P())
    v_sh = jax.device_put(v, rep)
    r_sh = jax.device_put(batch["rgb"], bsh)
    i_sh = jax.device_put(batch["ir"], bsh)
    with mesh:
        out = fwd(v_sh, r_sh, i_sh)
        jax.block_until_ready(out)
        # batch stays sharded end-to-end: one image per device
        rows = {sh.data.shape[0] for sh in out.addressable_shards}
        assert rows == {1}
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)
