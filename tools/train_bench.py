"""Ablate the training step's wall-clock on the real chip: where do the
153 ms/step (batch 16 @640, yolov5s gpt4) actually go?

Times, with the scan-loop method (tunnel dispatch would otherwise dominate):
  fwd        — loss_fn forward only (model + aux + detection loss)
  grad       — value_and_grad of the same
  step       — the full train step (grad + optimizer + EMA)
  step_donated — same jit with donated state buffers
  aug        — the batch augmentation graph (mosaic+warp+HSV)

End-to-end training throughput (full step + full mosaic/warp/HSV graph,
the reference's train.py:712-825 configuration at batch 16) is staged
into BENCH_partial.json as ``yolov5s_twostream_640_mosaic_train`` so the
round carries a driver-parseable training-throughput record
(BASELINE.json configs[4]).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def timed_scan(fn, state, batch, rng, iters=4):
    @jax.jit
    def loop(state, batch, rng):
        def body(c, i):
            out = fn(state, batch, jax.random.fold_in(rng, i))
            leaf = jax.tree_util.tree_leaves(out)[0]
            return c + jnp.sum(leaf).astype(jnp.float32) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0),
                            jnp.arange(iters))
        return c

    float(np.asarray(loop(state, batch, rng)))
    t0 = time.perf_counter()
    float(np.asarray(loop(state, batch, rng)))
    return (time.perf_counter() - t0) / iters


def main():
    from mmidet_tpu.losses.detection import LossHyp, compute_loss
    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.models.zoo import two_stream_spec
    from mmidet_tpu.train.optimizer import build_optimizer
    from mmidet_tpu.train.schedule import ScheduleConfig
    from mmidet_tpu.train.step import init_state, make_train_step
    from mmidet_tpu.train.trainer import _anchors_grid

    batch, img, nt = 16, 640, 60
    dtype = jnp.bfloat16
    spec = two_stream_spec("s", "gpt4", nc=6)
    model = TwoStreamDetector(spec=spec, aux_mode="reference", dtype=dtype)
    rng = jax.random.PRNGKey(0)
    small = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init({"params": rng}, small, small, train=False)
    tx, _ = build_optimizer(variables["params"], ScheduleConfig(),
                            5e-4, total_batch_size=batch)
    state = init_state(model, tx, rng, small, small)

    b = {
        "rgb": jax.random.uniform(rng, (batch, img, img, 3), jnp.float32),
        "ir": jax.random.uniform(rng, (batch, img, img, 3), jnp.float32),
        "targets": jnp.tile(jnp.asarray(
            [[0, 0.5, 0.5, 0.2, 0.3]], jnp.float32), (batch, nt, 1)),
        "mask": jnp.ones((batch, nt), bool),
    }
    anchors = _anchors_grid(spec)

    hyp = LossHyp()

    def fwd_params(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        out, _ = model.apply(variables, batch["rgb"], batch["ir"],
                             train=True, decode=False,
                             rngs={"dropout": rng},
                             mutable=["batch_stats"])
        total, _ = compute_loss(tuple(out["train_outs"]), batch["targets"],
                                batch["mask"], anchors, hyp=hyp,
                                combine_loss=out["aux"].get("combine"))
        return total

    def fwd_only(state, batch, rng):
        return fwd_params(state.params, state.batch_stats, batch, rng)

    def grad_only(state, batch, rng):
        return jax.grad(fwd_params)(state.params, state.batch_stats, batch,
                                    rng)

    step_fn = make_train_step(model, tx, anchors, hyp)

    t_fwd = timed_scan(fwd_only, state, b, rng)
    print(f"fwd+loss      : {t_fwd*1e3:8.1f} ms/step", flush=True)
    t_grad = timed_scan(grad_only, state, b, rng)
    print(f"grad          : {t_grad*1e3:8.1f} ms/step", flush=True)

    def step_wrap(state, batch, rng):
        s2, m = step_fn(state, batch, rng)
        return m["total"]
    t_step = timed_scan(step_wrap, state, b, rng)
    print(f"full step     : {t_step*1e3:8.1f} ms/step (in-scan, state "
          f"carried on device)", flush=True)

    # the real dispatch path (state round-trips through the jit boundary,
    # with and without buffer donation)
    plain = jax.jit(step_fn)
    donated = jax.jit(step_fn, donate_argnums=(0,))
    for name, f in (("plain jit", plain), ("donated jit", donated)):
        s = jax.tree_util.tree_map(jnp.copy, state)
        out = f(s, b, rng)
        jax.block_until_ready(jax.tree_util.tree_leaves(out[0].params)[0])
        n = 8
        s, _ = out
        t0 = time.perf_counter()
        for _ in range(n):
            s, m = f(s, b, rng)
        float(np.asarray(m["total"]))
        dt = (time.perf_counter() - t0) / n
        print(f"{name:14s}: {dt*1e3:8.1f} ms/step (dispatch loop)",
              flush=True)

    # augmentation graph
    from mmidet_tpu.data.augment import AugmentHyp, make_batch_augment
    aug = make_batch_augment(img, AugmentHyp(), 60, mosaic=True)
    jb = {"rgb4": jnp.tile(b["rgb"][:, None], (1, 4, 1, 1, 1)),
          "ir4": jnp.tile(b["ir"][:, None], (1, 4, 1, 1, 1)),
          "labels4": jnp.tile(b["targets"][:, None], (1, 4, 1, 1)),
          "mask4": jnp.tile(b["mask"][:, None], (1, 4, 1))}
    t_aug = None
    try:
        t_aug = timed_scan(lambda s, bb, r: aug(bb, r)["rgb"], state, jb, rng)
        print(f"aug graph     : {t_aug*1e3:8.1f} ms/step", flush=True)
    except Exception as e:
        print(f"aug graph     : skipped ({type(e).__name__}: {str(e)[:80]})",
              flush=True)

    # fused pipelined program — the trainer's hot path since round 4: ONE
    # jit program runs train-step N and augmentation N+1 (data-independent
    # subgraphs, so XLA interleaves the augmentation's gather/DMA work with
    # the step's MXU work instead of serializing two dispatches).  The aug
    # output is folded into the returned scalar so DCE can't drop it.
    t_fused = None
    if t_aug is not None:
        jb_aug = jax.jit(aug)(jb, rng)

        def fused(state, bpair, rng):
            _, m = step_fn(state, bpair[0], rng)
            out = aug(bpair[1], rng)
            return (m["total"]
                    + jnp.sum(out["rgb"].astype(jnp.float32)) * 1e-9)

        try:
            t_fused = timed_scan(fused, state, (jb_aug, jb), rng)
            print(f"fused step+aug: {t_fused*1e3:8.1f} ms/step "
                  f"(pipelined trainer hot path)", flush=True)
        except Exception as e:
            print(f"fused step+aug: skipped ({type(e).__name__}: "
                  f"{str(e)[:80]})", flush=True)

    # ---- driver-parseable end-to-end training-throughput record ----
    # Full step + full on-device mosaic/warp/HSV graph == the reference's
    # end-to-end train.py configuration (BASELINE.json configs[4]).
    if t_aug is not None and jax.devices()[0].platform == "tpu":
        t_e2e = t_fused if t_fused is not None else (t_step + t_aug)
        e2e = batch / t_e2e
        record = {
            "metric": "yolov5s_twostream_640_mosaic_train",
            "value": round(e2e, 1),
            "unit": "img/s",
            "batch": batch,
            "step_ms": round(t_step * 1e3, 1),
            "aug_ms": round(t_aug * 1e3, 1),
            "fused_ms": round(t_fused * 1e3, 1) if t_fused else -1.0,
            # dp=8 expectation (PERF.md "Multi-chip scaling"): grads
            # all-reduce ~180 MB over the v5e ICI ring ~45 GB/s -> ~8 ms
            # vs the measured step -> ~7.5x at dp=8, global batch 8x
            "dp8_expected": round(
                e2e * 8 * t_e2e / (t_e2e + 0.008), 1),
        }
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import bench
        bench._stage_partial(record)
        print(f"e2e mosaic train: {e2e:8.1f} img/s (staged to "
              f"BENCH_partial.json)", flush=True)


if __name__ == "__main__":
    main()
