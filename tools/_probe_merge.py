"""fused_gpt_merge (mega-kernel) vs XLA pool+transformer+up+add sequence.

Default: the gpt4 model's P3/P4 shapes, batch 128.  Pass
``hw:d [hw:d ...]`` and ``--batch N`` to probe other levels (e.g. the
flagship l-scale levels 80:256 40:512 20:1024, where d>=256 selects the
layer-major weight-streaming grid inside fused_gpt_merge)."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import numpy as np
import jax, jax.numpy as jnp
from mmidet_tpu.nn.fusion_pallas import fused_gpt_merge
from mmidet_tpu.nn.transformer_pallas import fused_token_transformer
from mmidet_tpu.nn.resize import adaptive_avg_pool, bilinear_resize

args = sys.argv[1:]
B = 128
if "--batch" in args:
    i = args.index("--batch")
    B = int(args[i + 1])
    del args[i:i + 2]
LEVELS = [tuple(int(v) for v in a.split(":")) for a in args] or \
         [(80, 128), (40, 256)]
L, H = 8, 8
ITERS = 20


def mk_weights(d, rng):
    ks = {}
    def mk(shape, dt=jnp.bfloat16):
        return jax.random.normal(rng, shape, dt) * 0.02
    for nm in ["ln1_scale", "ln1_bias", "bq", "bk", "bv", "bo",
               "ln2_scale", "ln2_bias", "b2"]:
        ks[nm] = mk((L, d), jnp.float32)
    for nm in ["wq", "wk", "wv", "wo"]:
        ks[nm] = mk((L, d, d))
    ks["w1"] = mk((L, d, 4 * d)); ks["b1"] = mk((L, 4 * d), jnp.float32)
    ks["w2"] = mk((L, 4 * d, d))
    return ks


def timeit(fn, *args):
    @jax.jit
    def loop(*a):
        def body(c, _):
            o = fn(a[0] + c, a[1] + c, *a[2:])
            r = o[0] if isinstance(o, tuple) else o
            return jnp.sum(r).astype(jnp.bfloat16) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.bfloat16(0.), None, length=ITERS)
        return c
    float(np.asarray(loop(*args)))
    t0 = time.perf_counter()
    float(np.asarray(loop(*args)))
    return (time.perf_counter() - t0) / ITERS * 1e3


for hw, d in LEVELS:
    rng = jax.random.PRNGKey(0)
    rgb = jax.random.normal(rng, (B, hw, hw, d), jnp.bfloat16)
    ir = rgb + 0.1
    ks = mk_weights(d, rng)
    pos = jax.random.normal(rng, (1, 128, d), jnp.float32) * 0.02
    lnfs = jnp.ones((d,), jnp.float32)
    lnfb = jnp.zeros((d,), jnp.float32)

    def xla_seq(rgb, ir, ks, pos, lnfs, lnfb):
        rp = adaptive_avg_pool(rgb, (8, 8)).reshape(B, 64, d)
        ip = adaptive_avg_pool(ir, (8, 8)).reshape(B, 64, d)
        tok = jnp.concatenate([rp, ip], axis=1) + pos.astype(jnp.bfloat16)
        out = fused_token_transformer(tok, ks, num_heads=H)
        o32 = out.astype(jnp.float32)
        mean = o32.mean(-1, keepdims=True)
        var = ((o32 - mean) ** 2).mean(-1, keepdims=True)
        out = ((o32 - mean) * jax.lax.rsqrt(var + 1e-5) * lnfs + lnfb
               ).astype(jnp.bfloat16)
        ro = bilinear_resize(out[:, :64].reshape(B, 8, 8, d), (hw, hw))
        io = bilinear_resize(out[:, 64:].reshape(B, 8, 8, d), (hw, hw))
        return rgb + ro, ir + io

    def mega(rgb, ir, ks, pos, lnfs, lnfb):
        return fused_gpt_merge(rgb, ir, ks, pos, lnfs, lnfb, num_heads=H)

    t_xla = timeit(xla_seq, rgb, ir, ks, pos, lnfs, lnfb)
    t_mega = timeit(mega, rgb, ir, ks, pos, lnfs, lnfb)
    # correctness cross-check
    a = np.asarray(xla_seq(rgb, ir, ks, pos, lnfs, lnfb)[0], np.float32)
    b_ = np.asarray(mega(rgb, ir, ks, pos, lnfs, lnfb)[0], np.float32)
    err = np.abs(a - b_).max()
    print(f"{hw}x{hw} d={d}: xla_seq={t_xla:.2f}ms  mega={t_mega:.2f}ms  "
          f"maxerr={err:.3f}", flush=True)
