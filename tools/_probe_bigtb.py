"""Probe bigger batch tiles at d=64/128/256 (canonical kernel, tile_b
override — the round-1 verdict: bigger tiles do not pay at these widths)."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import functools
from tools._probe_abl import bench
from mmidet_tpu.nn.transformer_pallas import fused_token_transformer

BIG = {64: 32, 128: 32, 256: 16}
for d in [64, 128, 256]:
    fn = functools.partial(fused_token_transformer, tile_b=BIG[d])
    print(f"d={d}: bigtb={bench(fn, d):.2f}ms", flush=True)
