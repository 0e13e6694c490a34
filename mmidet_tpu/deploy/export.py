"""Model export for deployment.

Functional parity surface: reference ``models/export.py:24-127`` (TorchScript
/ ONNX / CoreML).  The TPU-native equivalents:
  * **StableHLO** via ``jax.export`` — the portable compiled-artifact format
    of the XLA ecosystem (plays the role ONNX plays for the reference);
    serialized bytes round-trip with ``deserialize`` and run on any XLA
    backend;
  * an **orbax deploy bundle** (params + batch_stats + model metadata) — the
    ``strip_optimizer``'d distributable checkpoint;
  * inference wrapper with the Detect decode baked in (the reference's
    ``model.model[-1].export`` toggle decides whether decode is exported —
    mirrored by ``with_decode``).
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp


def export_stablehlo(model, variables, img_size: int = 640,
                     batch_size: int = 1, two_stream: bool = True,
                     with_decode: bool = True, dtype=jnp.float32) -> bytes:
    """Serialize the jitted inference function to StableHLO bytes."""
    from jax import export as jexport

    def fwd(rgb, ir=None):
        out = model.apply(variables, rgb, ir, train=False,
                          decode=with_decode) if two_stream else \
            model.apply(variables, rgb, train=False, decode=with_decode)
        return out["pred"] if with_decode else tuple(out["train_outs"])

    shape = (batch_size, img_size, img_size, 3)
    args = (jax.ShapeDtypeStruct(shape, dtype),) * (2 if two_stream else 1)
    exported = jexport.export(jax.jit(fwd))(*args)
    return bytes(exported.serialize())


def load_stablehlo(blob: bytes):
    """Deserialize an exported artifact back to a callable."""
    from jax import export as jexport
    exported = jexport.deserialize(blob)
    return exported.call


def export_deploy_bundle(path: str, model, variables, spec,
                         names: list[str] | None = None,
                         img_size: int = 640) -> str:
    """Write a self-contained deploy dir: orbax variables + model metadata
    (+ StableHLO artifact)."""
    import dataclasses
    import orbax.checkpoint as ocp
    os.makedirs(path, exist_ok=True)
    vdir = os.path.abspath(os.path.join(path, "variables"))
    if os.path.isdir(vdir):  # re-export overwrites (orbax save refuses
        import shutil        # existing checkpoint dirs by default)
        shutil.rmtree(vdir)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(vdir, variables)
    meta = {
        "nc": spec.nc,
        "names": names or [str(i) for i in range(spec.nc)],
        "anchors": [list(a) for a in spec.anchors],
        "strides": list(spec.strides),
        "depth_multiple": spec.depth_multiple,
        "width_multiple": spec.width_multiple,
        "img_size": img_size,
        "layers": [dataclasses.asdict(l) for l in spec.layers],
    }
    with open(os.path.join(path, "model.json"), "w") as fh:
        json.dump(meta, fh, indent=1, default=list)
    try:
        blob = export_stablehlo(model, variables, img_size)
        with open(os.path.join(path, "model.stablehlo"), "wb") as fh:
            fh.write(blob)
    except Exception as e:  # serialization is best-effort per-backend
        with open(os.path.join(path, "stablehlo_export_error.txt"),
                  "w") as fh:
            fh.write(repr(e))
    return path


def load_deploy_bundle(path: str):
    """Load (spec, variables, meta) from a deploy dir."""
    import orbax.checkpoint as ocp
    from mmidet_tpu.models.spec import LayerDef, ModelSpec
    with open(os.path.join(path, "model.json")) as fh:
        meta = json.load(fh)
    spec = ModelSpec(
        nc=meta["nc"],
        anchors=tuple(tuple(a) for a in meta["anchors"]),
        layers=tuple(LayerDef(
            f=tuple(l["f"]) if isinstance(l["f"], list) else l["f"],
            n=l["n"], name=l["name"],
            args=tuple(tuple(a) if isinstance(a, list) else a
                       for a in l["args"]))
            for l in meta["layers"]),
        depth_multiple=meta["depth_multiple"],
        width_multiple=meta["width_multiple"],
        strides=tuple(meta["strides"]))
    with ocp.StandardCheckpointer() as ckptr:
        variables = ckptr.restore(
            os.path.abspath(os.path.join(path, "variables")))
    return spec, variables, meta


def main(argv=None):
    """Export CLI — the reference's ``models/export.py`` __main__
    (export.py:24-127): weights in, deployable artifacts out."""
    import argparse

    from mmidet_tpu.utils.general import set_logging

    p = argparse.ArgumentParser("mmidet-tpu export")
    p.add_argument("--cfg", type=str, default="yolov5l_fuse3_fourier",
                   help="zoo model name or model YAML path")
    p.add_argument("--weights", type=str, default="",
                   help="orbax deploy dir or torch .pt (blank: fresh init)")
    p.add_argument("--nc", type=int, default=6)
    p.add_argument("--names", type=str, nargs="*", default=None)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--out", type=str, default="runs/export/bundle")
    args = p.parse_args(argv)
    set_logging()

    from mmidet_tpu.cli.val import load_model_and_vars
    model, variables, spec = load_model_and_vars(args.cfg, args.weights,
                                                 args.nc)
    path = export_deploy_bundle(args.out, model, variables, spec,
                                names=args.names, img_size=args.img_size)
    have_hlo = os.path.isfile(os.path.join(path, "model.stablehlo"))
    hlo_msg = ("yes" if have_hlo else
               "unavailable on this backend — see stablehlo_export_error.txt")
    print(f"exported deploy bundle -> {path} (StableHLO: {hlo_msg})")
    return path


if __name__ == "__main__":
    main()
