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


def export_savedmodel(path: str, model, variables, img_size: int = 640,
                      batch_size: int = 1, two_stream: bool = True,
                      with_decode: bool = True, dtype=jnp.float32,
                      native: bool = True) -> str:
    """Cross-runtime export: TF SavedModel via ``jax2tf`` (the portable
    path the reference serves with ONNX/TorchScript/CoreML,
    models/export.py:66-124).  The SavedModel embeds the StableHLO of the
    jitted forward (native serialization) and runs under plain TensorFlow —
    CPU/GPU servers, TF-Serving, or a further TFLite conversion — with no
    JAX at inference time."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    def fwd(rgb, ir):
        out = model.apply(variables, rgb, ir, train=False,
                          decode=with_decode) if two_stream else \
            model.apply(variables, rgb, train=False, decode=with_decode)
        return out["pred"] if with_decode else tuple(out["train_outs"])

    shape = (batch_size, img_size, img_size, 3)
    tf_dtype = tf.float32 if dtype == jnp.float32 else tf.bfloat16
    sig = [tf.TensorSpec(shape, tf_dtype, name="rgb")]
    # native=True embeds StableHLO (exact, needs a TF/TFLite runtime with
    # StableHLO kernels); native=False lowers to plain TF graph ops (the
    # TFLite-builtins-compatible path)
    kw = dict(with_gradient=False, native_serialization=native)
    if two_stream:
        sig.append(tf.TensorSpec(shape, tf_dtype, name="ir"))
        tf_fwd = jax2tf.convert(fwd, **kw)
    else:
        tf_fwd = jax2tf.convert(lambda rgb: fwd(rgb, None), **kw)
    module = tf.Module()
    module.serve = tf.function(tf_fwd, input_signature=sig)
    tf.saved_model.save(
        module, path,
        options=tf.saved_model.SaveOptions(experimental_custom_gradients=False))
    return path


def export_tflite(savedmodel_path: str, out_path: str,
                  native: bool = False) -> str:
    """SavedModel -> .tflite flatbuffer (edge deployment — the role the
    reference's CoreML export plays, models/export.py:99-114).

    Pass a SavedModel exported with the matching ``native`` flag:
    ``native=False`` (default) converts plain graph ops to TFLite
    builtins (+SELECT_TF_OPS) — runnable by any current TFLite runtime;
    ``native=True`` keeps StableHLO ops (exact, smaller, but requires a
    TFLite runtime with StableHLO kernel support)."""
    import tensorflow as tf
    conv = tf.lite.TFLiteConverter.from_saved_model(savedmodel_path)
    hlo_ops = getattr(tf.lite.OpsSet, "EXPERIMENTAL_STABLEHLO_OPS", None)
    if native and hlo_ops is not None:
        # StableHLO ops must be the ONLY ops set when used
        conv.target_spec.supported_ops = [hlo_ops]
    else:
        conv.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS,
                                          tf.lite.OpsSet.SELECT_TF_OPS]
    blob = conv.convert()
    with open(out_path, "wb") as fh:
        fh.write(blob)
    return out_path


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
    p.add_argument("--savedmodel", action="store_true",
                   help="also export a TF SavedModel via jax2tf "
                        "(cross-runtime; no JAX at inference)")
    p.add_argument("--tflite", action="store_true",
                   help="also convert the SavedModel to .tflite")
    p.add_argument("--onnx", action="store_true",
                   help="also export an ONNX graph (opset 17; emitted "
                        "structurally, no onnx package needed — see "
                        "deploy/onnx_export.py)")
    p.add_argument("--batch-size", type=int, default=1)
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
    if args.savedmodel or args.tflite:
        from mmidet_tpu.models.spec import is_two_stream
        two = is_two_stream(spec)
        sm = os.path.join(path, "savedmodel")
        export_savedmodel(sm, model, variables, img_size=args.img_size,
                          batch_size=args.batch_size, two_stream=two)
        print(f"exported TF SavedModel -> {sm}")
        if args.tflite:
            # TFLite builtins need the graph-ops (non-native) lowering
            sm_graph = os.path.join(path, "savedmodel_graph")
            export_savedmodel(sm_graph, model, variables,
                              img_size=args.img_size,
                              batch_size=args.batch_size, two_stream=two,
                              native=False)
            tfl = export_tflite(sm_graph,
                                os.path.join(path, "model.tflite"))
            print(f"exported TFLite -> {tfl}")
    if args.onnx:
        from mmidet_tpu.deploy.onnx_export import export_onnx
        from mmidet_tpu.nn.fuse import fold_batchnorm
        onnx_path = os.path.join(path, "model.onnx")
        folded = variables if "batch_stats" not in variables else \
            fold_batchnorm(variables)
        export_onnx(spec, folded, args.img_size, onnx_path,
                    use_cem=getattr(model, "use_cem", True))
        print(f"exported ONNX (opset 17) -> {onnx_path}")
    return path


if __name__ == "__main__":
    main()
