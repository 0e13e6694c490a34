"""Model ensembling.

Functional parity surface: reference ``Ensemble`` + ``attempt_load``
(models/experimental.py:100-134): when several checkpoints are given, run
each model and concatenate their decoded predictions before NMS (the
reference's NMS-ensemble mode)."""

from __future__ import annotations

import jax.numpy as jnp


class Ensemble:
    """Callable over (model, variables) pairs; concatenates decoded preds
    along the box axis (ref Ensemble.forward 'nms ensemble')."""

    def __init__(self, members: list[tuple]):
        assert members, "empty ensemble"
        self.members = members

    def __call__(self, rgb, ir=None, **kw):
        preds = []
        out = None
        for model, variables in self.members:
            args = (rgb,) if ir is None else (rgb, ir)
            out = model.apply(variables, *args, train=False, **kw)
            preds.append(out["pred"])
        return {"pred": jnp.concatenate(preds, axis=1),
                "train_outs": out["train_outs"], "aux": out.get("aux", {})}


def attempt_load_ensemble(bundles: list[str]):
    """Load several deploy bundles into an Ensemble (ref attempt_load with a
    list of weights)."""
    from mmidet_tpu.deploy.export import load_deploy_bundle
    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.models.spec import is_two_stream
    members = []
    for path in bundles:
        spec, variables, meta = load_deploy_bundle(path)
        # single-stream bundles have no CEM ('enhance') params — derive
        # use_cem from the spec exactly as hub.custom does
        model = TwoStreamDetector(spec=spec, use_cem=is_two_stream(spec),
                                  aux_mode="off", dtype=jnp.bfloat16)
        members.append((model, variables))
    return Ensemble(members)
