"""Per-module numerical parity of the experimental layers (CrossConv,
MixConv2d, Sum, GhostConv) against the reference models/experimental.py.

The full-model parity test (test_torch_parity.py) exercises the flagship
grammar only — these modules appear in hub configs and had no direct
cross-check."""

import os
import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")


@pytest.fixture(scope="module")
def ref_exp():
    sys.path.insert(0, REF)
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        for sub in ("ops", "models", "utils", "transforms"):
            mod = types.ModuleType(f"torchvision.{sub}")
            setattr(tv, sub, mod)
            sys.modules[f"torchvision.{sub}"] = mod
        tv.__version__ = "0.0-stub"
        sys.modules["torchvision"] = tv
    import models.experimental as exp  # noqa: E402
    return exp


def _from_nchw(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _conv_w(t):  # OIHW -> HWIO
    return jnp.asarray(np.transpose(t.detach().numpy(), (2, 3, 1, 0)))


def _bn(module):
    params = {"scale": jnp.asarray(module.weight.detach().numpy()),
              "bias": jnp.asarray(module.bias.detach().numpy())}
    stats = {"mean": jnp.asarray(module.running_mean.numpy()),
             "var": jnp.asarray(module.running_var.numpy())}
    return params, stats


def _randomize_bn(module, rng):
    # the reference applies initialize_weights to every built Model,
    # setting BN eps=1e-3/momentum=0.03 (torch_utils.py:150-151); raw
    # module instantiation here must match our BN_EPS
    module.eps = 1e-3
    with torch.no_grad():
        module.weight.copy_(torch.tensor(rng.uniform(0.5, 1.5,
                                                     module.weight.shape)))
        module.bias.copy_(torch.tensor(rng.normal(0, 0.1,
                                                  module.bias.shape)))
        module.running_mean.copy_(torch.tensor(
            rng.normal(0, 0.2, module.running_mean.shape)))
        module.running_var.copy_(torch.tensor(
            rng.uniform(0.5, 1.5, module.running_var.shape)))


def test_crossconv_matches_reference(ref_exp):
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    m = ref_exp.CrossConv(16, 16, k=3, s=1, shortcut=True).eval().float()
    _randomize_bn(m.cv1.bn, rng)
    _randomize_bn(m.cv2.bn, rng)
    x = torch.tensor(rng.normal(0, 1, (2, 16, 8, 8)), dtype=torch.float32)
    with torch.no_grad():
        ref = _from_nchw(m(x))

    from mmidet_tpu.nn.layers import CrossConv
    ours = CrossConv(16, kernel=3, stride=1, shortcut=True)
    xj = jnp.asarray(_from_nchw(x))
    v = ours.init(jax.random.PRNGKey(0), xj)
    p1, s1 = _bn(m.cv1.bn)
    p2, s2 = _bn(m.cv2.bn)
    v = {"params": {"cv1_conv": {"kernel": _conv_w(m.cv1.conv.weight)},
                    "cv1_bn": p1,
                    "cv2_conv": {"kernel": _conv_w(m.cv2.conv.weight)},
                    "cv2_bn": p2},
         "batch_stats": {"cv1_bn": s1, "cv2_bn": s2}}
    out = ours.apply(v, xj, train=False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_mixconv_matches_reference(ref_exp):
    torch.manual_seed(1)
    rng = np.random.default_rng(1)
    m = ref_exp.MixConv2d(16, 16, k=(1, 3), s=1).eval().float()
    _randomize_bn(m.bn, rng)
    x = torch.tensor(rng.normal(0, 1, (2, 16, 8, 8)), dtype=torch.float32)
    with torch.no_grad():
        ref = _from_nchw(m(x))

    from mmidet_tpu.nn.layers import MixConv2d
    ours = MixConv2d(16, kernels=(1, 3), stride=1)
    xj = jnp.asarray(_from_nchw(x))
    v = ours.init(jax.random.PRNGKey(0), xj)
    pb, sb = _bn(m.bn)
    params = {"bn": pb}
    for i, br in enumerate(m.m):
        assert v["params"][f"m{i}"]["kernel"].shape == \
            _conv_w(br.weight).shape, "channel split diverges from ref"
        params[f"m{i}"] = {"kernel": _conv_w(br.weight)}
    v = {"params": params, "batch_stats": {"bn": sb}}
    out = ours.apply(v, xj, train=False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_sum_weighted_matches_reference(ref_exp):
    rng = np.random.default_rng(2)
    m = ref_exp.Sum(3, weight=True).eval().float()
    xs_t = [torch.tensor(rng.normal(0, 1, (2, 4, 4, 8)),
                         dtype=torch.float32) for _ in range(3)]
    with torch.no_grad():
        ref = m(xs_t).numpy()

    from mmidet_tpu.nn.layers import Sum
    ours = Sum(3, weighted=True)
    xs = [jnp.asarray(x.numpy()) for x in xs_t]
    v = ours.init(jax.random.PRNGKey(0), xs)
    # identical (deterministic) init: -arange(1, n)/2
    np.testing.assert_allclose(np.asarray(v["params"]["w"]),
                               m.w.detach().numpy(), rtol=1e-6)
    out = ours.apply(v, xs)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_ghostconv_matches_reference(ref_exp):
    torch.manual_seed(3)
    rng = np.random.default_rng(3)
    m = ref_exp.GhostConv(16, 16, k=1, s=1).eval().float()
    _randomize_bn(m.cv1.bn, rng)
    _randomize_bn(m.cv2.bn, rng)
    x = torch.tensor(rng.normal(0, 1, (2, 16, 8, 8)), dtype=torch.float32)
    with torch.no_grad():
        ref = _from_nchw(m(x))

    from mmidet_tpu.nn.layers import GhostConv
    ours = GhostConv(16, kernel=1, stride=1)
    xj = jnp.asarray(_from_nchw(x))
    v = ours.init(jax.random.PRNGKey(0), xj)
    p1, s1 = _bn(m.cv1.bn)
    p2, s2 = _bn(m.cv2.bn)
    v = {"params": {"cv1": {"conv": {"kernel": _conv_w(m.cv1.conv.weight)},
                            "bn": p1},
                    "cv2": {"conv": {"kernel": _conv_w(m.cv2.conv.weight)},
                            "bn": p2}},
         "batch_stats": {"cv1": {"bn": s1}, "cv2": {"bn": s2}}}
    out = ours.apply(v, xj, train=False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def ref_act():
    sys.path.insert(0, REF)
    import utils.activations as acts  # noqa: E402
    return acts


def test_frelu_matches_reference(ref_act):
    from mmidet_tpu.nn.activations import FReLU
    torch.manual_seed(1)
    rng = np.random.default_rng(1)
    m = ref_act.FReLU(12, k=3).eval().float()
    _randomize_bn(m.bn, rng)
    x = torch.tensor(rng.normal(0, 1, (2, 12, 8, 8)), dtype=torch.float32)
    with torch.no_grad():
        ref = _from_nchw(m(x))

    ours = FReLU(features=12)
    variables = {
        "params": {"conv": {"kernel": _conv_w(m.conv.weight)},
                   "bn": _bn(m.bn)[0]},
        "batch_stats": {"bn": _bn(m.bn)[1]},
    }
    got = ours.apply(variables, jnp.asarray(_from_nchw(x)), train=False)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_aconc_matches_reference(ref_act):
    from mmidet_tpu.nn.activations import AconC
    torch.manual_seed(2)
    rng = np.random.default_rng(2)
    m = ref_act.AconC(10).eval().float()
    x = torch.tensor(rng.normal(0, 1, (2, 10, 6, 6)), dtype=torch.float32)
    with torch.no_grad():
        ref = _from_nchw(m(x))
    variables = {"params": {
        "p1": jnp.asarray(m.p1.detach().numpy().reshape(-1)),
        "p2": jnp.asarray(m.p2.detach().numpy().reshape(-1)),
        "beta": jnp.asarray(m.beta.detach().numpy().reshape(-1))}}
    got = AconC(features=10).apply(variables, jnp.asarray(_from_nchw(x)))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-6)


def test_meta_aconc_matches_reference(ref_act):
    from mmidet_tpu.nn.activations import MetaAconC
    torch.manual_seed(3)
    rng = np.random.default_rng(3)
    m = ref_act.MetaAconC(32).eval().float()
    x = torch.tensor(rng.normal(0, 1, (2, 32, 8, 8)), dtype=torch.float32)
    with torch.no_grad():
        ref = _from_nchw(m(x))
    variables = {"params": {
        "p1": jnp.asarray(m.p1.detach().numpy().reshape(-1)),
        "p2": jnp.asarray(m.p2.detach().numpy().reshape(-1)),
        "fc1": {"kernel": _conv_w(m.fc1.weight),
                "bias": jnp.asarray(m.fc1.bias.detach().numpy())},
        "fc2": {"kernel": _conv_w(m.fc2.weight),
                "bias": jnp.asarray(m.fc2.bias.detach().numpy())}}}
    got = MetaAconC(features=32).apply(variables,
                                       jnp.asarray(_from_nchw(x)))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-6)
