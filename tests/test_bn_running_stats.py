"""BatchNorm running-statistics update parity (train-mode buffers).

The step-equivalence tests (test_torch_parity.py) pin BN in EVAL mode, so
the running-stat UPDATE path was untested.  This pins it directly against
live torch BatchNorm2d under the reference's quirk constants
(initialize_weights, utils/torch_utils.py:150-151: eps=1e-3,
momentum=0.03 -> flax momentum 0.97):

  * running_mean update: EXACT (same EMA recurrence, same batch mean);
  * running_var update: flax stores the BIASED batch variance
    (normalization.py:404), torch stores the Bessel-corrected UNBIASED
    one (factor n/(n-1), n = batch*spatial elements per channel).  This
    is a KNOWN DEVIATION (PARITY.md): exact once the factor is applied,
    and bounded by n/(n-1) <= 1.5% at the smallest product feature map
    (stride-32 level, batch 8).  Train-mode normalization itself uses the
    biased variance in BOTH frameworks, so only eval-through-running-stats
    feels it.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

BN_EPS = 1e-3
TORCH_MOMENTUM = 0.03


def _flax_bn_stats(x_nhwc: np.ndarray, steps: int):
    import flax.linen as fnn
    import jax
    import jax.numpy as jnp

    from mmidet_tpu.nn.layers import BN_EPS as OUR_EPS
    from mmidet_tpu.nn.layers import BN_MOMENTUM as OUR_MOMENTUM

    assert OUR_EPS == BN_EPS
    assert abs((1.0 - OUR_MOMENTUM) - TORCH_MOMENTUM) < 1e-12

    bn = fnn.BatchNorm(use_running_average=False, momentum=OUR_MOMENTUM,
                       epsilon=OUR_EPS)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x_nhwc))
    outs = []
    for _ in range(steps):
        y, mut = bn.apply(variables, jnp.asarray(x_nhwc),
                          mutable=["batch_stats"])
        variables = {**variables, "batch_stats": mut["batch_stats"]}
        outs.append(np.asarray(y))
    bs = variables["batch_stats"]
    return (np.asarray(bs["mean"]), np.asarray(bs["var"]), outs)


def _torch_bn_stats(x_nhwc: np.ndarray, steps: int):
    c = x_nhwc.shape[-1]
    bn = torch.nn.BatchNorm2d(c, eps=BN_EPS, momentum=TORCH_MOMENTUM)
    bn.train()
    x = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())
    outs = []
    with torch.no_grad():
        for _ in range(steps):
            outs.append(bn(x).permute(0, 2, 3, 1).numpy())
    return (bn.running_mean.numpy(), bn.running_var.numpy(), outs)


@pytest.mark.parametrize("shape", [(8, 3, 3, 16), (4, 12, 12, 8)])
def test_running_stats_update_parity(shape):
    rng = np.random.default_rng(0)
    x = rng.normal(1.5, 2.0, shape).astype(np.float32)
    steps = 5
    f_mean, f_var, f_outs = _flax_bn_stats(x, steps)
    t_mean, t_var, t_outs = _torch_bn_stats(x, steps)

    # train-mode OUTPUTS are exact: both normalize with the biased batch
    # variance of the current batch
    for fo, to in zip(f_outs, t_outs):
        np.testing.assert_allclose(fo, to, rtol=2e-5, atol=2e-5)

    # running_mean recurrence is exact
    np.testing.assert_allclose(f_mean, t_mean, rtol=1e-5, atol=1e-6)

    # running_var: flax biased vs torch unbiased.  Both buffers start at
    # 1 and decay it by momentum^k; the accumulated batch-var increment
    # differs by EXACTLY the Bessel factor n/(n-1) — and by nothing else
    n = shape[0] * shape[1] * shape[2]
    bessel = n / (n - 1)
    decay = (1.0 - TORCH_MOMENTUM) ** steps
    np.testing.assert_allclose((f_var - decay) * bessel, t_var - decay,
                               rtol=1e-5, atol=1e-6)
    # ... and the raw buffers do NOT agree (the deviation is real, and
    # bounded by the Bessel factor: <=1.5% on var at the product's
    # smallest feature map, stride 32 / batch 8 -> n=72)
    rel = np.max(np.abs(f_var - t_var) / np.abs(t_var))
    assert 1e-4 < rel < (bessel - 1.0) + 1e-6
