"""s8-storage deploy accuracy gate (VERDICT r3 #6): the int8-activation
deploy mode must not move mAP50 materially vs the float deploy path on a
converged model.

The official chip-scale record (s-scale @160, 1500 epochs, real v5e) is
captured per round by ``tools/s8_gate.py --stage`` and recorded in
PERF.md.  This test runs the same gate end-to-end at CPU scale (t-model,
96 px) — small enough for CI, converged enough that the delta is
activation-rounding, not training noise.  Bound 0.02: the measured
deltas on converged models straddle zero (int8 sometimes BETTER — the
rounding jitters borderline matches), so a tight one-sided bound would
just measure eval noise.
"""

import pytest

jax = pytest.importorskip("jax")


@pytest.mark.slow
def test_s8_deploy_map50_gate(tmp_path):
    from tools.s8_gate import main

    rc = main(["--epochs", "600", "--img", "96", "--scale", "t",
               "--batch", "8", "--n", "8", "--gate", "0.02",
               "--warmup-floor", "50", "--out", str(tmp_path)])
    assert rc == 0, "int8-vs-float mAP50 delta exceeded 0.02"
