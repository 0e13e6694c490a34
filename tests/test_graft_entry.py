"""Guard the driver entry points (__graft_entry__): two rounds of red
MULTICHIP artifacts came from this file, so its hermeticity contract is
pinned here.

The dryrun MUST NOT be able to touch a TPU client (broken or otherwise):
it re-execs in a subprocess with the axon plugin de-registered and
JAX_PLATFORMS=cpu + --xla_force_host_platform_device_count=<n>.
"""

import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def test_dryrun_child_env_is_hermetic(monkeypatch):
    import __graft_entry__ as g

    captured = {}

    def fake_run(cmd, env=None, **kw):
        captured["cmd"], captured["env"] = cmd, env

        class P:
            returncode = 0
            stdout = "stubbed\n"
        return P()

    monkeypatch.setattr(subprocess, "run", fake_run)
    # simulate the round-2 failure environment: axon plugin registered,
    # a stale device-count force, a TPU platform preference
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    monkeypatch.setenv("JAX_PLATFORM_NAME", "tpu")
    monkeypatch.setenv(
        "XLA_FLAGS", "--xla_foo=1 --xla_force_host_platform_device_count=2")
    monkeypatch.delenv(g._DRYRUN_CHILD_ENV, raising=False)

    g.dryrun_multichip(8)

    env = captured["env"]
    assert "PALLAS_AXON_POOL_IPS" not in env          # plugin de-registered
    assert "JAX_PLATFORM_NAME" not in env
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env[g._DRYRUN_CHILD_ENV] == "1"
    flags = env["XLA_FLAGS"].split()
    assert "--xla_force_host_platform_device_count=8" in flags
    assert "--xla_foo=1" in flags                      # other flags kept
    assert sum(f.startswith("--xla_force_host_platform_device_count")
               for f in flags) == 1                    # stale force replaced
    assert captured["cmd"][0] == sys.executable


def test_dryrun_child_failure_raises(monkeypatch):
    import __graft_entry__ as g

    def fake_run(cmd, env=None, **kw):
        class P:
            returncode = 3
            stdout = "boom\n"
        return P()

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.delenv(g._DRYRUN_CHILD_ENV, raising=False)
    with pytest.raises(RuntimeError, match="rc=3"):
        g.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_2dev_end_to_end():
    """The real thing, at the cheapest mesh (2 devices: data=1, model=2)."""
    import __graft_entry__ as g
    g.dryrun_multichip(2)
