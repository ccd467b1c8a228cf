"""The driver validates multi-chip sharding through __graft_entry__.

dryrun_multichip must self-arrange N virtual CPU devices even though this
image's sitecustomize boots an 'axon' TPU PJRT plugin that overrides the
JAX_PLATFORMS env var (it must force the cpu platform through jax.config
before/around backend init).  Run in a subprocess: the workaround mutates
process-global jax state."""

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("env_flags", [None, "--xla_force_host_platform_device_count=2"])
def test_dryrun_multichip_forces_virtual_cpu_devices(env_flags):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    if env_flags is None:
        env.pop("XLA_FLAGS", None)
    else:
        env["XLA_FLAGS"] = env_flags
    env["PYTHONPATH"] = _REPO
    p = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(2); print('DRYRUN_OK')"],
        env=env, cwd=_REPO, capture_output=True, text=True, timeout=600,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    assert "DRYRUN_OK" in p.stdout
