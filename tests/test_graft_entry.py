"""Driver-boundary checks for __graft_entry__ (VERDICT round-1 item #1).

The round-1 driver run failed because ``dryrun_multichip`` asserted on
``jax.devices()`` instead of provisioning its own virtual CPU mesh. These
tests pin both paths:

* direct path — the conftest already provides 8 virtual CPU devices, so the
  dryrun executes in-process;
* re-exec path — a parent that can only see 1 device (the axon driver
  scenario) must transparently re-exec into a child with
  ``--xla_force_host_platform_device_count=n`` and still succeed, even when
  the parent's XLA_FLAGS already pins a *smaller* device count.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_direct(capfd):
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)
    g.dryrun_multichip(8)
    out = capfd.readouterr().out
    assert "dryrun_multichip(8)" in out and "OK" in out


@pytest.mark.slow
def test_dryrun_multichip_reexec_from_one_device():
    # Parent deliberately restricted to ONE virtual device; the entry must
    # notice and re-exec with an 8-device child rather than assert or recurse.
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun_multichip(8)" in r.stdout and "OK" in r.stdout
