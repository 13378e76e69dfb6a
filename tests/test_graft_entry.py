"""Driver entry-point regression tests.

Round-1 shipped ``dryrun_multichip`` broken in the driver environment (it
assumed >=n devices already existed). These tests pin the contract: it must
work both when enough devices exist (conftest's 8-CPU mesh) and when the
requested count exceeds what's visible (subprocess re-exec path).
"""

import subprocess
import sys

import jax
import pytest


def test_dryrun_multichip_inprocess(capsys):
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "sharded gallery top1 ok" in out


@pytest.mark.slow
def test_dryrun_multichip_exceeds_visible_devices():
    """n > visible devices → self-provision (subprocess re-exec path)."""
    import __graft_entry__ as g

    assert len(jax.devices()) < 16
    g.dryrun_multichip(16)


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 512)


@pytest.mark.slow
def test_dryrun_from_tpu_like_process():
    """Simulate the driver: fresh process, 1-device default backend."""
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert len(jax.devices()) == 1, jax.devices(); "
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root"},
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "sharded gallery top1 ok" in proc.stdout
