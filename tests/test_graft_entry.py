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
    # the DCN-outer hybrid mesh case must actually run on 8 devices
    assert "hybrid 2x4 DCN-outer mesh ok" in out


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


def test_dryrun_noncpu_default_backend_routes_to_subprocess(monkeypatch):
    """Round-2 failure mode: device listing works but the DEFAULT backend is
    the real TPU (eager dispatch would hit the chip). The dryrun must not run
    in-process; it must re-exec a cpu-pinned child that asserts its backend.
    """
    import __graft_entry__ as g

    monkeypatch.setattr(g.jax, "default_backend", lambda: "tpu")
    calls = {}

    def fake_run(argv, env=None, cwd=None, **kw):
        calls["argv"], calls["env"] = argv, env

        class P:
            returncode = 0

        return P()

    monkeypatch.setattr(g.subprocess, "run", fake_run)
    g.dryrun_multichip(8)
    code = calls["argv"][-1]
    assert "jax.default_backend() == 'cpu'" in code
    assert calls["env"][g._CHILD_ENV_VAR] == "1"
    assert (
        "--xla_force_host_platform_device_count=8" in calls["env"]["XLA_FLAGS"]
    )
    assert calls["env"]["JAX_PLATFORMS"] == "cpu"


def test_dryrun_inprocess_exception_falls_back_to_subprocess(monkeypatch):
    """ANY exception from the in-process attempt (e.g. a TPU-side condition
    leaking into dispatch) must route to the subprocess, not propagate."""
    import __graft_entry__ as g

    def boom(devices, n):
        raise RuntimeError("FAILED_PRECONDITION: libtpu version mismatch")

    monkeypatch.setattr(g, "_dryrun_impl", boom)
    ran = {}

    def fake_run(argv, env=None, cwd=None, **kw):
        ran["yes"] = True

        class P:
            returncode = 0

        return P()

    monkeypatch.setattr(g.subprocess, "run", fake_run)
    g.dryrun_multichip(8)
    assert ran.get("yes")


def test_dryrun_child_never_recurses(monkeypatch):
    """A child that still lacks a clean CPU backend raises; it never forks."""
    import __graft_entry__ as g

    monkeypatch.setenv(g._CHILD_ENV_VAR, "1")
    monkeypatch.setattr(g.jax, "default_backend", lambda: "tpu")

    def no_fork(*a, **kw):  # pragma: no cover - must not be reached
        raise AssertionError("child must not re-exec")

    monkeypatch.setattr(g.subprocess, "run", no_fork)
    with pytest.raises(RuntimeError, match="clean 8-device CPU backend"):
        g.dryrun_multichip(8)


def test_dryrun_child_exception_propagates(monkeypatch):
    """In the clean child, an impl failure must surface (not loop)."""
    import __graft_entry__ as g

    monkeypatch.setenv(g._CHILD_ENV_VAR, "1")

    def boom(devices, n):
        raise ValueError("impl bug")

    monkeypatch.setattr(g, "_dryrun_impl", boom)
    with pytest.raises(ValueError, match="impl bug"):
        g.dryrun_multichip(8)


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
