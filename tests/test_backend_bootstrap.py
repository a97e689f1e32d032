"""Backend selection must work WITHOUT the conftest env override.

Round-1 verdict: the axon TPU plugin ignores the ``JAX_PLATFORMS`` env var,
so both ``main.py --cpu`` and the driver's ``dryrun_multichip`` gate must
route through ``jax.config.update('jax_platforms', 'cpu')`` before backend
init (or re-exec in a subprocess if the backend was already grabbed). These
tests run in clean subprocesses with the platform env stripped, i.e. exactly
the environment the driver invokes us in.
"""
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _clean_env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    return env


def test_main_cpu_flag_forces_cpu_backend():
    """`--cpu` must select the CPU backend even where env vars are ignored."""
    code = (
        "import sys; sys.path.insert(0, '.');"
        "from main import setup_backend; setup_backend(True);"
        "import jax; print('PLATFORM=' + jax.default_backend())"
    )
    r = subprocess.run([sys.executable, "-c", code], cwd=str(REPO),
                       env=_clean_env(), capture_output=True, text=True,
                       timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "PLATFORM=cpu" in r.stdout, r.stdout


@pytest.mark.slow
def test_dryrun_multichip_self_bootstraps():
    """The driver's exact invocation: fresh process, no env prepared."""
    code = "import __graft_entry__ as g; g.dryrun_multichip(8)"
    r = subprocess.run([sys.executable, "-c", code], cwd=str(REPO),
                       env=_clean_env(), capture_output=True, text=True,
                       timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun_multichip(8): ok" in r.stdout, r.stdout


@pytest.mark.slow
def test_dryrun_multichip_after_backend_grab():
    """If an import already initialized a too-small backend, the dryrun must
    re-exec itself in a subprocess rather than fail.

    The too-small backend is a 1-device CPU platform (config-forced, since
    the axon plugin ignores the JAX_PLATFORMS env var) — the same
    ``_backend_initialized() and len(devices) < n`` condition a premature
    TPU grab creates, but deterministic and independent of the TPU tunnel
    (an earlier version grabbed the real chip and would hang the whole CPU
    suite whenever the tunnel was wedged or the chip held elsewhere)."""
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert len(jax.devices()) < 8;"  # 1-device backend grabbed
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    r = subprocess.run([sys.executable, "-c", code], cwd=str(REPO),
                       env=_clean_env(), capture_output=True, text=True,
                       timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun_multichip(8): ok" in r.stdout, r.stdout
