"""Runtime-config knobs (dqgp_tpu.config + package-init env handling).

Env-driven behavior is tested in subprocesses so each case sees a fresh
import with its own environment.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code, **env):
    e = dict(os.environ)
    e.update(env)
    e["PYTHONPATH"] = REPO + os.pathsep + e.get("PYTHONPATH", "")
    return subprocess.run([sys.executable, "-c", code], env=e,
                          capture_output=True, text=True, timeout=300)


def test_compile_cache_knob():
    r = _run(
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import dqgp_tpu;"
        "print(jax.config.jax_compilation_cache_dir)",
        JAX_PLATFORMS="cpu", DQGP_COMPILE_CACHE="/tmp/dqgp_cache_test_knob",
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert r.stdout.strip().splitlines()[-1] == "/tmp/dqgp_cache_test_knob"


def test_compile_cache_off_by_default():
    env = {k: v for k, v in os.environ.items() if k != "DQGP_COMPILE_CACHE"}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import dqgp_tpu;"
         "print(jax.config.jax_compilation_cache_dir)"],
        env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-500:]
    assert r.stdout.strip().splitlines()[-1] == "None"


def test_x64_knob_off():
    r = _run(
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import dqgp_tpu;"
        "print(jax.config.jax_enable_x64)",
        JAX_PLATFORMS="cpu", DQGP_X64="0",
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert r.stdout.strip().splitlines()[-1] == "False"


def test_jax_platforms_env_honored_without_manual_pin():
    """Importing dqgp_tpu alone must land on the CPU backend when
    JAX_PLATFORMS=cpu, even though this image's sitecustomize registers an
    overriding accelerator plugin (whose init can hang when its relay is
    down — this test would time out on regression)."""
    r = _run(
        "import dqgp_tpu; import jax;"
        "print(jax.default_backend())",
        JAX_PLATFORMS="cpu",
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert r.stdout.strip().splitlines()[-1] == "cpu"


def test_resolve_dtype_mode_passthrough():
    from dqgp_tpu.config import resolve_dtype_mode

    for m in ("float64", "float32", "mixed"):
        assert resolve_dtype_mode(m) == m
    # on the CPU test backend, auto = direct f64
    assert resolve_dtype_mode("auto") == "float64"
