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


def test_x64_off_rejects_explicit_float64_requests():
    """With DQGP_X64=0, an explicit float64 request must raise rather than
    silently return float32-grade values under an f64 label — both on the
    QuantumKernel facade and the dataset generator."""
    code = "\n".join([
        "import jax",
        "jax.config.update('jax_platforms','cpu')",
        "import dqgp_tpu",
        "from dqgp_tpu.models.circuits import build_circuit",
        "from dqgp_tpu.models.kernels import QuantumKernelSpec",
        "from dqgp_tpu.models.kernels.quantum_kernel import QuantumKernel",
        "from dqgp_tpu.data import generate_quantum_gp_data",
        "spec = QuantumKernelSpec(circuit=build_circuit('hubregtsen', 2, 1, 1),",
        "                         kernel_type='projected', outer_kernel='gaussian')",
        "def expect_raise(fn):",
        "    try:",
        "        fn()",
        "    except ValueError as e:",
        "        assert 'x64' in str(e), e",
        "    else:",
        "        raise AssertionError('no ValueError')",
        "expect_raise(lambda: QuantumKernel(spec, dtype='float64'))",
        "expect_raise(lambda: generate_quantum_gp_data(",
        "    num_samples=4, input_dim=1, spec=spec, gram_dtype='float64'))",
        "# auto must quietly resolve to f32 (no raise) when x64 is off",
        "QuantumKernel(spec, dtype='auto')",
        "print('GUARDS_OK')",
    ])
    r = _run(code, JAX_PLATFORMS="cpu", DQGP_X64="0")
    assert r.returncode == 0, r.stderr[-1000:]
    assert r.stdout.strip().splitlines()[-1] == "GUARDS_OK"


def test_resolve_dtype_mode_passthrough():
    from dqgp_tpu.config import resolve_dtype_mode

    for m in ("float64", "float32", "mixed"):
        assert resolve_dtype_mode(m) == m
    # on the CPU test backend, auto = direct f64
    assert resolve_dtype_mode("auto") == "float64"
