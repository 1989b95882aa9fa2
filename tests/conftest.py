"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is exercised without TPU hardware via
``--xla_force_host_platform_device_count`` (SURVEY.md §4 implication (d)).

The axon sitecustomize registers the tunnel-attached TPU at interpreter
startup whenever ``PALLAS_AXON_POOL_IPS`` is set — after that, in-process
env changes cannot reach the CPU backend (measured: ``jax.devices()``
hangs once the plugin is registered and the pool var is cleared, and with
the plugin active a bare suite run lands on ONE TPU chip: bf16 MXU
matmuls break fp32 parity tolerances and every "needs N devices" mesh
test skips).  So when the axon env is detected and the run was not
explicitly requested on TPU (``LCASR_TEST_TPU=1`` — what
``run_tests.sh`` default mode sets), ``pytest_configure`` RE-EXECS pytest
with the CPU env set before the interpreter starts (after stopping
pytest's fd capture, which would otherwise swallow the re-exec'd run's
output).  ``./run_tests.sh cpu`` does the same thing from the shell.
"""
import os
import sys

_wants_tpu = bool(os.environ.get("LCASR_TEST_TPU"))
_axon_claimed = (
    os.environ.get("JAX_PLATFORMS", "").startswith("axon")
    or bool(os.environ.get("PALLAS_AXON_POOL_IPS"))
)
_needs_reexec = _axon_claimed and not _wants_tpu


def pytest_configure(config):
    if not _needs_reexec:
        return
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # keeps sitecustomize from registering
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()  # restore real fd1/2 for the child
    sys.stderr.write(
        "[conftest] axon env detected without LCASR_TEST_TPU=1 — "
        "re-exec'ing the suite on the CPU backend\n"
    )
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest"] + sys.argv[1:],
        env,
    )


if not _needs_reexec:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if (
        "xla_force_host_platform_device_count" not in xla_flags
        and os.environ.get("JAX_PLATFORMS") == "cpu"
    ):
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_enable_x64", False)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
