import os
import sys

# Tests target CPU with 8 virtual devices so multi-chip sharding paths are exercised
# without TPU hardware (the driver's dryrun_multichip uses the same mechanism).
#
# This image ships PYTHONPATH=/root/.axon_site with a sitecustomize.py that
# force-registers the axon TPU plugin at interpreter start, overriding
# JAX_PLATFORMS — which would make "CPU" tests silently compile over the TPU
# tunnel and break the virtual 8-device mesh. When that site is on PYTHONPATH,
# re-exec the test run once with it stripped (before any test imports jax), so
# `python -m pytest tests/` does the right thing from any environment.
# Set ASPH_TEST_ALLOW_TPU=1 to opt into running the suite on the real backend.
_AXON_SITE = "/root/.axon_site"
if (
    _AXON_SITE in os.environ.get("PYTHONPATH", "")
    and not os.environ.get("ASPH_TEST_ALLOW_TPU")
    and not os.environ.get("_ASPH_CONFTEST_REEXEC")
):
    # NOTE: re-run even if sitecustomize already imported jax — the child is a
    # fresh interpreter, so a tainted sys.modules here doesn't matter. This
    # uses fork+exec (subprocess) rather than os.execve: some sandboxed shells
    # silently swallow the output of a process that replaces itself with
    # execve, which made the whole suite look like it "passed" with no output.
    import subprocess

    _env = dict(os.environ)
    _env["PYTHONPATH"] = ":".join(
        p for p in _env.get("PYTHONPATH", "").split(":") if p and p != _AXON_SITE
    )
    _env["_ASPH_CONFTEST_REEXEC"] = "1"
    raise SystemExit(subprocess.call(
        [sys.executable, "-m", "pytest", *sys.argv[1:]], env=_env
    ))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent XLA compilation cache: the suite is compile-bound on one CPU core
# (full-pipeline step variants dominate), so repeat runs drop from ~25 min to
# minutes. Only programs whose compile took >= 2 s are cached. The
# cpu_aot_loader "machine feature" stderr warnings on cache hits are false
# positives (prefer-no-scatter/-gather are XLA pseudo-features the loader does
# not model; same physical machine). Set ASPH_NO_JAX_CACHE=1 to disable.
if not os.environ.get("ASPH_NO_JAX_CACHE"):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/asph_jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")


def pytest_configure(config):
    # fail loudly if a non-CPU platform grabbed the backend anyway (it makes
    # "CPU" tests compile over the tunnel and breaks the virtual 8-device mesh)
    import jax

    if jax.default_backend() != "cpu" and not os.environ.get("ASPH_TEST_ALLOW_TPU"):
        raise RuntimeError(
            f"tests expected the CPU backend but got {jax.default_backend()!r}; "
            "run pytest with PYTHONPATH= JAX_PLATFORMS=cpu, or set "
            "ASPH_TEST_ALLOW_TPU=1 to run the suite on the real backend"
        )
