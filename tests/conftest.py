import os

# Tests target CPU with 8 virtual devices so multi-chip sharding paths are exercised
# without TPU hardware (the driver's dryrun_multichip uses the same mechanism).
#
# CAVEAT: this image ships PYTHONPATH=/root/.axon_site with a sitecustomize.py that
# force-registers the axon TPU plugin at interpreter start, overriding JAX_PLATFORMS.
# When that is active the suite still runs (on the real TPU through the tunnel — a
# stronger but slower validation) and device-count-dependent tests skip. For a true
# CPU run: `PYTHONPATH= python -m pytest tests/`.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()


def pytest_configure(config):
    # fail loudly if the axon TPU platform grabbed the backend anyway (it makes
    # "CPU" tests compile over the tunnel and breaks the virtual 8-device mesh)
    import jax

    if jax.default_backend() != "cpu":
        import warnings

        warnings.warn(
            f"tests expected the CPU backend but got {jax.default_backend()!r}; "
            "run pytest with JAX_PLATFORMS=cpu in the environment"
        )
