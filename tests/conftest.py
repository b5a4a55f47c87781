import os

# Tests run on CPU with 8 virtual devices so multi-chip sharding paths are exercised
# without TPU hardware (the driver's dryrun_multichip uses the same mechanism).
# NOTE: the environment presets JAX_PLATFORMS=axon (the TPU tunnel), so this must
# override, not setdefault — otherwise every test compiles over the tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
