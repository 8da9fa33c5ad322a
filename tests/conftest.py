import os

# Tests run on a virtual 8-device CPU mesh regardless of whether real
# TPU hardware is attached; the multi-chip sharding path is validated on
# this mesh (and separately by __graft_entry__.dryrun_multichip).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The TPU plugin in this environment overrides JAX_PLATFORMS during
# registration, so pin the platform through the config API as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
