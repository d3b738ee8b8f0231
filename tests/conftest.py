"""Test configuration: run the suite on CPU with an 8-device virtual mesh.

Multi-chip TPU hardware is not available in CI; sharding tests validate the
pjit/shard_map paths on a virtual CPU mesh instead (the driver separately
dry-runs the multi-chip path via __graft_entry__.dryrun_multichip).

Note: this environment's sitecustomize registers a remote-TPU PJRT plugin
and force-sets jax_platforms="axon,cpu" (overriding the JAX_PLATFORMS env
var), so we must override via jax.config *after* import, and set XLA_FLAGS
before the CPU backend initialises.
"""

import os
import sys

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
