"""Test configuration: force an 8-device virtual CPU platform so that
multi-chip sharding paths are exercised without TPU hardware, and so parity
tests run at full f32 matmul precision.

Note: the environment pre-imports jax (axon site hook), so setting env vars
is not enough — jax.config must be updated before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # XLA:CPU's in-process collective rendezvous hard-kills the process when
    # a participant is >40s late; on a 1-core box running 8 device threads a
    # straggler can legitimately exceed that, so raise it (de-flakes the
    # multi-device collective tests — same knob the dryrun child sets).
    flags += " --xla_cpu_collective_call_terminate_timeout_seconds=900"
if "xla_cpu_enable_concurrency_optimized_scheduler" not in flags:
    # XLA:CPU's concurrency-optimized thunk scheduler lets each virtual
    # device enter dataflow-independent collectives in a DIFFERENT order, so
    # two collectives with intersecting participant groups (a TP pair
    # all-gather vs a whole-mesh resharding permute) deadlock the in-process
    # rendezvous — each device thread blocks inside the first collective it
    # picked. The sequential scheduler executes thunks in one deterministic
    # program order on every device, which makes deadlock impossible. Real
    # TPUs sequence collectives on ICI streams and never hit this; it is
    # purely a virtual-device test-backend hazard.
    flags += " --xla_cpu_enable_concurrency_optimized_scheduler=false"
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
