"""Multi-host (DCN) initialization — the `--multihost` CLI path.

The reference is single-process (SURVEY.md §3.2 callout: no
torch.distributed/NCCL anywhere); the TPU-native scaling story beyond
one host is jax.distributed + a global mesh, with XLA routing
inter-host collectives over DCN and intra-host ones over ICI.

Two launch shapes feed the same code path:

- **Real TPU pod**: each host runs the same CLI with `--multihost`;
  `jax.distributed.initialize()` auto-detects coordinator, process
  count, and process id from the TPU environment. Nothing to
  configure.
- **CPU process simulation** (how this repo TESTS the path without a
  pod — tests/test_multihost.py): the launcher exports
  `JAX_COORDINATOR_ADDRESS`, `JAX_NUM_PROCESSES`, `JAX_PROCESS_ID`
  (and optionally `GMTPU_CPU_DEVICES_PER_PROC` for >1 virtual device
  per process) with `JAX_PLATFORMS=cpu`; initialize() gets them
  explicitly and the CPU cross-process collective backend (gloo,
  compiled into jaxlib) is enabled. This is the JAX analogue of
  torch's gloo-backend CPU test harness.

Verified behaviors this module encodes (measured in-sandbox):

- 2 processes x 2 virtual CPU devices form a single 4-device global
  mesh; a psum over it returns the correct global value on every
  process (gloo logs "Rank k is connected to 3 peer ranks").
- The axon TPU tunnel plugin registers and stays the DEFAULT backend
  even under `JAX_PLATFORMS=cpu`, so `jax.devices()` returns the (one,
  possibly dead) TPU — mesh construction and default placement must
  use the pinned platform's devices explicitly, or process 0 hangs on
  the dead tunnel while the coordination service is up (observed).
"""

from __future__ import annotations

import os


def multihost_devices():
    """Global device list for mesh construction, robust to a foreign
    PJRT plugin capturing the default backend: when JAX_PLATFORMS pins
    a platform, take THAT platform's global view."""
    import jax

    plats = os.environ.get("JAX_PLATFORMS")
    if plats:
        return jax.devices(plats.split(",")[0])
    return jax.devices()


def init_multihost():
    """Initialize jax.distributed for a multi-process run and return
    the global device list to build meshes from.

    Env contract (only needed off-pod): JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID; optional
    GMTPU_CPU_DEVICES_PER_PROC to widen each process's virtual CPU
    device count. On a TPU pod, leave them unset."""
    import jax

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        num = int(os.environ["JAX_NUM_PROCESSES"])
        pid = int(os.environ["JAX_PROCESS_ID"])
        if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
            n_local = int(os.environ.get("GMTPU_CPU_DEVICES_PER_PROC", "0"))
            if n_local:
                jax.config.update("jax_num_cpu_devices", n_local)
            # cross-process CPU collectives (jaxlib ships gloo)
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=addr, num_processes=num, process_id=pid)
    else:
        jax.distributed.initialize()
    if os.environ.get("JAX_PLATFORMS"):
        # keep eager/init work off a hijacked default backend (see
        # module docstring); local_devices of the pinned platform
        plat = os.environ["JAX_PLATFORMS"].split(",")[0]
        jax.config.update("jax_default_device",
                          jax.local_devices(backend=plat)[0])
    return multihost_devices()


def is_multiprocess(mesh) -> bool:
    """True when `mesh` spans more than one jax process — the trainer
    must then feed fully-global arrays into its jitted step."""
    if mesh is None:
        return False
    return len({d.process_index for d in mesh.devices.flat}) > 1
