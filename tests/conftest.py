"""Test configuration: run everything on a virtual 8-device CPU platform.

Multi-chip hardware is not available in CI; sharding tests use
`--xla_force_host_platform_device_count=8` on the CPU backend, which exercises the
same Mesh/shard_map/collective code paths the TPU pod would run. Must be set before
jax initializes a backend, hence module scope here.
"""

import os

if os.environ.get("YASPH_TEST_TPU") == "1":
    # opt-out for the TPU-only tests (e.g. the full-solver Pallas equivalence in
    # test_pallas_slotmajor.py): run on the real device instead of the CPU mesh.
    # The remote Mosaic compile service makes first compiles minutes-slow;
    # the persistent cache makes every re-run of the gated set cost seconds
    # (same cache dir as bench.py — a bench run pre-warms the solver step).
    from yasph2d_tpu.utils import compile_cache

    compile_cache.enable()
else:
    os.environ["JAX_PLATFORMS"] = "cpu"  # force: the CI env may preset the tpu platform
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    # The env var alone is NOT enough: the axon PJRT plugin (sitecustomize) registers
    # the TPU backend and takes priority over JAX_PLATFORMS from the environment. The
    # config update below is authoritative as long as it happens before the first
    # backend use.
    import jax

    jax.config.update("jax_platforms", "cpu")
