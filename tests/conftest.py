"""Test configuration: run the suite on CPU with 8 virtual devices and x64.

Tests validate numerics (float64, matching the reference's precision) and
multi-chip sharding (8 simulated devices) without TPU hardware; the benchmark
harness (bench.py) runs the same code on the real chip in float32.

``jax.config.update`` is used in addition to the env vars because a pytest
plugin may import jax before this conftest runs; the config update still wins
as long as no backend has been initialized.
"""
import os

if os.environ.get("ADI_TEST_TPU") == "1":
    # Chip mode: run the TPU-only subset (e.g. test_bf16_drift.py) against
    # the real device.  x64 stays OFF (unsupported on TPU); most of the
    # suite asserts f64 tolerances and is NOT expected to pass in this mode
    # — select the chip-marked files explicitly.
    import jax  # noqa: F401
else:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
