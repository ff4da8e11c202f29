"""Test configuration: force CPU backend with 8 virtual devices so multi-chip
sharding (mesh/pjit) is exercised without TPU hardware.

Note: the environment's sitecustomize imports jax at interpreter startup (axon
TPU platform), so env vars alone are too late — use jax.config.update, which
still works because backends initialize lazily at first use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    """Make the default lane's slow-marker exclusion LOUD: a green
    plain ``pytest`` run deselects every ``slow``-marked test (tiering,
    tests/TIMINGS.md) — say so in the summary so it is never mistaken
    for full coverage (ADVICE r4). The full lane is
    ``pytest -m 'slow or not slow'``."""
    n_desel = len(terminalreporter.stats.get("deselected", []))
    if n_desel and "not slow" in (config.option.markexpr or ""):
        terminalreporter.write_line(
            f"NOTE: default lane — {n_desel} slow-marked tests "
            f"deselected; run the FULL lane with: "
            f"python -m pytest tests/ -m 'slow or not slow'")
