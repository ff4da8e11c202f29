"""Opt-in on-hardware kernel validation (``pytest -m tpu``).

The rest of the suite runs fused-kernel equalities in interpret mode on the
8-virtual-device CPU backend (tests/conftest.py forces ``jax_platforms=cpu``
in-process). Interpret mode and Mosaic compilation are different code paths,
so this test shells out to ``tools/validate_tpu.py`` in a CLEAN process that
keeps the real TPU platform, compiling every fused kernel and comparing
fwd+grad against the composed XLA path on the chip.

Skipped unless MOP_TPU_RUN_TPU_TESTS=1 (it needs the real chip and a few
minutes of compiles); run explicitly with:

    MOP_TPU_RUN_TPU_TESTS=1 python -m pytest tests -m tpu -q
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.tpu
@pytest.mark.skipif(
    os.environ.get("MOP_TPU_RUN_TPU_TESTS", "") not in ("1", "true", "yes"),
    reason="set MOP_TPU_RUN_TPU_TESTS=1 to run the on-chip validation gate",
)
def test_compiled_kernels_match_composed_on_tpu():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "validate_tpu.py"), "--quick"],
        env=env, capture_output=True, text=True, timeout=3000,
    )
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr)
    if proc.returncode == 2:
        pytest.skip("no real TPU visible in the clean subprocess")
    assert proc.returncode == 0, "on-chip kernel validation FAILED (see table)"
