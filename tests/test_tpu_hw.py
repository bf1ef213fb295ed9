"""Opt-in tests on the REAL TPU backend (VERDICT round-1 item 9).

The CI suite forces the CPU platform (conftest.py) because the axon
TPU is single-tenant and slow to compile; these tests run the compiled
(non-interpreted) kernels on actual hardware in a subprocess with the
default backend.  Enable with:

    M17_TPU_TESTS=1 python -m pytest tests/test_tpu_hw.py -q

while no other TPU process is running.  The driver's bench and the CLI
exercise the same compiled paths every round; this makes the check
explicit and pass/fail.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("M17_TPU_TESTS") != "1",
    reason="real-TPU tests are opt-in (single-tenant tunnel); "
           "set M17_TPU_TESTS=1")


def test_pallas_viterbi_compiled_on_tpu():
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_PLATFORMS", "XLA_FLAGS"))}
    r = subprocess.run(
        [sys.executable, "tools/tpu_selftest.py"],
        capture_output=True, text=True, cwd="/root/repo",
        env=env, timeout=1200)
    assert r.returncode == 0, r.stdout + r.stderr
    doc = json.loads(r.stdout.strip().splitlines()[-1])
    assert doc["ok"] and doc["bit_mismatches"] == 0
    assert doc["platform"] != "cpu", "expected a real accelerator"
