"""Env-gated wrapper for the scale-probe harness (tools/scale_probe.py)
— the re-runnable form of the round-7 degenerate-corpus findings.

Skipped by default so the suite stays fast: the real probe is 500k docs
/ several minutes. Set SPARK_GRAFT_SCALE_PROBE=1 to run a 50k-doc
version in-process (boilerplate cluster 2.5k members — past the audit
caps, so the hot-shingle and mega-bucket guards actually fire), or
SPARK_GRAFT_SCALE_PROBE=full for the 500k original.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

_MODE = os.environ.get("SPARK_GRAFT_SCALE_PROBE", "")


@pytest.mark.skipif(
    not _MODE, reason="scale probe: set SPARK_GRAFT_SCALE_PROBE=1 (50k) or =full (500k)"
)
def test_scale_probe_completes_within_ceilings():
    n = 500_000 if _MODE == "full" else 50_000
    tool = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "scale_probe.py",
    )
    # subprocess: the probe needs its own Spark session sized by
    # SPARK_GRAFT_CPUS, and a ceiling breach must not poison the
    # suite's shared session
    proc = subprocess.run(
        [sys.executable, tool, "--n-docs", str(n)],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    assert proc.returncode == 0, (
        f"scale probe failed (ceiling breach or error):\n"
        f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )
