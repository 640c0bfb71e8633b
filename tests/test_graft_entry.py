"""The driver gates (__graft_entry__.py) must stay green: entry() compiles
single-device and dryrun_multichip provisions its own virtual CPU mesh."""
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parents[1]


def test_graft_entry_main_runs():
    proc = subprocess.run(
        [sys.executable, str(REPO / "__graft_entry__.py")],
        capture_output=True, text=True, timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    assert "dryrun_multichip(8): ok" in proc.stdout
    assert "entry ok:" in proc.stdout
