"""The smoke tier (pytest.ini) and the sharded runner's SMOKE_FILES
must name the same modules — otherwise `pytest -m smoke` and
`run_tests_sharded.py --smoke` silently diverge.
"""

from __future__ import annotations

import glob
import importlib.util
import os

TESTS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TESTS)


def _runner_smoke_files() -> set[str]:
    path = os.path.join(REPO, "scripts", "run_tests_sharded.py")
    spec = importlib.util.spec_from_file_location("rm_sharded", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return set(mod.SMOKE_FILES)


def _marked_smoke_files() -> set[str]:
    out = set()
    for f in glob.glob(os.path.join(TESTS, "test_*.py")):
        for line in open(f):
            if line.rstrip() == "pytestmark = pytest.mark.smoke":
                out.add(os.path.basename(f))
                break
    return out


def test_smoke_tier_in_sync():
    assert _runner_smoke_files() == _marked_smoke_files()
