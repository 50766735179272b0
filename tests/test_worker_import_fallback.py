"""The driver-contract worker-import fallback must keep working.

tests/conftest.py now exports the repo on PYTHONPATH for the shared Ray
session, which makes every in-suite worker able to ``import raylink`` from
any cwd — and therefore can no longer catch a regression of the documented
invariant (CLAUDE.md): worker-executed closures must not contain runtime
``from raylink...`` imports, because the real harness runs from a foreign
cwd with NO repo on the workers' sys.path and relies on
``__ray_entry__._ensure_workers_can_import``'s cloudpickle by-value
registration. This test replays that exact environment in a subprocess:
cwd=/tmp, PYTHONPATH stripped, driver-only sys.path insert, fresh Ray
session — then drives entry() end to end.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})          # the harness does exactly this
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")
import ray.data
import __ray_entry__ as mod
out = mod.entry()
n = out.count() if isinstance(out, ray.data.Dataset) else len(out)
assert n > 0, n
print("FALLBACK_OK", n)
ray.shutdown()
"""


def test_entry_runs_without_pythonpath_from_foreign_cwd():
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "RAY_ADDRESS")
    }
    # a second local Ray cluster in the subprocess needs its own session;
    # everything else inherits (HOME for the pyenv interpreter, TMPDIR)
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=REPO)],
        cwd="/tmp",
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "FALLBACK_OK" in proc.stdout, proc.stdout[-2000:]
