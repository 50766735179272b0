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


def test_run_flagship_job_script_from_foreign_cwd(tmp_path):
    """The ray-job-submit entrypoint must work standalone from a cwd
    OUTSIDE the repo (workers need the by-value pickle fallback), fresh
    AND resumed."""
    import json
    import subprocess
    import sys

    from raylink.queries import ensure_transcript_fixture

    info = ensure_transcript_fixture("/root/testdata/sf0.001")
    script = "/root/repo/scripts/run_flagship.py"

    def run(out_name):
        res = subprocess.run(
            [sys.executable, script,
             "--transcripts", info["transcripts"],
             "--output", str(tmp_path / out_name),
             "--checkpoint-root", str(tmp_path / "ckpt"),
             "--num-cpus", "4"],
            cwd="/tmp", capture_output=True, text=True, timeout=300,
        )
        assert res.returncode == 0, res.stderr[-2000:]
        return json.loads(res.stdout.strip().splitlines()[-1])

    fresh = run("out1")
    assert fresh["n_assignments"] > 0
    assert not any(fresh["resumed_stages"].values())
    resumed = run("out2")
    assert resumed["n_assignments"] == fresh["n_assignments"]
    assert all(resumed["resumed_stages"].values())
