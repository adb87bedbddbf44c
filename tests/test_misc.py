"""Launcher, profiling, logging, and misc utility tests."""

import os
import sys
import time

import numpy as np

from psi_tpu.parallel.launcher import JobSpec, run_jobs
from psi_tpu.utils.profiling import StepTimer, annotate
from psi_tpu.utils.tools import log2file, makepath
from psi_tpu.viz.mesh_viewer import MeshViewer, imagearray2file


def test_launcher_success_and_retry(tmp_path):
    marker = tmp_path / "attempts.txt"
    # a job that fails twice then succeeds (tracked via a file)
    script = tmp_path / "flaky.py"
    script.write_text(
        "import sys, os\n"
        f"p = {str(marker)!r}\n"
        "n = int(open(p).read()) if os.path.exists(p) else 0\n"
        "open(p, 'w').write(str(n + 1))\n"
        "sys.exit(0 if n >= 2 else 1)\n"
    )
    jobs = [
        JobSpec("ok", [sys.executable, "-c", "print('hi')"], max_retries=3),
        JobSpec("flaky", [sys.executable, str(script)], max_retries=5),
    ]
    results = run_jobs(jobs, max_parallel=2, log_fn=lambda *_: None)
    by_name = {r.name: r for r in results}
    assert by_name["ok"].returncode == 0
    assert by_name["flaky"].returncode == 0
    assert by_name["flaky"].attempts == 3


def test_step_timer():
    t = StepTimer()
    for _ in range(3):
        with t.step(n_items=4):
            time.sleep(0.01)
    s = t.summary()
    assert s["steps"] == 3
    assert s["mean_step_s"] >= 0.01
    assert s["items_per_sec"] > 0


def test_annotate_noop():
    with annotate("phase"):
        pass


def test_log2file(tmp_path):
    p = str(tmp_path / "log" / "x.log")
    log = log2file(p)
    log("hello")
    assert "hello" in open(p).read()


def test_makepath(tmp_path):
    d = makepath(str(tmp_path / "a" / "b"))
    assert os.path.isdir(d)
    f = makepath(str(tmp_path / "c" / "f.txt"), isfile=True)
    assert os.path.isdir(os.path.dirname(f))


def test_mesh_viewer_renders(tmp_path, rng):
    from psi_tpu.viz.sphere import icosphere

    v, f = icosphere(0.5, 1)
    mv = MeshViewer(width=120, height=100)
    mv.set_meshes([(v + [0, 0, 3.0], f, np.tile([0.2, 0.4, 0.9], (len(v), 1)))])
    img = mv.render()
    assert img.shape == (100, 120, 3)
    assert (img < 250).any()  # something was drawn
    out = mv.save_snapshot(str(tmp_path / "snap.png"))
    assert os.path.exists(out)


def test_imagearray2file(tmp_path, rng):
    arr = (rng.random((1, 2, 1, 16, 16, 3)) * 255).astype(np.uint8)
    out = imagearray2file(arr, str(tmp_path / "grid.png"))
    assert os.path.exists(out[0])
    arr_t = (rng.random((1, 1, 3, 16, 16, 3)) * 255).astype(np.uint8)
    out = imagearray2file(arr_t, str(tmp_path / "anim.gif"), fps=5)
    assert os.path.exists(out[0])
