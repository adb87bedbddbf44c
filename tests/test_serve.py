"""Serving engine tests: warm compile, request batching, CLI loop."""

import io
import json

import numpy as np
import jax
import jax.numpy as jnp

from psi_tpu.data.synthetic import make_synthetic_assets
from psi_tpu.models import HumanCVAES1
from psi_tpu.serve import GenerationEngine
from psi_tpu.utils.config import FitConfig


def test_engine_generate_and_fit():
    assets, _ = make_synthetic_assets(
        num_verts=100, num_joints=12, num_scenes=2, sdf_dim=16, scene_points=200, n_contact=32
    )
    mdl = HumanCVAES1(latentD=32)
    variables = mdl.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)), jnp.zeros((1, 128, 128, 2)))
    eng = GenerationEngine(mdl, variables, assets, population=8, fit_cfg=FitConfig(num_iter=2))
    warm = eng.warmup()
    assert warm > 0

    batch = {
        "xs": np.zeros((1, 128, 128, 2), np.float32),
        "cam_int": np.eye(3, dtype=np.float32)[None] * 500,
        "cam_ext": np.eye(4, dtype=np.float32)[None],
        "max_d": np.asarray([6.0], np.float32),
    }
    r1 = eng.generate(batch, n_samples=5, fit=False)
    assert r1.bodies.shape == (5, 72)
    r2 = eng.generate(batch, n_samples=8, fit=True, scene_idx=1)
    assert r2.bodies.shape == (8, 72)
    assert r2.fitted
    assert np.all(np.isfinite(r2.bodies))


def test_serve_cli_loop(tmp_path):
    from psi_tpu.cli import serve as cli_serve

    stdin = io.StringIO(json.dumps({"id": "a", "n_samples": 3}) + "\nquit\n")
    stdout = io.StringIO()
    cli_serve.main(
        ["--latentD", "32", "--population", "4", "--synthetic", "--out_dir", str(tmp_path)],
        stdin=stdin, stdout=stdout,
    )
    lines = [json.loads(l) for l in stdout.getvalue().strip().splitlines()]
    assert lines[0]["status"] == "ready"
    assert lines[1]["id"] == "a" and lines[1]["n"] == 3
    out = np.load(lines[1]["out"])
    assert out.shape == (3, 72)
