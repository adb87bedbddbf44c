import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp, time
from psi_tpu.data.synthetic import make_synthetic_assets
from psi_tpu.models import HumanCVAES1
from psi_tpu.serve import GenerationEngine, ServingQueue
from psi_tpu.utils.config import FitConfig

print("backend:", jax.default_backend())
assets, _ = make_synthetic_assets()
mdl = HumanCVAES1(latentD=256)
variables = mdl.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)), jnp.zeros((1, 128, 128, 2)))
eng = GenerationEngine(mdl, variables, assets, population=256, fit_cfg=FitConfig(num_iter=20))
print("warmup_s:", round(eng.warmup(), 1))
q = ServingQueue(eng, linger_s=0.05)
futs = [q.submit({
    "xs": np.random.RandomState(i).randn(1,128,128,2).astype(np.float32),
    "cam_int": np.eye(3, dtype=np.float32)[None]*500,
    "cam_ext": np.eye(4, dtype=np.float32)[None],
    "max_d": np.asarray([6.0], np.float32)}, n_samples=32, fit=True, scene_idx=i % 4)
    for i in range(8)]
res = [f.result(timeout=300) for f in futs]
q.stop()
print("stats:", q.stats())
print("batch_sizes:", [r.batch_size for r in res])
assert all(r.bodies.shape == (32, 72) and np.isfinite(r.bodies).all() for r in res)
print("serve coalescing OK on", jax.default_backend())
