import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np, jax, jax.numpy as jnp
from psi_tpu.data.synthetic import make_synthetic_assets
from psi_tpu.models import HumanCVAES1
from psi_tpu.serve import GenerationEngine
from psi_tpu.utils.config import FitConfig

# production serving stack: bf16 packed grids + FitConfig.production()
assets, _ = make_synthetic_assets(sdf_dtype=jnp.bfloat16)
mdl = HumanCVAES1(latentD=256)
variables = mdl.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)), jnp.zeros((1, 128, 128, 2)))
eng = GenerationEngine(mdl, variables, assets, population=256,
                       fit_cfg=FitConfig.production(num_iter=20))
print("warmup_s:", round(eng.warmup(), 1))
rng = np.random.RandomState(0)
def batch(i):
    return {"xs": rng.randn(1,128,128,2).astype(np.float32),
            "cam_int": np.eye(3, dtype=np.float32)[None]*500,
            "cam_ext": np.eye(4, dtype=np.float32)[None],
            "max_d": np.asarray([6.0], np.float32)}
for fit in (False, True):
    reps = 30 if not fit else 8
    t0 = time.time()
    for i in range(reps):
        eng.generate(batch(i), fit=fit)
    dt = (time.time() - t0) / reps
    print(f"engine.generate(fit={fit}): {dt*1e3:.0f} ms end-to-end  [total {dt*reps:.1f}s]")
