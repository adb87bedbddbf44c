"""Reference torch checkpoint -> drop-in resume through the normal
load_newest_checkpoint path (train_s1.py:306-310 .ckp format)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

torch = pytest.importorskip("torch")

from psi_tpu.train.checkpoint import load_newest_checkpoint, save_checkpoint
from psi_tpu.train.loop import build_model, init_state
from psi_tpu.utils.config import TrainConfig
from tests.test_convert_full_model import _TorchCVAES1
from tests.test_convert import _randomize_bn_stats


def test_torch_ckp_fallback(tmp_path, rng):
    tm = _TorchCVAES1(latentD=64).eval()
    _randomize_bn_stats(tm)
    torch.save(
        {"epoch": 12, "model_h_state_dict": tm.state_dict(),
         "optimizer_h_state_dict": {}},
        str(tmp_path / "epoch-000012.ckp"),
    )

    cfg = TrainConfig(model_type="s1", latentD=64)
    model = build_model(cfg)
    state = init_state(model, cfg, optax.adam(1e-3), jax.random.PRNGKey(0))
    restored = load_newest_checkpoint(str(tmp_path), state, model_type="s1")
    assert restored["epoch"] == 12

    # restored params produce the torch model's deterministic output
    x_body = (rng.normal(size=(2, 75)) * 0.3).astype(np.float32)
    x_s = rng.normal(size=(2, 2, 128, 128)).astype(np.float32)
    with torch.no_grad():
        mu_t, _, _ = tm.encode_stats(torch.tensor(x_body), torch.tensor(x_s))
    variables = {"params": restored["state"].params, "batch_stats": restored["state"].batch_stats}
    _, mu_j, _ = model.apply(variables, jnp.asarray(x_body), jnp.asarray(np.transpose(x_s, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=1e-3)


def test_msgpack_still_preferred(tmp_path):
    cfg = TrainConfig(model_type="s1", latentD=32)
    model = build_model(cfg)
    state = init_state(model, cfg, optax.adam(1e-3), jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path), 3, state)
    restored = load_newest_checkpoint(str(tmp_path), state)
    assert restored["epoch"] == 3
