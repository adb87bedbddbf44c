"""Generation: sample body populations for a scene snapshot.

Rebuild of TestOP (reference: source/test_proxe_s1.py:31-134,
test_proxe_s2.py, test_habitat_s{1,2}.py): tile the scene feature
n_samples times, sample the CVAE prior, convert 6D->aa, recover the
metric global translation, and emit reference-compatible
``body_gen_{i:06d}.pkl`` pickles.

TPU-native: the tile + sample + convert chain is one jit program over
the whole population (300 bodies/scene PROX-E, 200/cam MP3D-R); the
scene encoder runs once and broadcasts, instead of re-encoding the
repeated image 300x. (The reference repeats the image and re-runs the
trunk per sample, test_proxe_s1.py:104.)
"""

from __future__ import annotations

import functools
import os
import pickle
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from psi_tpu.geometry.bodyvec import body_params_encapsulate_list, convert_to_3D_rot
from psi_tpu.geometry.camera import recover_global_T
from psi_tpu.models import HumanCVAES1, HumanCVAES2


@functools.partial(jax.jit, static_argnums=(0, 5))
def _generate(model, variables, xs, cam_int, max_d, n_samples, key):
    """xs: [1, H, W, 2]; returns [n_samples, 72] metric body vectors.

    The scene trunk runs ONCE (sample_n encodes the single snapshot and
    broadcasts the feature) — the reference repeats the image and
    re-runs the trunk per sample (test_proxe_s1.py:104)."""
    if isinstance(model, HumanCVAES1):
        xhnr = model.apply(variables, xs, n_samples, key, method=HumanCVAES1.sample_n)
    else:
        xhnr = model.apply(variables, xs, n_samples, key, method=HumanCVAES2.sample_n)
    xhn = convert_to_3D_rot(xhnr)
    cam_int_n = jnp.broadcast_to(cam_int, (n_samples, 3, 3))
    max_d_n = jnp.broadcast_to(max_d.reshape(1), (n_samples,))
    return recover_global_T(xhn, cam_int_n, max_d_n)


def generate_bodies(
    model,
    variables,
    xs: jax.Array,
    cam_int: jax.Array,
    max_d: jax.Array,
    n_samples: int,
    key: jax.Array,
) -> jax.Array:
    """Sample n_samples bodies for one scene snapshot -> [N, 72]."""
    return _generate(model, variables, xs, cam_int, max_d, n_samples, key)


@functools.partial(jax.jit, static_argnums=(0,))
def _generate_rows(model, variables, xs_stack, cam_int_stack, max_d_stack, req_idx, key):
    """Coalesced multi-request sampling: xs_stack [R, H, W, 2] holds the
    R distinct snapshots of a serving micro-batch, req_idx [P] maps each
    of the P population rows to its request. The gather happens on
    device so the compiled shape is fixed at (R, P) regardless of how
    many requests were coalesced. Returns [P, 72]."""
    cam_int_rows = jnp.take(cam_int_stack, req_idx, axis=0)
    max_d_rows = jnp.take(max_d_stack.reshape(-1), req_idx, axis=0)
    # trunk cost is R snapshot encodes (not P row encodes): encode the
    # stack once, gather features per row
    if isinstance(model, HumanCVAES1):
        z_s = model.apply(variables, xs_stack, method=HumanCVAES1.encode_scene)
        xhnr = model.apply(
            variables, jnp.take(z_s, req_idx, axis=0), key, method=HumanCVAES1.sample_with_feat
        )
    else:
        z_g, z_l = model.apply(variables, xs_stack, method=HumanCVAES2.encode_scenes)
        xhnr = model.apply(
            variables, jnp.take(z_g, req_idx, axis=0), jnp.take(z_l, req_idx, axis=0),
            key, method=HumanCVAES2.sample_with_feats,
        )
    xhn = convert_to_3D_rot(xhnr)
    return recover_global_T(xhn, cam_int_rows, max_d_rows)


def generate_bodies_rows(
    model,
    variables,
    xs_stack: jax.Array,
    cam_int_stack: jax.Array,
    max_d_stack: jax.Array,
    req_idx: jax.Array,
    key: jax.Array,
) -> jax.Array:
    """Sample one body per population row, row r conditioned on snapshot
    xs_stack[req_idx[r]] — the serving engine's coalesced path."""
    return _generate_rows(model, variables, xs_stack, cam_int_stack, max_d_stack, req_idx, key)


def generate_bodies_line(
    model,
    variables,
    xs: jax.Array,
    cam_int: jax.Array,
    max_d: jax.Array,
    n_samples: int,
    z_range: float = 3.0,
):
    """Latent line sweep for interpolation studies: eps_i = const vector
    sweeping [-z_range, z_range) (HumanCVAES1.sample_line semantics,
    reference cvae.py:516-534). Returns (x72 [N, 72], eps [N, eps_d])."""
    eps_vals = jnp.arange(-z_range, z_range, 2.0 * z_range / n_samples)[:n_samples]
    eps = jnp.broadcast_to(eps_vals[:, None], (n_samples, model.eps_d)).astype(jnp.float32)
    xs_n = jnp.broadcast_to(xs, (n_samples,) + xs.shape[1:])
    xhnr = model.apply(variables, xs_n, eps, method=HumanCVAES1.sample_with_eps)
    xhn = convert_to_3D_rot(xhnr)
    cam_int_n = jnp.broadcast_to(cam_int, (n_samples, 3, 3))
    max_d_n = jnp.broadcast_to(max_d.reshape(1), (n_samples,))
    return recover_global_T(xhn, cam_int_n, max_d_n), eps


class TestOP:
    """Checkpoint-loading generation driver (test_proxe_s1.py parity)."""

    def __init__(self, model, variables, n_samples: int = 300, seed: int = 0):
        self.model = model
        self.variables = variables
        self.n_samples = n_samples
        self._key = jax.random.PRNGKey(seed)

    @classmethod
    def from_checkpoint(cls, model, ckpt_dir: str, template_state, n_samples: int = 300, seed: int = 0):
        from psi_tpu.train.checkpoint import load_newest_checkpoint

        restored = load_newest_checkpoint(ckpt_dir, template_state)
        if restored is None:
            raise FileNotFoundError(f"no epoch-*.ckp under {ckpt_dir}")
        state = restored["state"]
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        return cls(model, variables, n_samples=n_samples, seed=seed)

    def test(self, batch: Dict[str, np.ndarray], output_dir: str, scene_name: str, idx_offset: int = 900) -> int:
        """batch: one test snapshot (xs [1,H,W,2], cam_int [1,3,3],
        cam_ext [1,4,4], max_d [1]). Writes n_samples pickles; returns count.
        idx_offset matches the reference's +900 numbering
        (test_proxe_s1.py:131)."""
        self._key, k = jax.random.split(self._key)
        xh = self.generate(batch, k)
        outdir = os.path.join(output_dir, scene_name)
        os.makedirs(outdir, exist_ok=True)
        recs = body_params_encapsulate_list(np.asarray(xh))
        for ii, rec in enumerate(recs):
            rec["cam_ext"] = np.asarray(batch["cam_ext"])
            rec["cam_int"] = np.asarray(batch["cam_int"])
            with open(os.path.join(outdir, f"body_gen_{ii + idx_offset:06d}.pkl"), "wb") as f:
                pickle.dump(rec, f)
        return len(recs)

    def generate(self, batch: Dict[str, np.ndarray], key: Optional[jax.Array] = None) -> jax.Array:
        if key is None:
            self._key, key = jax.random.split(self._key)
        return generate_bodies(
            self.model,
            self.variables,
            jnp.asarray(batch["xs"]),
            jnp.asarray(batch["cam_int"]).reshape(1, 3, 3),
            jnp.asarray(batch["max_d"]).reshape(1),
            self.n_samples,
            key,
        )
