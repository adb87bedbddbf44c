"""VPoser trainer — the pose-prior VAE training loop.

Rebuild of VPoserTrainer (reference: human_body_prior/train/
vposer_smpl.py:174-489): mesh-space L1 reconstruction x1000 through the
body model + analytic KL(q || N(0,1)), plus a pose-space MSE term for
the first 10 epochs (vposer_smpl.py:339-340); Adam with weight decay,
StepLR (gamma 0.5 every num_epochs//3, vposer_smpl.py:356), best-model
snapshots named TR{try:02d}_E{epoch:03d} (vposer_smpl.py:372).

TPU-native: the whole train step (VPoser fwd incl. reparameterization
-> two body-model LBS decodes -> losses -> grads) is one jit program;
data-parallel over a mesh by sharding the batch.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, Optional

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np
import optax

from psi_tpu.body.smplx_model import SMPLXModel, smplx_forward
from psi_tpu.body.vposer import VPoser
from psi_tpu.data.amass import VPoserDS
from psi_tpu.utils.tools import EarlyStopping, log2file, makepath


@dataclasses.dataclass(frozen=True)
class VPoserTrainConfig:
    num_neurons: int = 512
    latentD: int = 32
    num_joints: int = 21
    batch_size: int = 256
    num_epochs: int = 10
    base_lr: float = 1e-3
    reg_coef: float = 1e-4  # Adam weight decay (ini: reg_coef)
    kl_coef: float = 5e-3  # vposer_smpl_defaults.ini convention
    mesh_scaler: float = 1000.0  # vposer_smpl.py:310
    pose_rec_epochs: int = 10  # pose-space MSE active below this epoch
    try_num: int = 0
    seed: int = 0
    expr_code: str = "vposer"


class VPoserTrainer:
    def __init__(
        self,
        work_dir: str,
        cfg: VPoserTrainConfig,
        dataset_dir: str,
        body_model: SMPLXModel,
        logger=None,
        mesh=None,
    ):
        self.cfg = cfg
        self.work_dir = makepath(work_dir)
        self.logger = logger or log2file(os.path.join(work_dir, f"{cfg.expr_code}.log"))
        self.bm = body_model

        self.ds_train = VPoserDS(os.path.join(dataset_dir, "train"))
        self.ds_val = VPoserDS(os.path.join(dataset_dir, "vald"))
        self.ds_test = VPoserDS(os.path.join(dataset_dir, "test"))
        self.logger(f"Train dataset size {len(self.ds_train)}")

        self.model = VPoser(num_neurons=cfg.num_neurons, latentD=cfg.latentD, num_joints=cfg.num_joints)
        key = jax.random.PRNGKey(cfg.seed)
        self.variables = self.model.init(
            key, jnp.zeros((2, cfg.num_joints * 3)), deterministic=True
        )

        # StepLR(gamma=0.5, step=num_epochs//3) as an optax schedule
        steps_per_epoch = max(1, len(self.ds_train) // cfg.batch_size)
        boundaries = {
            int(e * steps_per_epoch): 0.5
            for e in range(max(1, cfg.num_epochs // 3), cfg.num_epochs, max(1, cfg.num_epochs // 3))
        }
        schedule = optax.piecewise_constant_schedule(cfg.base_lr, boundaries)
        self.optimizer = optax.adamw(schedule, weight_decay=cfg.reg_coef)
        self.opt_state = self.optimizer.init(self.variables["params"])

        # Data-parallel over a jax.sharding.Mesh: params/opt state are
        # replicated, each batch's leading axis is sharded over 'dp', and
        # GSPMD inserts the gradient all-reduce — the TPU-native version
        # of the reference's unused nn.DataParallel path
        # (vposer_smpl.py:221-222).
        self.mesh = mesh
        if mesh is not None:
            from psi_tpu.parallel.mesh import replicate

            self.variables = replicate(self.variables, mesh)
            self.opt_state = replicate(self.opt_state, mesh)

        self.best_loss_total = np.inf
        self.best_model_fname: Optional[str] = None
        self.epochs_completed = 0
        self._rng = np.random.default_rng(cfg.seed)
        self._key = jax.random.PRNGKey(cfg.seed + 1)

        self._train_step = self._make_step(train=True)
        self._eval_step = self._make_step(train=False)

    # ------------------------------------------------------------------
    def _decode_mesh(self, pose_aa: jax.Array) -> jax.Array:
        b = pose_aa.shape[0]
        zeros3 = jnp.zeros((b, 3))
        verts, _ = smplx_forward(
            self.bm, transl=zeros3, global_orient=zeros3,
            betas=jnp.zeros((b, self.bm.shapedirs.shape[-1])), body_pose=pose_aa,
        )
        return verts

    def _loss(self, params, batch_stats, pose_aa, key, epoch, train):
        variables = {"params": params, "batch_stats": batch_stats}
        mutable = ["batch_stats"] if train else False
        rngs = None
        if train:
            key, dkey = jax.random.split(key)
            rngs = {"dropout": dkey}
        out = self.model.apply(
            variables, pose_aa, deterministic=not train, rng_key=key, mutable=mutable, rngs=rngs
        )
        drec, new_state = out if train else (out, None)
        mean, std, prec = drec["mean"], drec["std"], drec["pose_aa"]

        mesh_orig = self._decode_mesh(pose_aa) * self.cfg.mesh_scaler
        mesh_rec = self._decode_mesh(prec) * self.cfg.mesh_scaler
        loss_mesh = (1.0 - self.cfg.kl_coef) * jnp.mean(jnp.abs(mesh_orig - mesh_rec))

        # KL(N(mean, std) || N(0, 1)), summed over latent, mean over batch
        kl = -jnp.log(std) + 0.5 * (std**2 + mean**2 - 1.0)
        loss_kl = self.cfg.kl_coef * jnp.mean(jnp.sum(kl, axis=1))

        losses = {"loss_kl": loss_kl, "loss_mesh_rec": loss_mesh}
        # pose-space MSE for early epochs (vposer_smpl.py:339-340)
        pose_gate = (epoch < self.cfg.pose_rec_epochs).astype(pose_aa.dtype) * jnp.float32(train)
        losses["loss_pose_rec"] = pose_gate * (1.0 - self.cfg.kl_coef) * jnp.mean(
            jnp.sum((pose_aa - prec) ** 2, axis=1)
        )
        total = sum(losses.values())
        losses["loss_total"] = total
        return total, (losses, new_state["batch_stats"] if new_state else batch_stats)

    def _make_step(self, train: bool):
        if train:
            def step(params, batch_stats, opt_state, pose_aa, key, epoch):
                (_, (losses, new_bs)), grads = jax.value_and_grad(self._loss, has_aux=True)(
                    params, batch_stats, pose_aa, key, epoch, True
                )
                updates, opt_state = self.optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, new_bs, opt_state, losses
            return jax.jit(step)
        def estep(params, batch_stats, pose_aa, epoch):
            _, (losses, _) = self._loss(params, batch_stats, pose_aa, None, epoch, False)
            return losses
        return jax.jit(estep)

    def _place(self, batch: np.ndarray) -> jax.Array:
        arr = jnp.asarray(batch)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            arr = jax.device_put(arr, NamedSharding(self.mesh, P("dp")))
        return arr

    # ------------------------------------------------------------------
    def train_epoch(self) -> Dict[str, float]:
        cfg = self.cfg
        params = self.variables["params"]
        bs = self.variables.get("batch_stats", {})
        totals: Dict[str, float] = {}
        count = 0
        ep = jnp.int32(self.epochs_completed)
        for batch in self.ds_train.batches(cfg.batch_size, self._rng):
            self._key, k = jax.random.split(self._key)
            params, bs, self.opt_state, losses = self._train_step(
                params, bs, self.opt_state, self._place(batch), k, ep
            )
            for kk, v in losses.items():
                totals[kk] = totals.get(kk, 0.0) + float(v)
            count += 1
        self.variables = {"params": params, "batch_stats": bs}
        return {k: v / max(count, 1) for k, v in totals.items()}

    def evaluate(self, split_name: str = "vald") -> Dict[str, float]:
        ds = self.ds_val if split_name == "vald" else self.ds_test
        params = self.variables["params"]
        bs = self.variables.get("batch_stats", {})
        totals: Dict[str, float] = {}
        count = 0
        ep = jnp.int32(self.epochs_completed)
        for batch in ds.batches(self.cfg.batch_size, self._rng):
            losses = self._eval_step(params, bs, self._place(batch), ep)
            for kk, v in losses.items():
                totals[kk] = totals.get(kk, 0.0) + float(v)
            count += 1
        return {k: v / max(count, 1) for k, v in totals.items()}

    def perform_training(self, num_epochs: Optional[int] = None, patience: Optional[int] = None):
        num_epochs = num_epochs or self.cfg.num_epochs
        stopper = EarlyStopping(patience=patience) if patience else None
        t0 = time.time()
        for _ in range(num_epochs):
            self.epochs_completed += 1
            train_losses = self.train_epoch()
            eval_losses = self.evaluate()
            msg = (
                f"[{self.cfg.expr_code}]_TR{self.cfg.try_num:02d}_E{self.epochs_completed:03d}"
                f" train={train_losses.get('loss_total', 0):.4e} eval={eval_losses.get('loss_total', 0):.4e}"
            )
            if eval_losses.get("loss_total", np.inf) < self.best_loss_total:
                self.best_loss_total = eval_losses["loss_total"]
                self.best_model_fname = makepath(
                    os.path.join(
                        self.work_dir, "snapshots",
                        f"TR{self.cfg.try_num:02d}_E{self.epochs_completed:03d}.pt.msgpack",
                    ),
                    isfile=True,
                )
                with open(self.best_model_fname, "wb") as f:
                    f.write(flax.serialization.msgpack_serialize(
                        flax.serialization.to_state_dict(self.variables)
                    ))
                self.logger(msg + " ** ")
            else:
                self.logger(msg)
            if stopper is not None and stopper(eval_losses.get("loss_total", np.inf)):
                self.logger(f"Early stopping at epoch {self.epochs_completed}")
                break
        self.logger(f"Training done in {time.time() - t0:.1f}s; best {self.best_loss_total:.4e}")
        return self.best_loss_total

    def vis_results(self, poses_aa: "np.ndarray", imgpath: str, n_show: int = 4) -> str:
        """Render orig / reconstructed / sampled pose triplets to a grid PNG
        (equivalent of VPoserTrainer.vis_results, vposer_smpl.py:408-462,
        on the software renderer)."""
        import numpy as _np

        from psi_tpu.viz.mesh_viewer import MeshViewer, imagearray2file

        poses = jnp.asarray(poses_aa[:n_show])
        out = self.model.apply(self.variables, poses, deterministic=True)
        rec = out["pose_aa"]
        key = jax.random.PRNGKey(0)
        z = jax.random.normal(key, (n_show, self.cfg.latentD))
        from psi_tpu.body.vposer import VPoser

        gen = self.model.apply(self.variables, z, method=VPoser.decode_aa)

        mv = MeshViewer(width=256, height=256)
        frames = _np.zeros((3, n_show, 1, 256, 256, 3), _np.uint8)
        for row, pose_set in enumerate([poses, rec, gen]):
            for col in range(n_show):
                verts = self._decode_mesh(pose_set[col : col + 1])[0]
                mv.set_meshes([(
                    _np.asarray(verts) + _np.array([0, 0, 2.5]),
                    self.bm.faces,
                    _np.tile([0.4, 0.5, 0.85], (verts.shape[0], 1)),
                )], densify=0)
                frames[row, col, 0] = mv.render()
        return imagearray2file(frames, imgpath)[0]

    def load_best(self) -> Dict[str, Any]:
        with open(self.best_model_fname, "rb") as f:
            payload = flax.serialization.msgpack_restore(f.read())
        self.variables = flax.serialization.from_state_dict(self.variables, payload)
        return self.variables
