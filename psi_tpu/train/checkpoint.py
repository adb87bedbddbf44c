"""Checkpoint save/resume with the reference's conventions.

Files are ``{save_dir}/epoch-{epoch:06d}.ckp`` and resume picks the
mtime-newest (reference: source/train_s1.py:222-233, 303-321;
test_proxe_s1.py:83-88). Payload is a flax-serialized msgpack of
{epoch, params, batch_stats, opt_state} — the same logical content as
the reference's torch.save dict. Hyperparameters stay encoded in the
checkpoint *directory name* (README.md:111-115 convention), produced by
``checkpoint_dir_name``.
"""

from __future__ import annotations

import glob
import os
from typing import Any, Dict, Optional

import flax.serialization
import jax


def checkpoint_dir_name(
    base: str,
    model_type: str,
    batch_size: int,
    epoch: int,
    lr: float,
    loss_vposer: float,
    loss_kl: float,
    loss_contact: float,
    loss_collision: float,
    prefix: str = "checkpoints_proxtrain",
) -> str:
    """Reference naming scheme (frontend_sh_scripts/train_js.sh:30)."""
    return os.path.join(
        base,
        f"{prefix}_model{model_type.upper()}_batch{batch_size}_epoch{epoch}_LR{lr}"
        f"_LossVposer{loss_vposer}_LossKL{loss_kl}_LossContact{loss_contact}"
        f"_LossCollision{loss_collision}",
    )


def save_checkpoint(
    save_dir: str, epoch: int, state: Any, key: Any = None, batches_done: int = 0
) -> str:
    """Write a checkpoint.

    ``batches_done`` > 0 marks a MID-epoch wall-clock save (the
    reference saves every ``saving_per_hours`` inside the epoch,
    source/train_s1.py:303-310): ``epoch`` is then the epoch IN
    PROGRESS and resume continues it from batch ``batches_done``.
    ``key`` is the driver's RNG key *after* consuming the per-batch keys
    for the batches already trained — restoring it makes a resumed run
    consume exactly the key sequence of an uninterrupted one."""
    import numpy as np

    os.makedirs(save_dir, exist_ok=True)
    payload = {"epoch": epoch, "state": flax.serialization.to_state_dict(state)}
    if key is not None:
        payload["key"] = np.asarray(key)
    if batches_done:
        payload["batches_done"] = int(batches_done)
    suffix = f"-b{batches_done:05d}" if batches_done else ""
    path = os.path.join(save_dir, f"epoch-{epoch:06d}{suffix}.ckp")
    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))
    return path


def load_newest_checkpoint(
    save_dir: str, state_template: Any, model_type: str = "s1"
) -> Optional[Dict[str, Any]]:
    """Returns {'epoch': int, 'state': restored_state} or None.

    Picks the mtime-newest epoch-*.ckp like the reference resume logic.
    Falls back to converting a reference torch checkpoint
    (train_s1.py:306-310 format) when the file is not our msgpack —
    reference checkpoints are drop-in resumable (params + epoch; the
    torch Adam moments are not carried over)."""
    paths = sorted(glob.glob(os.path.join(save_dir, "epoch-*.ckp")), key=os.path.getmtime)
    if not paths:
        return None
    with open(paths[-1], "rb") as f:
        raw = f.read()
    try:
        payload = flax.serialization.msgpack_restore(raw)
        state = flax.serialization.from_state_dict(state_template, payload["state"])
        return {
            "epoch": int(payload["epoch"]),
            "state": state,
            "path": paths[-1],
            "batches_done": int(payload.get("batches_done", 0)),
            "key": payload.get("key"),
        }
    except Exception:
        from psi_tpu.utils.convert_torch import load_reference_checkpoint

        converted = load_reference_checkpoint(paths[-1], model_type=model_type)
        state = state_template.replace(
            params=jax.tree.map(lambda x: x, converted["params"]),
            batch_stats=converted.get("batch_stats", {}),
        )
        return {"epoch": converted.get("epoch", 0), "state": state, "path": paths[-1]}
