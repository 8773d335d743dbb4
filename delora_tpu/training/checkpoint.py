"""Orbax checkpointing with the reference's retention + embedded-config contract.

The reference saves {epoch, model_state_dict, optimizer_state_dict, loss,
parameters=config} every epoch (overwriting "latest") and keeps a durable copy
every 5 epochs (reference src/deploy/trainer.py:153-173); on resume it
restores model + optimizer and the run config embedded in the checkpoint
(trainer.py:27-36, bin/run_training.py:47-55). We keep the same contract:
Orbax checkpoints embed the resolved config dict, "latest" is overwritten
every epoch, and every ``keep_every``-th epoch is retained permanently.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _config_to_json(config: Dict[str, Any]) -> str:
    def default(o):
        if isinstance(o, (np.integer,)):
            return int(o)
        if isinstance(o, (np.floating,)):
            return float(o)
        if isinstance(o, np.ndarray):
            return o.tolist()
        return str(o)

    return json.dumps(config, default=default)


class CheckpointManager:
    def __init__(self, directory: str, keep_every: int = 5):
        self.directory = os.path.abspath(directory)
        self.keep_every = keep_every
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    @staticmethod
    def _barrier(name: str):
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(name)

    def save(self, state, epoch: int, loss: float, config: Dict[str, Any]):
        """Save 'latest' (overwrite) + durable copy on keep_every epochs.

        Multi-process contract (canonical Orbax multihost flow): EVERY
        process calls save with the global (replicated) arrays — the
        checkpointer runs its own cross-process syncs internally and writes
        each replicated array once — while direct filesystem mutations
        (rmtree, meta JSON, durable copy) happen on process 0 only, fenced
        by barriers so no process races into a half-written directory.
        """
        is_primary = jax.process_index() == 0
        payload = {"params": state.params, "opt_state": state.opt_state,
                   "step": state.step}
        latest = self._path("latest")
        if is_primary and os.path.exists(latest):
            shutil.rmtree(latest)
        self._barrier(f"ckpt_pre_save_{epoch}")
        self._ckptr.save(latest, payload)
        self._ckptr.wait_until_finished()
        self._barrier(f"ckpt_post_save_{epoch}")
        if is_primary:
            meta = {
                "epoch": epoch,
                "loss": float(loss),
                "parameters": json.loads(_config_to_json(config)),
            }
            with open(self._path("latest_meta.json"), "w") as f:
                json.dump(meta, f)
            if self.keep_every and epoch % self.keep_every == 0:
                durable = self._path(f"epoch_{epoch:05d}")
                if os.path.exists(durable):
                    shutil.rmtree(durable)
                shutil.copytree(latest, durable)
                shutil.copyfile(self._path("latest_meta.json"),
                                self._path(f"epoch_{epoch:05d}_meta.json"))
        self._barrier(f"ckpt_done_{epoch}")

    def save_named(self, state, name: str, epoch: int, loss: float,
                   config: Dict[str, Any], extra_meta: Dict[str, Any] = None):
        """Overwrite a single named checkpoint (e.g. ``best``) + its meta.

        Same multi-process contract as :meth:`save` (all processes call in,
        process 0 mutates the filesystem, barriers fence the phases), but no
        durable per-epoch copies — the caller owns the retention policy.
        """
        is_primary = jax.process_index() == 0
        payload = {"params": state.params, "opt_state": state.opt_state,
                   "step": state.step}
        target = self._path(name)
        if is_primary and os.path.exists(target):
            shutil.rmtree(target)
        self._barrier(f"ckpt_pre_save_{name}_{epoch}")
        self._ckptr.save(target, payload)
        self._ckptr.wait_until_finished()
        self._barrier(f"ckpt_post_save_{name}_{epoch}")
        if is_primary:
            meta = {
                "epoch": epoch,
                "loss": float(loss),
                "parameters": json.loads(_config_to_json(config)),
            }
            meta.update(extra_meta or {})
            with open(self._path(f"{name}_meta.json"), "w") as f:
                json.dump(meta, f)
        self._barrier(f"ckpt_done_{name}_{epoch}")

    def restore(self, state, name: str = "latest") -> Tuple[Any, Dict[str, Any]]:
        """Restore into an abstract/concrete state of matching structure.

        Returns (state, meta) where meta holds {epoch, loss, parameters}.
        """
        payload = {"params": state.params, "opt_state": state.opt_state,
                   "step": np.asarray(state.step)}
        restored = self._ckptr.restore(self._path(name), payload)
        meta_path = self._path(f"{name}_meta.json")
        meta = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        new_state = state.replace(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=int(restored["step"]),
        )
        return new_state, meta

    @staticmethod
    def embedded_config(path: str) -> Optional[Dict[str, Any]]:
        """Read the config embedded next to a checkpoint directory."""
        meta_path = path.rstrip("/") + "_meta.json"
        if not os.path.exists(meta_path):
            meta_path = os.path.join(os.path.dirname(path.rstrip("/")),
                                     "latest_meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                return json.load(f).get("parameters")
        return None
