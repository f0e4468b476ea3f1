"""Checkpointing: params + optimizer state + step, with best-metric retention.

The reference only saves model weights on improvement and never restores
optimizer state (trail_01.py:193-198, SURVEY §5.4); this module checkpoints
the full TrainState so training is resumable, via orbax.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except ImportError:  # pragma: no cover
    _HAVE_ORBAX = False

from mdcnet_tpu.train.state import TrainState


def jnp_device_put(x):
    return jax.device_put(x) if isinstance(x, np.ndarray) else x


class CheckpointManager:
    """Save/restore TrainState; keeps ``max_to_keep`` best + latest."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        if _HAVE_ORBAX:
            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))
        else:
            self._mgr = None
        self.max_to_keep = max_to_keep

    def save(self, state: TrainState, step: Optional[int] = None) -> None:
        step = int(state.step) if step is None else step
        if self._mgr is not None:
            self._mgr.save(step, args=ocp.args.StandardSave(
                jax.tree_util.tree_map(np.asarray, state)))
            self._mgr.wait_until_finished()
        else:  # minimal .npz fallback
            flat, treedef = jax.tree_util.tree_flatten(state)
            np.savez(os.path.join(self.directory, f"ckpt_{step}.npz"),
                     *[np.asarray(x) for x in flat])

    def save_params(self, params: Any, step: int) -> None:
        """Save ONLY the params tree (as ``{"params": ...}``).

        A full TrainState save round-trips params + both Adam moments
        (~3x params, ~1.5 GB for the flagship) through the device tunnel;
        intermediate saves during long runs only need to feed
        ``restore_params`` (bench.py / --resume-params), so saving the
        params alone cuts the tunnel traffic 3x.  NOT resumable via
        ``restore`` (no optimizer state) — callers do a full ``save`` at
        the end of the run.
        """
        if self._mgr is not None:
            self._mgr.save(step, args=ocp.args.StandardSave(
                {"params": jax.tree_util.tree_map(np.asarray, params)}))
            self._mgr.wait_until_finished()
        else:  # pragma: no cover - minimal fallback
            # distinct name: restore() expects ckpt_*.npz to hold a FULL
            # flattened TrainState; a params-only file under that name would
            # fail its unflatten with a leaf-count mismatch (ADVICE r04)
            flat, _ = jax.tree_util.tree_flatten(params)
            np.savez(os.path.join(self.directory, f"params_{step}.npz"),
                     *[np.asarray(x) for x in flat])

    def latest_step(self) -> Optional[int]:
        if self._mgr is not None:
            return self._mgr.latest_step()
        steps = [int(f[5:-4]) for f in os.listdir(self.directory)
                 if f.startswith("ckpt_") and f.endswith(".npz")]
        return max(steps) if steps else None

    def restore_params(self, model=None, cfg=None,
                       step: Optional[int] = None):
        """Restore ONLY the params tree, without ever touching a device.

        An argless orbax restore returns the saved tree as plain
        numpy/dict/list — no template, so it keeps working when the
        *current* optimizer tree differs from the one the checkpoint was
        saved with (e.g. ``grad_clip_norm`` adds a chain layer).  This
        matters over the axon tunnel too: a full-TrainState device restore
        round-trips ~1.5 GB and takes minutes; host restore is seconds.
        Callers ``jax.device_put`` the result once.  ``model``/``cfg`` are
        accepted for signature compatibility and unused.
        """
        step = step if step is not None else self.latest_step()
        assert step is not None, "no checkpoint found"
        if self._mgr is not None:
            import logging
            absl = logging.getLogger("absl")
            level = absl.level
            absl.setLevel(logging.ERROR)  # orbax warns on template-free
            try:                          # restore; intentional here
                return self._mgr.restore(step)["params"]
            finally:
                absl.setLevel(level)
        raise NotImplementedError("params-only restore requires orbax")

    def _is_params_only(self, step: int) -> Optional[bool]:
        """True/False when the saved tree's top level is knowable from
        metadata ({"params"} = intermediate params-only save), None when the
        orbax metadata API is unavailable."""
        try:
            meta = self._mgr.item_metadata(step)
            tree = getattr(meta, "tree", meta)
            if hasattr(tree, "keys"):
                return set(tree.keys()) == {"params"}
        except Exception:
            pass
        return None

    def restore(self, template: TrainState,
                step: Optional[int] = None) -> TrainState:
        """Restore a full TrainState.  Intermediate saves are params-only
        (``save_params``); resuming from one cannot bring back optimizer
        moments, so it falls back to the template's FRESH optimizer state +
        restored params with a loud warning instead of crashing on the
        structure mismatch (ADVICE r04)."""
        step = step if step is not None else self.latest_step()
        assert step is not None, "no checkpoint found"
        if self._mgr is not None:
            def params_fallback():
                import sys
                print(f"WARNING: checkpoint step {step} is a params-only "
                      "intermediate save — optimizer state/LR schedule "
                      "restart fresh (full resume needs a full-state save)",
                      file=sys.stderr, flush=True)
                params = self.restore_params(step=step)
                return template.replace(
                    params=jax.tree_util.tree_map(jnp_device_put, params),
                    step=step)

            if self._is_params_only(step):
                return params_fallback()
            # host-side zeros template: np.asarray(template) would round-trip
            # the full state through the device (minutes over a remote
            # tunnel); only shapes/dtypes matter to orbax
            target = jax.tree_util.tree_map(
                lambda x: np.zeros(np.shape(x), x.dtype), template)
            try:
                restored = self._mgr.restore(
                    step, args=ocp.args.StandardRestore(target))
            except Exception:
                if self._is_params_only(step) is False:
                    raise
                return params_fallback()
        else:
            flat, treedef = jax.tree_util.tree_flatten(template)
            data = np.load(os.path.join(self.directory, f"ckpt_{step}.npz"))
            restored = jax.tree_util.tree_unflatten(
                treedef, [data[k] for k in data.files])
        # materialize on device: numpy leaves passed to jitted functions get
        # re-uploaded on EVERY call (catastrophic over a remote tunnel)
        return jax.tree_util.tree_map(jnp_device_put, restored)
