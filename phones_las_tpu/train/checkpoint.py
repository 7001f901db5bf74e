"""Orbax-based checkpoint/resume.

Reference parity (SURVEY.md §6 checkpoint row): periodic saves, keep-N,
silent resume from the latest checkpoint in the workdir, and explicit
warm-start from another run's checkpoint for cross-language transfer
(``--init_checkpoint``). Saves the full TrainState (params, optimizer
state, step, RNG) plus the data epoch for loader repositioning.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, workdir: str, keep: int = 5, save_every: int = 1000):
        path = os.path.join(os.path.abspath(workdir), "checkpoints")
        os.makedirs(path, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            path,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, save_interval_steps=save_every
            ),
        )

    def save(self, step: int, state: Any, epoch: int = 0, force: bool = False) -> bool:
        return self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                meta=ocp.args.JsonSave({"epoch": epoch}),
            ),
            force=force,
        )

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, abstract_state: Any, step: Optional[int] = None) -> Tuple[Any, int]:
        """→ (state, epoch). ``abstract_state`` is a pytree of
        ShapeDtypeStructs (e.g. ``jax.eval_shape(create_fn)``) or a live
        state with the right structure."""
        step = step if step is not None else self._mgr.latest_step()
        assert step is not None, "no checkpoint to restore"
        out = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract_state),
                meta=ocp.args.JsonRestore(),
            ),
        )
        return out["state"], out["meta"].get("epoch", 0)

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def load_params_for_warm_start(workdir: str, abstract_state: Any, step: Optional[int] = None):
    """Warm-start: read another run's params (transfer learning across
    languages — reference checkpoint-reuse idiom)."""
    mgr = CheckpointManager(workdir)
    state, _ = mgr.restore(abstract_state, step)
    mgr.close()
    return state.params
