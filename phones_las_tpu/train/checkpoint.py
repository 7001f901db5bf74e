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

import jax
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
        state with the right structure.

        Falls back to a structure-free restore + graft for checkpoints
        written before ``AttentionParams.g`` (the trainable bahdanau_norm
        weight-norm gain) existed: the missing leaf is default-filled
        (init value ``sqrt(1/attn_units)`` in params; zeros in the Adam
        moments) instead of failing StandardRestore with a pytree
        structure mismatch.
        """
        step = step if step is not None else self._mgr.latest_step()
        assert step is not None, "no checkpoint to restore"
        try:
            out = self._mgr.restore(
                step,
                args=ocp.args.Composite(
                    state=ocp.args.StandardRestore(abstract_state),
                    meta=ocp.args.JsonRestore(),
                ),
            )
            return out["state"], out["meta"].get("epoch", 0)
        except Exception as structured_err:
            # the graft fallback exists only for pytree-structure drift
            # (legacy checkpoints missing a since-added leaf); transient
            # IO errors / corruption should fail immediately rather than
            # re-read the full checkpoint a second time first
            msg = str(structured_err).lower()
            structural = any(
                k in msg for k in ("structure", "pytree", "tree", "leaf",
                                   "key", "field", "missing", "mismatch")
            )
            if not structural:
                raise
            try:
                raw = self._mgr.restore(
                    step,
                    args=ocp.args.Composite(
                        state=ocp.args.StandardRestore(),
                        meta=ocp.args.JsonRestore(),
                    ),
                )
                state = _graft_legacy(abstract_state, raw["state"])
            except Exception as graft_err:
                # the fallback exists for legacy-structure checkpoints;
                # anything else (corruption, IO) must surface the ORIGINAL
                # structured-restore error, not the graft's secondary one
                raise graft_err from structured_err
            return state, raw["meta"].get("epoch", 0)

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


_MISSING = object()


def _graft_legacy(template: Any, node: Any, in_params: bool = False):
    """Rebuild ``template``'s pytree structure from a structure-free
    orbax restore (NamedTuples come back as dicts, tuples as lists),
    default-filling fields absent from legacy checkpoints.

    The only known migratable field is ``AttentionParams.g`` (added with
    the TF-parity weight-norm init fix): in the params subtree it gets
    its init default ``sqrt(1/attn_units)`` (attn_units taken from the
    sibling ``v`` vector); in the optimizer-moment mirrors it gets zeros
    (a fresh moment). Any other structural mismatch still fails loudly.
    """
    import numpy as np

    if template is None:
        return None
    if hasattr(template, "_fields"):  # NamedTuple ← dict by field name
        vals = []
        for f in template._fields:
            tf = getattr(template, f)
            sub = node.get(f, _MISSING) if isinstance(node, dict) else _MISSING
            if sub is _MISSING or (sub is None and tf is not None):
                assert f == "g", (
                    f"checkpoint is missing field {f!r} and no migration "
                    f"is known for it"
                )
                if tf is None:
                    vals.append(None)
                else:
                    v_t = getattr(template, "v", None)
                    if in_params and v_t is not None and len(v_t.shape) == 1:
                        fill = float(np.sqrt(1.0 / v_t.shape[0]))
                    else:
                        fill = 0.0
                    vals.append(jax.numpy.full(tf.shape, fill, tf.dtype))
            else:
                vals.append(
                    _graft_legacy(tf, sub, in_params or f == "params")
                )
        return type(template)(*vals)
    if isinstance(template, (tuple, list)):
        assert len(template) == len(node), (
            f"structure mismatch: {len(template)} vs {len(node)} children"
        )
        return type(template)(
            _graft_legacy(t, n, in_params) for t, n in zip(template, node)
        )
    if isinstance(template, dict):
        return {k: _graft_legacy(v, node[k], in_params) for k, v in template.items()}
    return node


def load_averaged_params(
    workdir: str, abstract_state: Any, last_k: int
) -> Tuple[Any, list]:
    """Checkpoint averaging: mean of the params of the newest ``last_k``
    checkpoints → (params, steps_used).

    A standard ASR deployment trick the reference lacks (its infer.py
    always takes ``latest_checkpoint`` — SURVEY.md §4.3): averaging the
    tail of training smooths SGD noise and typically buys a small PER
    improvement for free. Non-trainable leaves (CMVN stats, binf codes)
    are identical across checkpoints, so the mean is a no-op for them.
    """
    import numpy as np

    assert last_k >= 1, last_k
    mgr = CheckpointManager(workdir)
    steps = sorted(mgr._mgr.all_steps())
    assert steps, f"no checkpoint in {workdir}"
    use = steps[-last_k:]
    acc = None
    for s in use:
        state, _ = mgr.restore(abstract_state, s)
        # accumulate on HOST: device arithmetic would round-trip every
        # leaf through the accelerator per checkpoint (minutes through a
        # tunneled TPU); f64 accumulation also keeps the mean exact
        p = jax.tree.map(
            lambda a: np.asarray(a, np.float64), state.params
        )
        acc = p if acc is None else jax.tree.map(lambda a, b: a + b, acc, p)
    mgr.close()
    n = float(len(use))
    dtypes = jax.tree.map(lambda a: a.dtype, abstract_state.params)
    avg = jax.tree.map(
        lambda a, dt: np.asarray(a / n, dt), acc, dtypes
    )
    # commit the averaged tree to device ONCE: returning host numpy would
    # make every jitted dispatch downstream (serve/infer hold these params
    # for the process lifetime) re-transfer the full model per call
    avg = jax.device_put(avg)
    return avg, use


def load_params_for_warm_start(
    workdir: str,
    abstract_state: Any,
    step: Optional[int] = None,
    scope: str = "all",  # 'all' | 'encoder'
    target_params: Any = None,
):
    """Warm-start: read another run's params (transfer learning across
    languages — reference checkpoint-reuse idiom).

    ``scope='encoder'`` restores only the listener (+ CMVN stats) into
    ``target_params`` — the cross-language recipe: phone sets (and so
    decoder shapes) differ between languages, but the encoder transfers.
    """
    mgr = CheckpointManager(workdir)
    if scope == "all":
        state, _ = mgr.restore(abstract_state, step)
        mgr.close()
        return state.params
    assert scope == "encoder" and target_params is not None
    # raw (structure-free) read, so decoder shape differences between the
    # source language's run and ours never collide; rebuild only the
    # listener subtree (+ CMVN stats) against our NamedTuple structure.
    step = step if step is not None else mgr.latest_step()
    assert step is not None, f"no checkpoint to warm-start from in {workdir}"
    raw = mgr._mgr.restore(
        step, args=ocp.args.Composite(state=ocp.args.StandardRestore())
    )["state"]["params"]
    mgr.close()

    def rebuild(template, node):
        if hasattr(template, "_fields"):  # NamedTuple ← dict by field name
            return type(template)(
                *[rebuild(getattr(template, f), node[f]) for f in template._fields]
            )
        if isinstance(template, tuple):  # tuple ← list
            assert len(template) == len(node), (
                f"encoder layer-count mismatch: {len(template)} vs {len(node)}"
            )
            return tuple(rebuild(t, n) for t, n in zip(template, node))
        assert template.shape == node.shape, (
            f"encoder shape mismatch: {template.shape} vs {node.shape}"
        )
        return node

    return target_params._replace(
        listener=rebuild(target_params.listener, raw["listener"]),
        cmvn_mean=raw["cmvn_mean"],
        cmvn_std=raw["cmvn_std"],
    )
