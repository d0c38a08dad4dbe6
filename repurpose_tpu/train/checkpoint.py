"""Orbax checkpointing.

Replaces torch.save/load of {model, optimizer, schedulers, epoch, loss}
(reference main.py:513-531, 213-228) with an Orbax CheckpointManager saving
the whole TrainState pytree plus a JSON metadata blob (epoch, best metric).
The schedule needs no state: it is a pure function of ``state.step``
(vs the reference's two stateful torch schedulers).

Multi-host safe: Orbax coordinates writes across processes; the "rank 0
saves" logic of the reference is handled internally.
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp

from repurpose_tpu.train.state import TrainState


class Checkpointer:
    def __init__(
        self, directory: str, max_to_keep: int | None = 5, async_save: bool = False
    ):
        """``async_save`` overlaps checkpoint writes with training (Orbax
        async); save() then returns before the write finishes and
        wait_until_finished happens at the next save/close."""
        self._async = async_save
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                enable_async_checkpointing=async_save,
            ),
        )

    @property
    def directory(self) -> str:
        return str(self._mgr.directory)

    def save(self, step: int, state: TrainState, metadata: dict | None = None) -> None:
        args = {"state": ocp.args.StandardSave(state)}
        if metadata is not None:
            args["meta"] = ocp.args.JsonSave(metadata)
        # A best-checkpoint save can land on the step the periodic epoch save
        # just wrote (no train step between them); this orbax raises
        # StepAlreadyExistsError unconditionally (its `force` only bypasses
        # the save-interval policy), so drain any in-flight save and replace
        # the step — the re-save carries the richer metadata.
        if step in self._mgr.all_steps():
            self._mgr.wait_until_finished()
            self._mgr.delete(step)
        self._mgr.save(step, args=ocp.args.Composite(**args))
        if not self._async:
            self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(
        self, abstract_state: TrainState, step: int | None = None
    ) -> tuple[TrainState, dict]:
        """Restore into the structure of ``abstract_state`` (shapes/shardings
        come from it, so restores land directly on the mesh)."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self.directory}")
        # save(metadata=None) writes no "meta" item, and orbax's composite
        # restore RAISES on absent items rather than skipping them — probe
        # the step's item set up front (a broad except KeyError here would
        # mask real restore failures and re-run a multi-GB restore to boot)
        args = {"state": ocp.args.StandardRestore(abstract_state)}
        try:
            has_meta = "meta" in (self._mgr.item_metadata(step) or {})
        except Exception:  # metadata probe must never block a restore
            has_meta = True
        if has_meta:
            args["meta"] = ocp.args.JsonRestore()
        restored = self._mgr.restore(step, args=ocp.args.Composite(**args))
        meta: Any = restored.get("meta") or {}
        return restored["state"], dict(meta)

    def close(self) -> None:
        if self._mgr is None:
            return
        self._mgr.wait_until_finished()
        self._mgr.close()
        self._mgr = None
