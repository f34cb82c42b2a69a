"""Orbax checkpoint backend (optional alternative to msgpack).

The Trainer's default best/last msgpack files cover the reference's
checkpoint semantics (engine.py:195-230); this module adds an
orbax-managed directory for large-scale runs: atomic writes, retention,
and async-friendly saving.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

__all__ = ["OrbaxCheckpointer"]


class OrbaxCheckpointer:
    def __init__(self, directory, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, payload: Any, wait: bool = False):
        self.manager.save(
            step, args=self._ocp.args.StandardSave(payload)
        )
        if wait:
            self.manager.wait_until_finished()

    def restore(self, step: Optional[int] = None, template: Any = None):
        if step is None:
            step = self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        if template is not None:
            return self.manager.restore(
                step, args=self._ocp.args.StandardRestore(template)
            )
        return self.manager.restore(step)

    @property
    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def close(self):
        self.manager.wait_until_finished()
        self.manager.close()
