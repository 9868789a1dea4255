"""Checkpoint / resume on Orbax.

The reference has **no persistence at all**: the model lives only in driver
memory (SURVEY §5 — no FMModel save/load anywhere; only Kryo registration,
FMUtils.scala:12-21) and a crashed run restarts from scratch. Here
checkpointing is first-class:

  * async Orbax saves of the full training state (params + optimizer slots +
    step counter) — sharded arrays are written per-shard, so a row-sharded
    V table never funnels through one host;
  * a JSON sidecar for host-side progress (epoch, rng seed, history) so a
    resumed run continues the deterministic (seed, epoch)-keyed batch order
    exactly where it left off;
  * restore onto an arbitrary mesh: pass a template pytree (optionally with
    NamedSharding-annotated ShapeDtypeStructs) and arrays land directly on
    their owning devices.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

log = logging.getLogger("sparkfm_tpu")


class Checkpointer:
    """Thin wrapper around ocp.CheckpointManager for train-state pytrees."""

    def __init__(self, directory: str, max_to_keep: int = 3,
                 async_save: bool = True):
        self.directory = os.path.abspath(directory)  # orbax requires absolute
        opts = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            enable_async_checkpointing=async_save)
        self._mgr = ocp.CheckpointManager(self.directory, options=opts)

    def save(self, step: int, state: Any,
             extra: Optional[Dict[str, Any]] = None) -> None:
        """Async-save `state` (any pytree) plus a small JSON `extra` dict."""
        args = {"state": ocp.args.StandardSave(state)}
        if extra is not None:
            args["extra"] = ocp.args.JsonSave(extra)
        self._mgr.save(step, args=ocp.args.Composite(**args))

    def restore(self, step: Optional[int] = None,
                template: Any = None) -> Tuple[Any, Dict[str, Any]]:
        """Restore (state, extra). `template` shapes/shards the result: pass
        the freshly-initialized state (arrays are used as ShapeDtypeStructs;
        their shardings are respected, enabling direct sharded restore)."""
        if step is None:
            step = self.latest_step()
            if step is None:
                raise FileNotFoundError(
                    f"no checkpoint under {self.directory}")
        if template is not None:
            abstract = jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, template)
            args = ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract),
                extra=ocp.args.JsonRestore())
        else:
            args = ocp.args.Composite(state=ocp.args.StandardRestore(),
                                      extra=ocp.args.JsonRestore())
        try:
            out = self._mgr.restore(step, args=args)
        except FileNotFoundError:
            # checkpoint saved without `extra`
            args = ocp.args.Composite(state=args["state"])
            out = self._mgr.restore(step, args=args)
            return out["state"], {}
        return out["state"], dict(out.get("extra") or {})

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return self._mgr.all_steps()

    def wait(self) -> None:
        """Block until pending async saves are durable."""
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
