"""Native checkpoint/resume.

The reference's only resilience feature is checkpoint-on-SIGTERM into the
TSV model files (reference: src/main.cc:29-46, LinkSampling::do_on_stop,
src/linksampling.cc:763-766) and `-load <dir>` to resume from them
(src/linksampling.cc:1266-1352). This module keeps that text interop
surface AND adds a native orbax checkpoint of the full engine state
(device arrays + host counters), which is the multi-host restart story:
every process restores the same step index and the Robbins-Monro
schedules realign with zero communication.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:                   # pragma: no cover - orbax is baked in
    _HAVE_ORBAX = False


def save_checkpoint(outdir: str, state: Dict[str, Any], step: int) -> str:
    """Save device arrays + host scalars under <outdir>/ckpt/<step>."""
    path = os.path.abspath(os.path.join(outdir, "ckpt"))
    os.makedirs(path, exist_ok=True)
    arrays = {k: np.asarray(v) for k, v in state.items()
              if isinstance(v, (jax.Array, np.ndarray))}
    scalars = {k: v for k, v in state.items()
               if not isinstance(v, (jax.Array, np.ndarray))}
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.join(path, str(step)), arrays, force=True)
        ckptr.wait_until_finished()
    else:
        np.savez(os.path.join(path, f"{step}.npz"), **arrays)
    with open(os.path.join(path, f"{step}.meta.json"), "w") as f:
        json.dump(scalars, f)
    with open(os.path.join(path, "latest"), "w") as f:
        f.write(str(step))
    return os.path.join(path, str(step))


def latest_step(outdir: str) -> Optional[int]:
    p = os.path.join(outdir, "ckpt", "latest")
    if not os.path.exists(p):
        return None
    return int(open(p).read().strip())


def load_checkpoint(outdir: str, step: Optional[int] = None
                    ) -> Optional[Dict[str, Any]]:
    """Restore the state dict saved by save_checkpoint (numpy arrays +
    scalars merged); None when no checkpoint exists."""
    if step is None:
        step = latest_step(outdir)
    if step is None:
        return None
    path = os.path.abspath(os.path.join(outdir, "ckpt"))
    meta = {}
    mp = os.path.join(path, f"{step}.meta.json")
    if os.path.exists(mp):
        meta = json.load(open(mp))
    if _HAVE_ORBAX and os.path.isdir(os.path.join(path, str(step))):
        ckptr = ocp.StandardCheckpointer()
        arrays = ckptr.restore(os.path.join(path, str(step)))
    else:
        npz = os.path.join(path, f"{step}.npz")
        if not os.path.exists(npz):
            return None
        arrays = dict(np.load(npz))
    out: Dict[str, Any] = dict(arrays)
    out.update(meta)
    return out
