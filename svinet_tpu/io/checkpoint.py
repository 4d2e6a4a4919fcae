"""Native checkpoint/resume.

The reference's only resilience feature is checkpoint-on-SIGTERM into the
TSV model files (reference: src/main.cc:29-46, LinkSampling::do_on_stop,
src/linksampling.cc:763-766) and `-load <dir>` to resume from them
(src/linksampling.cc:1266-1352). This module keeps that text interop
surface AND adds a native orbax checkpoint of the full engine state
(device arrays + host counters).

Sharded state is handed to orbax AS jax.Arrays — orbax writes each shard
from the device that holds it, so a gamma row-sharded across the mesh
(the n=1M/K=500 stretch regime) is never gathered into one host buffer.
Restores accept an optional {name: Sharding} map and come back directly
in that device layout (shapes/dtypes read from the checkpoint metadata).
Multi-process runs keep replicated state (the supported mode); process 0
converts its local replica and writes alone.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:                   # pragma: no cover - orbax is baked in
    _HAVE_ORBAX = False

KEEP_LAST = 3   # checkpoint retention


def _is_primary() -> bool:
    try:
        return jax.process_index() == 0
    except Exception:
        return True


def host_read(v: "jax.Array") -> np.ndarray:
    """Full host copy of a (possibly multi-process) jax.Array. Replicated
    or single-process arrays read locally; row-sharded multi-process
    arrays go through a tiled process_allgather — a COLLECTIVE, so every
    process must call this together."""
    if v.is_fully_replicated or v.is_fully_addressable:
        return np.asarray(v)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(v, tiled=True))


def save_checkpoint(outdir: str, state: Dict[str, Any], step: int) -> str:
    """Save device arrays + host scalars under <outdir>/ckpt/<step>.
    The `latest` pointer is written atomically (tmp + rename) so an
    interrupted save can never leave an unreadable pointer; old steps
    beyond KEEP_LAST are pruned.

    Multi-process runs: every process participates in the host gather
    (collective when state is row-sharded), then ONLY process 0 writes —
    the npz fallback rather than orbax, whose save path would need all
    processes to enter its own sync barrier."""
    path = os.path.abspath(os.path.join(outdir, "ckpt"))
    multiproc = jax.process_count() > 1
    if multiproc:
        state = {k: (host_read(v) if isinstance(v, jax.Array) else v)
                 for k, v in state.items()}
        if not _is_primary():
            return path
    os.makedirs(path, exist_ok=True)
    arrays: Dict[str, Any] = {}
    for k, v in state.items():
        if isinstance(v, jax.Array):
            # single-process: hand the (possibly sharded) jax.Array to
            # orbax untouched — each shard streams from its own device,
            # no host gather.
            arrays[k] = v if _HAVE_ORBAX else np.asarray(v)
        elif isinstance(v, np.ndarray):
            arrays[k] = v
    scalars = {k: v for k, v in state.items()
               if not isinstance(v, (jax.Array, np.ndarray))}
    if _HAVE_ORBAX and not multiproc:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.join(path, str(step)), arrays, force=True)
        ckptr.wait_until_finished()
    else:
        # multi-process: plain npz from the primary (orbax's save would
        # enter a cross-process sync barrier that only one process reaches)
        np.savez(os.path.join(path, f"{step}.npz"),
                 **{k: np.asarray(v) for k, v in arrays.items()})
    with open(os.path.join(path, f"{step}.meta.json.tmp"), "w") as f:
        json.dump(scalars, f)
    os.replace(os.path.join(path, f"{step}.meta.json.tmp"),
               os.path.join(path, f"{step}.meta.json"))
    with open(os.path.join(path, "latest.tmp"), "w") as f:
        f.write(str(step))
    os.replace(os.path.join(path, "latest.tmp"),
               os.path.join(path, "latest"))
    _prune(path, step)
    return os.path.join(path, str(step))


def _steps_on_disk(path: str):
    steps = []
    for name in os.listdir(path):
        base = name.split(".")[0]
        if base.isdigit():
            steps.append(int(base))
    return sorted(set(steps))


def _prune(path: str, newest: int) -> None:
    steps = [s for s in _steps_on_disk(path) if s != newest]
    for s in steps[: max(0, len(steps) - (KEEP_LAST - 1))]:
        for suffix in ("", ".npz", ".meta.json"):
            p = os.path.join(path, f"{s}{suffix}")
            try:
                if os.path.isdir(p):
                    shutil.rmtree(p)
                elif os.path.exists(p):
                    os.remove(p)
            except OSError:
                pass


def latest_step(outdir: str) -> Optional[int]:
    path = os.path.join(outdir, "ckpt")
    p = os.path.join(path, "latest")
    if os.path.exists(p):
        txt = open(p).read().strip()
        if txt.isdigit():
            return int(txt)
    # pointer missing/corrupt: fall back to the newest step on disk
    if os.path.isdir(path):
        steps = _steps_on_disk(path)
        if steps:
            return steps[-1]
    return None


def _orbax_restore(ckptr, path: str, shardings: Optional[Dict[str, Any]]):
    """Metadata-driven restore: build an abstract target from the saved
    shapes/dtypes so arrays named in `shardings` come back already laid
    out on their mesh (no replicated staging copy) and the rest come back
    as plain numpy."""
    try:
        md = ckptr.metadata(path).item_metadata
        tree = dict(md.tree) if hasattr(md, "tree") else dict(md)
        target: Dict[str, Any] = {}
        for k, m in tree.items():
            sh = (shardings or {}).get(k)
            if sh is not None:
                target[k] = jax.ShapeDtypeStruct(tuple(m.shape), m.dtype,
                                                 sharding=sh)
            else:
                target[k] = np.zeros(tuple(m.shape), m.dtype)
        return ckptr.restore(path, target)
    except Exception:
        # topology drift / metadata surprises: plain restore still works
        # (orbax warns; arrays land replicated or as numpy)
        return ckptr.restore(path)


def _load_step(path: str, step: int,
               shardings: Optional[Dict[str, Any]]
               ) -> Optional[Dict[str, Any]]:
    meta = {}
    mp = os.path.join(path, f"{step}.meta.json")
    if os.path.exists(mp):
        meta = json.load(open(mp))
    if _HAVE_ORBAX and os.path.isdir(os.path.join(path, str(step))):
        ckptr = ocp.StandardCheckpointer()
        arrays = _orbax_restore(ckptr, os.path.join(path, str(step)),
                                shardings)
    else:
        npz = os.path.join(path, f"{step}.npz")
        if not os.path.exists(npz):
            return None
        arrays = dict(np.load(npz))
        if shardings:
            # global_put handles shardings that span other processes'
            # devices (multi-host resume: every process reads the same
            # canonical npz and contributes its local shards)
            from svinet_tpu.parallel.mesh import global_put
            arrays = {k: (global_put(v, shardings[k])
                          if k in shardings else v)
                      for k, v in arrays.items()}
    out: Dict[str, Any] = dict(arrays)
    out.update(meta)
    return out


def load_checkpoint(outdir: str, step: Optional[int] = None,
                    shardings: Optional[Dict[str, Any]] = None
                    ) -> Optional[Dict[str, Any]]:
    """Restore the state dict saved by save_checkpoint (scalars merged).
    `shardings` maps array names to jax Shardings; named arrays restore
    straight into that device layout, everything else as numpy. Returns
    None when no checkpoint exists.

    A step that fails to load (e.g. a process killed mid-way through the
    very first save leaves a truncated npz/orbax dir and no `latest`
    pointer — the pointer itself is atomic) is skipped with a warning and
    the next older step on disk is tried, so -resume degrades to an older
    checkpoint or a fresh start instead of crashing. An EXPLICIT step
    request propagates its load error instead — the caller asked for
    that exact state, so silently pretending no checkpoint exists would
    restart from scratch while appending to the old report files."""
    path = os.path.abspath(os.path.join(outdir, "ckpt"))
    if step is not None:
        return _load_step(path, step, shardings)
    latest = latest_step(outdir)
    if latest is None:
        return None
    older = ([s for s in _steps_on_disk(path) if s != latest]
             if os.path.isdir(path) else [])
    candidates = [latest] + older[::-1]
    for i, s in enumerate(candidates):
        try:
            out = _load_step(path, s, shardings)
        except Exception as e:   # truncated npz / partial orbax dir
            rest = candidates[i + 1:]
            print(f"+ checkpoint step {s} unreadable ({e!r}); "
                  + (f"falling back to step {rest[0]} — NOTE: report "
                     "files already contain rows past it, the resumed "
                     "trace will repeat those iterations"
                     if rest else "no older step; starting fresh"))
            continue
        if out is not None:
            return out
    return None
