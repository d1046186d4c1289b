"""Checkpointing (reference: utils/model_utils.py — torch.save/load of
``{model, optimizer, epoch}`` every save_freq epochs).

Implementation: flax msgpack serialization of the full train state
(params + batch_stats + opt_state + step) with the reference's filename
contract ``ckpts/model_{epoch:03d}`` — and, unlike the reference, the
optimizer state is actually restored on resume (the reference saves but
never restores it, utils/model_utils.py:14-39).

Writes are atomic (tmp file + rename). :class:`AsyncCheckpointer` overlaps
serialization + disk IO with the next training steps: the device->host
snapshot happens on the calling thread (so the saved state is consistent),
the msgpack encode + write on a background thread. Call ``wait()`` before
reading the file or exiting.

An Orbax backend (:class:`OrbaxCheckpointer`, ``--ckpt_backend orbax`` on
the train CLIs) writes ``model_{epoch:03d}.orbax`` directories via
orbax.checkpoint's async StandardCheckpointer instead;
:func:`load_checkpoint` restores either format transparently.
"""

from __future__ import annotations

import json
import os
import threading
from pathlib import Path
from typing import Optional, Tuple

import jax
from flax import serialization


def save_checkpoint(ckpt_dir, epoch: int, state, extra: Optional[dict] = None):
    """Write ``model_{epoch:03d}.msgpack`` with params/batch_stats/opt_state.

    (reference: utils/model_utils.py:6-12)
    """
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    payload = _snapshot(state)
    path = ckpt_dir / f"model_{epoch:03d}.msgpack"
    _atomic_write(path, serialization.msgpack_serialize(payload))
    meta = {"epoch": epoch}
    if extra:
        meta.update(extra)
    (ckpt_dir / f"model_{epoch:03d}.json").write_text(json.dumps(meta))
    return path


def _atomic_write(path: Path, data: bytes):
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(data)
    os.replace(tmp, path)


def _snapshot(state) -> dict:
    """Device->host copy of the train state as a pure-python tree."""
    out = {
        "params": jax.device_get(serialization.to_state_dict(state.params)),
        "batch_stats": jax.device_get(
            serialization.to_state_dict(state.batch_stats)
        ),
        "opt_state": jax.device_get(
            serialization.to_state_dict(state.opt_state)
        ),
        "step": int(jax.device_get(state.step)),
    }
    ema = getattr(state, "ema_params", None)
    if ema is not None:
        out["ema_params"] = jax.device_get(serialization.to_state_dict(ema))
    return out


class AsyncCheckpointer:
    """Overlap checkpoint serialization/IO with training.

    Process-local (no cross-host barriers): in multi-host runs callers
    gate saves on ``jax.process_index() == 0``; see ``collective``.

    ``save()`` snapshots the state to host synchronously (cheap relative to
    serialization for big models; guarantees the saved state is the one at
    call time), then encodes + writes on a single background worker. A new
    save waits for the previous one (at most one outstanding write), and
    worker exceptions surface on the next ``save()``/``wait()``.
    """

    collective = False

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

    def save(self, ckpt_dir, epoch: int, state,
             extra: Optional[dict] = None) -> Path:
        self.wait()
        ckpt_dir = Path(ckpt_dir)
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        payload = _snapshot(state)
        path = ckpt_dir / f"model_{epoch:03d}.msgpack"
        meta = {"epoch": epoch, **(extra or {})}

        def _work():
            try:
                _atomic_write(path, serialization.msgpack_serialize(payload))
                (ckpt_dir / f"model_{epoch:03d}.json").write_text(
                    json.dumps(meta)
                )
            except BaseException as e:  # surfaced on next save()/wait()
                self._error = e

        self._thread = threading.Thread(target=_work, daemon=True)
        self._thread.start()
        return path

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async checkpoint write failed") from err


class OrbaxCheckpointer:
    """Orbax-backed async checkpointer (same surface as
    :class:`AsyncCheckpointer`; directories ``model_{epoch:03d}.orbax``
    with the same ``.json`` epoch sidecar). Serialization + IO run on
    Orbax's background threads; ``wait()`` blocks until the previous
    save is durable and surfaces its errors.

    The reference has no equivalent (torch.save is synchronous,
    utils/model_utils.py:6-12); this is the TPU-ecosystem-native option
    (tensorstore-backed, multi-host aware) next to the default msgpack
    backend.
    """

    #: Orbax saves use global process barriers — in a multi-host run
    #: ``save()``/``wait()`` must be called by EVERY process (Orbax
    #: writes from the primary host internally). The msgpack backend is
    #: process-local and is gated on process 0 by callers instead.
    collective = True

    def __init__(self):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        # the epoch .json sidecar is written only AFTER the async data
        # write commits (same durability ordering as the msgpack backend:
        # sidecar implies a complete checkpoint). The post-finalization
        # callback runs on Orbax's background thread right at commit, so
        # a crash between commit and the next wait() cannot leave a
        # complete .orbax dir without its sidecar.
        self._lock = threading.Lock()
        self._pending_sidecar = None
        self._ckptr = ocp.AsyncCheckpointer(
            ocp.StandardCheckpointHandler(),
            async_options=ocp.AsyncOptions(
                post_finalization_callback=self._flush_sidecar
            ),
        )

    def _flush_sidecar(self):
        with self._lock:
            pending, self._pending_sidecar = self._pending_sidecar, None
        if pending is not None and jax.process_index() == 0:
            sidecar_path, meta = pending
            sidecar_path.write_text(json.dumps(meta))

    def save(self, ckpt_dir, epoch: int, state,
             extra: Optional[dict] = None) -> Path:
        self.wait()
        ckpt_dir = Path(ckpt_dir).resolve()
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        path = ckpt_dir / f"model_{epoch:03d}.orbax"
        with self._lock:
            self._pending_sidecar = (
                ckpt_dir / f"model_{epoch:03d}.json",
                {"epoch": epoch, **(extra or {})},
            )
        self._ckptr.save(
            path, args=self._ocp.args.StandardSave(_snapshot(state)),
            force=True,
        )
        return path

    def wait(self):
        self._ckptr.wait_until_finished()
        self._flush_sidecar()

    def close(self):
        self.wait()
        self._ckptr.close()


def make_checkpointer(backend: str = "msgpack"):
    """'msgpack' (default, flax serialization) or 'orbax'."""
    if backend == "orbax":
        return OrbaxCheckpointer()
    if backend == "msgpack":
        return AsyncCheckpointer()
    raise ValueError(f"unknown checkpoint backend: {backend}")


def _restore_orbax(path: Path) -> dict:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        payload = ckptr.restore(Path(path).resolve())
    if "step" in payload:
        payload["step"] = int(payload["step"])
    return payload


def load_checkpoint(path, state=None) -> Tuple[dict, int]:
    """Load a checkpoint (msgpack file or .orbax directory); returns
    (payload, epoch).

    If ``state`` is given, payload arrays are restored against its structure
    (reference loader semantics: utils/model_utils.py:14-39 — strict=False
    analog: missing/extra keys in params are tolerated at the collection
    level by the caller).
    """
    path = Path(path)
    if path.suffix == ".orbax" or path.is_dir():
        payload = _restore_orbax(path)
    else:
        payload = serialization.msgpack_restore(path.read_bytes())
    meta_path = path.with_suffix(".json")
    epoch = 0
    if meta_path.exists():
        epoch = json.loads(meta_path.read_text()).get("epoch", 0)
    if state is not None:
        # Weights-only interchange checkpoints (e.g. tools/parity_check.py
        # --save) carry empty batch_stats/opt_state; keep the live state's
        # structures for anything absent instead of failing from_state_dict
        # against an empty dict.
        stats = payload.get("batch_stats")
        opt = payload.get("opt_state")
        ema = payload.get("ema_params")
        payload = {
            "params": serialization.from_state_dict(
                state.params, payload["params"]
            ),
            "batch_stats": (
                serialization.from_state_dict(state.batch_stats, stats)
                if stats else state.batch_stats
            ),
            "opt_state": (
                serialization.from_state_dict(state.opt_state, opt)
                if opt else state.opt_state
            ),
            "step": payload.get("step", 0),
        }
        if ema is not None:
            tmpl = getattr(state, "ema_params", None)
            payload["ema_params"] = serialization.from_state_dict(
                tmpl if tmpl is not None else state.params, ema
            )
    return payload, epoch


def params_from_payload(payload: dict, use_ema: bool = False):
    """Select the weights to serve from a checkpoint payload.

    ``use_ema=True`` returns the EMA weights written by training with
    ``--ema_decay`` (raises a clear error when the checkpoint has none);
    otherwise the raw last-iterate params."""
    if not use_ema:
        return payload["params"]
    if "ema_params" not in payload:
        raise ValueError(
            "checkpoint has no ema_params (train with --ema_decay to "
            "produce them)"
        )
    return payload["ema_params"]


def save_params(path, params):
    """Params-only msgpack (for base-model weights interchange,
    reference --load_wts_base_model path)."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_bytes(
        serialization.msgpack_serialize(jax.device_get(params))
    )


def load_params(path, template=None):
    payload = serialization.msgpack_restore(Path(path).read_bytes())
    if template is not None:
        payload = serialization.from_state_dict(template, payload)
    return payload


def latest_checkpoint(ckpt_dir) -> Optional[Path]:
    """Checkpoint at the furthest TRAINING POSITION, with its epoch
    ``.json`` sidecar. The sidecar is written only after the data write
    commits (both backends), so "sidecar present" is the completeness
    marker; a sidecar-less entry is an in-flight or interrupted write and
    resuming from it would restart at epoch 0.

    Ordering is by the sidecar's position, not the filename: a
    complete-epoch-``e`` checkpoint sits at (e+1, 0 batches) and a
    mid-epoch interrupt snapshot ({"epoch": e, "batches_done": k}) at
    (e, k). The interrupt snapshot's fixed ``model_999`` name would
    otherwise stem-sort above every later real checkpoint forever (and
    stem order itself breaks at epoch >= 1000)."""
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None

    def _position(p: Path):
        try:
            meta = json.loads(p.with_suffix(".json").read_text())
            epoch = int(meta["epoch"])
        except Exception:
            return (-1, -1.0, p.stem)
        bd = meta.get("batches_done")
        if bd is not None:  # mid-epoch snapshot: inside epoch `epoch`
            return (epoch, float(bd), p.stem)
        return (epoch + 1, -1.0, p.stem)  # complete through `epoch`

    cands = sorted(
        (
            p
            for p in (
                list(ckpt_dir.glob("model_*.msgpack"))
                + list(ckpt_dir.glob("model_*.orbax"))
            )
            if p.with_suffix(".json").exists()
        ),
        key=_position,
    )
    return cands[-1] if cands else None
