"""Self-describing checkpoints with packed occupancy bitmaps.

Matches the reference checkpoint contract (`InfoInv/models/FieldBase.py:
94-116`): one file holding {kwargs, state_dict, packed alpha volume + its
aabb}, so a checkpoint alone is enough to rebuild the model. Format here is
a single ``.npz``: parameter pytree flattened to ``param/<path>`` arrays, a
JSON metadata blob (model/render config, training state), and the alpha
volume bit-packed with ``np.packbits`` exactly like the reference.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Any

import numpy as np

import jax


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            flat.update(_flatten(v, f"{prefix}{i}/"))
    else:
        flat[prefix[:-1]] = np.asarray(tree)
    return flat


def _unflatten(flat: dict[str, np.ndarray]) -> Any:
    root: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def _pack(params, meta, alpha_volume, alpha_aabb, extra_arrays=None):
    arrays = {f"param/{k}": v for k, v in _flatten(jax.device_get(params)).items()}
    blob = dict(meta or {})
    if alpha_volume is not None:
        vol = np.asarray(alpha_volume) > 0.5
        arrays["alphaMask/mask"] = np.packbits(vol.reshape(-1))
        arrays["alphaMask/aabb"] = np.asarray(alpha_aabb, np.float32)
        blob["alphaMask.shape"] = list(vol.shape)
    for k, v in (extra_arrays or {}).items():
        arrays[f"extra/{k}"] = np.asarray(jax.device_get(v))
    arrays["meta"] = np.frombuffer(json.dumps(blob).encode(), dtype=np.uint8)
    return arrays


def pack_checkpoint(
    params: Any,
    meta: dict | None = None,
    alpha_volume: np.ndarray | None = None,
    alpha_aabb: np.ndarray | None = None,
    extra_arrays: dict[str, np.ndarray] | None = None,
) -> dict[str, np.ndarray]:
    """Snapshot checkpoint state to host arrays (the blocking part of a
    save); pair with :class:`AsyncCheckpointWriter` / :func:`write_arrays_atomic`."""
    return _pack(params, meta, alpha_volume, alpha_aabb, extra_arrays)


def save_checkpoint(
    path: str,
    params: Any,
    meta: dict | None = None,
    alpha_volume: np.ndarray | None = None,
    alpha_aabb: np.ndarray | None = None,
    backend: str = "npz",
    extra_arrays: dict[str, np.ndarray] | None = None,
) -> None:
    """Write params (+ optional binary occupancy volume) to ``path``.

    backend='npz' (default): one self-contained .npz file.
    backend='orbax': an Orbax PyTree checkpoint DIRECTORY at ``path`` —
    the production-scale option (async-capable, multi-host sharded
    restore); same logical content, so either backend round-trips through
    :func:`load_checkpoint` (which dispatches on file-vs-directory).

    ``extra_arrays`` (stored under an ``extra/`` prefix) carries state
    beyond the reference checkpoint contract — optimizer moments, sampler
    position, kept-ray ids — enabling exact TRAINING resume
    (:func:`load_extra_arrays`). The reference has no training resume at
    all (a killed `InfoInv/main.py` run restarts from scratch); plain
    :func:`load_checkpoint` consumers ignore the prefix, so checkpoints
    stay loadable by render-only / the importer either way.
    """
    arrays = _pack(params, meta, alpha_volume, alpha_aabb, extra_arrays)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ocp.PyTreeCheckpointer().save(path, arrays, force=True)
        return
    if backend != "npz":
        raise ValueError(f"unknown checkpoint backend {backend!r}")
    write_arrays_atomic(path, arrays)


def write_arrays_atomic(path: str, arrays: dict[str, np.ndarray]) -> None:
    """npz-serialize ``arrays`` to ``path`` via tmp-file + ``os.replace``.

    A crash/kill mid-write can never corrupt an existing checkpoint at
    ``path``: the bytes land in ``<path>.tmp`` first and only a completed,
    fsynced file is renamed over the old one (rename is atomic on POSIX).
    """
    tmp = f"{path}.tmp"
    try:
        with open(tmp, "wb") as f:
            # Hand np.savez the file object: the string API appends ".npz"
            # to names, which would break the rename pairing.
            np.savez(f, **arrays)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


class AsyncCheckpointWriter:
    """Single-worker background npz writer for periodic training saves.

    The measured pain (results/gauge30k_r4b, round-4 VERDICT): a
    synchronous 213 MB ``np.savez`` on this 1-core host blocks training
    ~75 s per ``save_every``. The split here keeps only the STATE SNAPSHOT
    (device_get + flatten, so the checkpoint is a consistent point-in-time
    view) on the training thread and moves serialization + disk to a
    background thread with an atomic rename (:func:`write_arrays_atomic`).

    One write in flight at a time: ``submit`` joins the previous write
    first (saves are thousands of steps apart; back-to-back submits just
    serialize), and re-raises any exception the previous write hit so
    failures are loud at the next save rather than silent. Call ``wait()``
    before process exit / the final synchronous save.

    Contrast: the reference saves synchronously and rarely
    (`InfoInv/main.py:335-336`, every 10k iters, no optimizer state).
    """

    def __init__(self) -> None:
        self._thread: threading.Thread | None = None
        self._exc: BaseException | None = None

    def wait(self) -> None:
        """Block until any in-flight write finishes; re-raise its error."""
        t = self._thread
        if t is not None:
            t.join()
            self._thread = None
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc

    def submit(self, path: str, arrays: dict[str, np.ndarray]) -> None:
        self.wait()

        def _run() -> None:
            try:
                write_arrays_atomic(path, arrays)
            except BaseException as e:  # surfaced by the next wait/submit
                self._exc = e

        self._thread = threading.Thread(
            target=_run, name="ckpt-writer", daemon=True
        )
        self._thread.start()


def load_checkpoint(path: str):
    """Returns (params, meta, alpha_volume|None, alpha_aabb|None).

    Accepts either backend: a .npz file or an Orbax checkpoint directory.
    """
    import os

    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
        arrays = {k: np.asarray(v) for k, v in restored.items()}
    else:
        with np.load(path) as z:
            arrays = {k: z[k] for k in z.files}
    meta = json.loads(bytes(arrays.pop("meta")).decode())
    alpha_volume = alpha_aabb = None
    if "alphaMask/mask" in arrays:
        shape = meta["alphaMask.shape"]
        n = int(np.prod(shape))
        bits = np.unpackbits(arrays.pop("alphaMask/mask"))[:n]
        alpha_volume = bits.reshape(shape).astype(np.float32)
        alpha_aabb = arrays.pop("alphaMask/aabb")
    params = _unflatten(
        {k[len("param/") :]: v for k, v in arrays.items() if k.startswith("param/")}
    )
    return params, meta, alpha_volume, alpha_aabb


def load_extra_arrays(path: str) -> dict[str, np.ndarray]:
    """Read the ``extra/`` arrays (training-resume state) from a
    checkpoint; empty dict when the checkpoint predates them or was saved
    without resume state."""
    import os

    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
        items = {k: np.asarray(v) for k, v in restored.items()}
    else:
        with np.load(path) as z:
            items = {k: z[k] for k in z.files if k.startswith("extra/")}
    return {k[len("extra/") :]: v for k, v in items.items() if k.startswith("extra/")}
