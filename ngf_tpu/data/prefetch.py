"""Background block prefetch: overlap host-side batch assembly with device
execution — the TPU-side analog of the reference's DataLoader workers
(`UV-Mapping/data/dtu.py:294-297`).

One daemon thread repeatedly calls a user build function and parks the
results in a small bounded queue; the training loop pops a ready block
while the device executes the previous one.
"""

from __future__ import annotations

import queue
import threading


class BlockPrefetcher:
    def __init__(self, build_fn, depth: int = 2):
        self._build = build_fn
        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._err: BaseException | None = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while not self._stop.is_set():
            try:
                item = self._build()
            except BaseException as e:  # surfaced on the next next()
                self._err = e
                return
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=0.1)
                    break
                except queue.Full:
                    continue

    def next(self):
        while True:
            if self._err is not None:
                raise self._err
            try:
                return self._q.get(timeout=0.5)
            except queue.Empty:
                if not self._thread.is_alive() and self._err is None:
                    raise RuntimeError("prefetch worker exited unexpectedly")

    def close(self):
        """Stop the worker and drop any staged blocks (used when the
        underlying dataset/sampler is about to change, e.g. mask events)."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=2.0)
