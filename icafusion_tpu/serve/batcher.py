"""Dynamic micro-batching front end for ServingEngine — coalesce concurrent
single-pair requests into bucketed device batches.

The reference's serving story is the Flask demo (utils/flask_rest_api/
restapi.py:16-37): one image per POST, one batch-1 forward per request. On a
TPU that leaves most of the chip idle — measured on v5e (BENCH.md round-4
small-batch table, int8+merge): batch 1 costs 4.54 ms/pair while batch 32
costs 1.56 ms/pair, so a loaded batch-1 server wastes ~3x the hardware.

This batcher is the TPU-native fix. Request threads `submit()` one letterboxed
pair each and block; a single dispatcher thread drains the queue and runs the
largest power-of-two *bucket* that fits the pending requests. Buckets — not
arbitrary dynamic batch sizes — because XLA compiles one program per static
shape: each bucket is traced/compiled once (eagerly via `warmup()`), and every
request thereafter reuses a cached executable. Behavior under load:

  idle server   -> bucket 1 dispatches immediately: batch-1 latency, no
                   artificial wait (max_wait_ms=0 default is greedy);
  loaded server -> while the device runs batch i, new requests pile up in the
                   queue and batch i+1 dispatches at a larger bucket — the
                   queue *self-batches* under backpressure, approaching
                   batch-32 per-pair efficiency with zero added idle latency.

`max_wait_ms > 0` optionally holds the first request of a batch to let peers
arrive — a latency/throughput knob for bursty-but-sparse traffic.

Results are identical to serial `engine.predict_arrays` calls: images are
independent through the whole serve step (eval-mode BN, per-image decode+NMS),
and padding rows are zero images whose outputs are dropped.
"""

from __future__ import annotations

import queue
import threading
from typing import List, Optional, Sequence

import numpy as np


class _Request:
    __slots__ = ("rgb", "ir", "hw", "event", "result", "error")

    def __init__(self, rgb, ir, hw):
        self.rgb, self.ir, self.hw = rgb, ir, hw
        self.event = threading.Event()
        self.result = None
        self.error = None


def default_buckets(engine) -> List[int]:
    """Powers of two up to the engine batch (plus the engine batch itself),
    restricted to multiples of the engine's mesh size — a sharded batch dim
    must divide over the `data` mesh axis."""
    mesh_n = int(engine.mesh.devices.size)
    out = []
    b = 1
    while b <= engine.batch_size:
        if b % mesh_n == 0:
            out.append(b)
        b *= 2
    if engine.batch_size not in out:
        out.append(engine.batch_size)
    return sorted(out)


class MicroBatcher:
    """Thread-safe coalescing front end over one ServingEngine.

    submit() is called from any number of request threads; one dispatcher
    thread owns the device. `stats()` reports how requests coalesced.
    """

    def __init__(self, engine, buckets: Optional[Sequence[int]] = None,
                 max_wait_ms: float = 0.0, queue_cap: int = 1024):
        self.engine = engine
        self.buckets = sorted(set(buckets)) if buckets else default_buckets(engine)
        mesh_n = int(engine.mesh.devices.size)
        bad = [b for b in self.buckets
               if b % mesh_n != 0 or b > engine.batch_size]
        if bad:
            raise ValueError(
                f"buckets {bad} invalid: must be multiples of the engine mesh "
                f"size ({mesh_n}) and <= engine.batch_size ({engine.batch_size})")
        self.max_wait_s = max_wait_ms / 1000.0
        self._q: "queue.Queue[Optional[_Request]]" = queue.Queue(queue_cap)
        self._lock = threading.Lock()
        self._stats = {"requests": 0, "batches": 0, "bucket_counts": {}}
        self._closed = False
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="icafusion-microbatcher")
        self._thread.start()

    # ---- client side ------------------------------------------------------

    def submit(self, rgb: np.ndarray, ir: np.ndarray,
               orig_hw=None) -> np.ndarray:
        """One letterboxed (H, W, 3) uint8 pair on the engine canvas ->
        (k, 6) [x1,y1,x2,y2,conf,cls] detections (native coords if orig_hw
        is the source (h0, w0)). Blocks until the coalesced batch returns."""
        if self._closed:
            raise RuntimeError("MicroBatcher is closed")
        req = _Request(np.asarray(rgb), np.asarray(ir), orig_hw)
        self._q.put(req)
        req.event.wait()
        if req.error is not None:
            raise req.error
        return req.result

    def stats(self) -> dict:
        with self._lock:
            return {"requests": self._stats["requests"],
                    "batches": self._stats["batches"],
                    "bucket_counts": dict(self._stats["bucket_counts"])}

    def close(self):
        if not self._closed:
            self._closed = True
            self._q.put(None)
            self._thread.join(timeout=30)

    # ---- dispatcher side --------------------------------------------------

    def _collect(self) -> Optional[List[_Request]]:
        """Block for the first request, then gather peers: greedily drain
        whatever is already queued, and (if max_wait_ms) keep waiting for
        stragglers until the largest bucket fills or the deadline passes."""
        import time
        first = self._q.get()
        if first is None:
            return None
        batch = [first]
        cap = self.buckets[-1]
        deadline = time.monotonic() + self.max_wait_s
        while len(batch) < cap:
            timeout = deadline - time.monotonic()
            try:
                nxt = (self._q.get(timeout=timeout) if timeout > 0
                       else self._q.get_nowait())
            except queue.Empty:
                break
            if nxt is None:          # close() sentinel: finish this batch,
                self._q.put(None)    # re-post so the loop exits after it
                break
            batch.append(nxt)
        return batch

    def _run(self):
        engine = self.engine
        while True:
            batch = self._collect()
            if batch is None:
                return
            n = len(batch)
            bucket = next(b for b in self.buckets if b >= n)
            try:
                rgb = np.stack([r.rgb for r in batch])
                ir = np.stack([r.ir for r in batch])
                dets, _ = engine._dispatch(rgb, ir, batch=bucket)
                hw = [r.hw for r in batch]
                outs = engine._finalize(
                    dets, n, hw if any(h is not None for h in hw) else None)
                for req, out in zip(batch, outs):
                    req.result = out
                    req.event.set()
                with self._lock:
                    self._stats["requests"] += n
                    self._stats["batches"] += 1
                    bc = self._stats["bucket_counts"]
                    bc[bucket] = bc.get(bucket, 0) + 1
            except Exception as e:  # noqa: BLE001 — deliver to all waiters
                for req in batch:
                    req.error = e
                    req.event.set()

    def warmup(self):
        """Compile every bucket up front (one trace each) so no live request
        pays a first-shape XLA compile."""
        (H, W) = self.engine.canvas
        for b in self.buckets:
            z = np.zeros((b, H, W, 3), np.uint8)
            dets, _ = self.engine._dispatch(z, z, batch=b)
            self.engine._finalize(dets, b)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
