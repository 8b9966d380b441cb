"""Batch-sharded paired-image serving engine — the north-star deployment path
(SURVEY §5.8: 'shard paired-image batches over ICI with on-device decode+NMS so
no host round-trip sits between pixels and detections').

Pipeline per request batch:
  native C++ JPEG decode + letterbox (uint8, threaded)   [host]
  -> uint8 H2D, batch dim sharded over the 'data' mesh    [ICI scatter]
  -> /255 normalize, two-stream forward (bf16), box decode, batched NMS [device]
  -> <=max_det detections per image back to host, rescaled to native space.

Works on a 1-chip mesh unchanged; on a pod the same jitted program spans all
chips (jax.sharding, XLA collectives).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from icafusion_tpu.eval.evaluator import scale_coords_np
from icafusion_tpu.ops.nms import detections_to_numpy, non_max_suppression
from icafusion_tpu.parallel.mesh import make_mesh


@dataclasses.dataclass
class ServingEngine:
    model: "ICAFusionModel"          # noqa: F821
    variables: dict
    img_size: Any = 640   # square int, or (H, W) rect canvas — the
    # minimal-rectangle serving geometry (KAIST-native 512x640 measured 1.20x
    # the 640 square, BENCH.md round-4 rect table)
    batch_size: int = 32
    conf_thres: float = 0.25
    iou_thres: float = 0.45
    max_det: int = 300
    n_devices: Optional[int] = None
    dtype: str = "bfloat16"
    merge_streams: Any = "auto"   # run the first k RGB/IR layer pairs as one
    # block-diagonal module each — MXU lane recovery on the sub-128-channel
    # stages (utils/stream_merge.py); numerically identical outputs.
    # int (0 disables), or "auto" (default) for exactly the lane-starved
    # prefix — measured +7-9% serving throughput on-chip (BENCH.md round 3).

    def __post_init__(self):
        self.canvas = ((self.img_size, self.img_size)
                       if isinstance(self.img_size, int)
                       else tuple(self.img_size))
        from icafusion_tpu.utils.stream_merge import resolve_merge
        self.merge_streams = resolve_merge(self.merge_streams, self.model.cfg)
        if self.merge_streams:
            from icafusion_tpu.models.assembler import build_model
            from icafusion_tpu.utils.stream_merge import merge_stream_variables
            self.variables = merge_stream_variables(
                self.model.cfg, jax.device_get(self.variables),
                pairs=self.merge_streams)
            self.model = build_model(self.model.cfg, dtype=self.model.dtype,
                                     merge_pairs=self.merge_streams)
        # default mesh: the largest device prefix the batch shards evenly
        # over — an explicit n_devices is honored (and must divide the batch),
        # but the default must not crash a batch_size=1 latency engine on a
        # multi-chip host just because devices exist
        n_dev = self.n_devices
        if n_dev is None:
            import math
            n_dev = math.gcd(self.batch_size, jax.device_count())
        self.mesh = make_mesh(n_dev)
        repl = NamedSharding(self.mesh, P())
        data = NamedSharding(self.mesh, P("data"))
        self._data_sharding = data
        self.variables = jax.device_put(self.variables, repl)
        model = self.model
        conf, iou, md = self.conf_thres, self.iou_thres, self.max_det

        def _serve(v, rgb, ir):
            rgb = rgb.astype(jnp.float32) / 255.0
            ir = ir.astype(jnp.float32) / 255.0
            pred, _, _ = model.apply(v, rgb, ir, train=False, decode=True)
            return non_max_suppression(pred, conf_thres=conf, iou_thres=iou,
                                       max_det=md, top_k=1024)

        self._serve = jax.jit(_serve, in_shardings=(repl, data, data),
                              out_shardings=data)

    def warmup(self):
        (H, W), B = self.canvas, self.batch_size
        z = np.zeros((B, H, W, 3), np.uint8)
        jax.block_until_ready(self._serve(self.variables, z, z))

    def quantize(self, calib_pairs: Sequence = (),
                 cache: Optional[str] = None,
                 cache_key: Optional[dict] = None) -> bool:
        """Switch to int8 W8A8 serving (utils/quantize.py; ~1.2x throughput on
        v5e — BENCH.md). calib_pairs: (rgb, ir) uint8/float letterboxed batches
        representative of production traffic.

        cache: path of a versioned calibration artifact (see
        utils/quantize.save_calibration). When it exists and matches
        cache_key (+ this engine's merge/scheme identity), the 206-second
        calibration forward is skipped entirely — the reference's
        load-and-serve deploy contract (experimental.py:113-134). On miss the
        engine calibrates from calib_pairs and writes the artifact. Returns
        True when the cache was hit."""
        from icafusion_tpu.utils.quantize import (calibrate, calibrate_cached,
                                                  calibration_key,
                                                  detect_feeder_skip,
                                                  quantize_variables)

        def batches():
            return [(jnp.asarray(r, jnp.float32) / 255.0,
                     jnp.asarray(i, jnp.float32) / 255.0)
                    for r, i in calib_pairs]

        hit = False
        if cache:
            key = calibration_key(merge=self.merge_streams,
                                  extra={"canvas": list(self.canvas),
                                         **(cache_key or {})})
            calib, hit = calibrate_cached(self.model, self.variables,
                                          batches, cache, key)
        else:
            calib = calibrate(self.model, self.variables, batches())
        qvars = quantize_variables(
            jax.device_get(self.variables), calib,
            skip=detect_feeder_skip(self.model.cfg))
        repl = NamedSharding(self.mesh, P())
        self.variables = jax.device_put(qvars, repl)
        return hit

    def _dispatch(self, rgb: np.ndarray, ir: np.ndarray, batch: int = None):
        """Pad to the engine batch (or an explicit smaller `batch` bucket —
        jit compiles one executable per static batch shape, reused thereafter;
        see serve/batcher.py), upload, and dispatch the serve step — returns
        (device detections, n) WITHOUT blocking (jax dispatch is async; the
        device computes while the host moves on)."""
        n = rgb.shape[0]
        B, (H, W) = (batch or self.batch_size), self.canvas
        if n < B:
            pad = np.zeros((B - n, H, W, 3), np.uint8)
            rgb = np.concatenate([rgb, pad])
            ir = np.concatenate([ir, pad])
        dets = self._serve(self.variables,
                           jax.device_put(rgb, self._data_sharding),
                           jax.device_put(ir, self._data_sharding))
        return dets, n

    def _finalize(self, dets, n, orig_hw=None) -> List[np.ndarray]:
        """Fetch a dispatched batch's detections and rescale to native space
        (this is the blocking half of _dispatch)."""
        (H, W) = self.canvas
        out = detections_to_numpy(jax.device_get(dets))[:n]
        if orig_hw is not None:
            for i, hw0 in enumerate(orig_hw[:n]):
                if hw0 is not None and len(out[i]):
                    out[i][:, :4] = scale_coords_np((H, W), out[i][:, :4],
                                                    tuple(hw0))
        return out

    def predict_arrays(self, rgb: np.ndarray, ir: np.ndarray,
                       orig_hw: Optional[Sequence] = None) -> List[np.ndarray]:
        """rgb/ir: (n, H, W, 3) uint8 letterboxed pairs (n <= batch_size) on
        this engine's canvas. Returns per-image (k, 6) [x1,y1,x2,y2,conf,cls]
        in letterboxed (or native, if orig_hw given) coordinates."""
        dets, n = self._dispatch(rgb, ir)
        return self._finalize(dets, n, orig_hw)

    def predict_paths(self, rgb_paths: List[str], ir_paths: List[str],
                      n_threads: int = None,
                      pipeline: bool = True) -> List[np.ndarray]:
        """Native-decode + serve; detections in native image coordinates.
        n_threads=None lets the native loader pick min(8, cpu_count) —
        oversubscribing a small host thrashes (BENCH.md).

        pipeline=True (default) overlaps the three stages across batches:
        batch i+1's JPEG decode+letterbox runs in a worker thread and batch
        i's detections stay on-device while batch i+1 is uploaded and
        dispatched — so host decode, H2D, device compute and D2H all proceed
        concurrently instead of in sequence. Measured on the trained s640
        checkpoint at 512x640 (tools/file_serving_probe.py): decode is
        ~28 ms/pair on this 1-CPU host — comparable to or above device
        compute — and the pipeline hides ALL of it (3.98 s of a 141-pair
        serial wall) behind the H2D stream. Results are identical and
        ordered either way (tests/test_multidevice_serve_eval)."""
        from icafusion_tpu.data import native
        B = self.batch_size
        chunks = [(rgb_paths[s:s + B], ir_paths[s:s + B])
                  for s in range(0, len(rgb_paths), B)]

        def decode(chunk):
            rgb, ir, _, _, hw = native.decode_letterbox_batch(
                chunk[0], chunk[1], self.canvas, scaleup=True,
                n_threads=n_threads)
            return rgb, ir, hw

        outs: List[np.ndarray] = []
        if not pipeline:
            for chunk in chunks:
                rgb, ir, hw = decode(chunk)
                outs.extend(self.predict_arrays(rgb, ir, orig_hw=hw.tolist()))
            return outs

        from concurrent.futures import ThreadPoolExecutor
        pending = None                     # (device dets, n, hw) in flight
        with ThreadPoolExecutor(1) as ex:
            fut = ex.submit(decode, chunks[0]) if chunks else None
            for i in range(len(chunks)):
                rgb, ir, hw = fut.result()
                fut = (ex.submit(decode, chunks[i + 1])
                       if i + 1 < len(chunks) else None)
                dets, n = self._dispatch(rgb, ir)   # async — device busy now
                if pending is not None:
                    outs.extend(self._finalize(*pending))
                pending = (dets, n, hw.tolist())
            if pending is not None:
                outs.extend(self._finalize(*pending))
        return outs

    def throughput(self, iters: int = 20) -> float:
        """Steady-state paired frames/sec (chained-dependency timing)."""
        import time
        (H, W), B = self.canvas, self.batch_size
        rgb = np.random.default_rng(0).integers(0, 255, (B, H, W, 3), np.uint8)
        ir = np.random.default_rng(1).integers(0, 255, (B, H, W, 3), np.uint8)
        d = self._serve(self.variables, rgb, ir)
        float(d.scores.sum())
        t0 = time.time()
        carry = jnp.float32(0)
        rgbj = jax.device_put(rgb, self._data_sharding)
        irj = jax.device_put(ir, self._data_sharding)
        for _ in range(iters):
            d = self._serve(self.variables, rgbj + (0 * carry).astype(jnp.uint8), irj)
            carry = d.scores.sum()
        float(carry)
        return B * iters / (time.time() - t0)
