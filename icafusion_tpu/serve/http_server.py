"""HTTP detection service — counterpart of the reference's Flask REST demo
(utils/flask_rest_api/restapi.py:16-37), stdlib-only, two-stream, and —
beyond the reference's one-image-per-request forward — concurrently served
with dynamic micro-batching (serve/batcher.py): simultaneous requests
coalesce into one bucketed device batch, so a loaded server runs at large-
batch per-pair efficiency while an idle one keeps batch-1 latency.

POST /v1/detect with a JSON body {"rgb": <base64 jpeg>, "ir": <base64 jpeg>}
returns JSON detections [{"xmin","ymin","xmax","ymax","confidence","class"}]
(the same fields as the reference's Detections.pandas() records).
GET /v1/stats reports how requests coalesced (requests/batches/bucket_counts).

    python -m icafusion_tpu.serve.http_server --weights best.ckpt --cfg zoo:tfb:s
"""

from __future__ import annotations

import argparse
import base64
import json
import tempfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

ENGINE = None
BATCHER = None   # when set, requests decode in their own thread and coalesce
NAMES = None


def _decode_letterboxed(jpeg_bytes, canvas):
    """JPEG bytes -> (letterboxed uint8 HxWx3 RGB, native (h0, w0)). Runs in
    the request thread so decode parallelizes while the device batches."""
    import cv2
    import numpy as np

    from icafusion_tpu.data.augment import letterbox
    img = cv2.imdecode(np.frombuffer(jpeg_bytes, np.uint8), cv2.IMREAD_COLOR)
    if img is None:
        raise ValueError("undecodable image")
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    h0, w0 = img.shape[:2]
    return letterbox(img, canvas, auto=False, scaleup=True)[0], (h0, w0)


class Handler(BaseHTTPRequestHandler):
    def log_message(self, fmt, *args):
        pass

    def do_GET(self):
        if self.path != "/v1/stats" or BATCHER is None:
            self.send_response(404)
            self.end_headers()
            return
        payload = json.dumps(BATCHER.stats()).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def do_POST(self):
        if self.path != "/v1/detect":
            self.send_response(404)
            self.end_headers()
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(length))
            if BATCHER is not None:
                rgb_b = base64.b64decode(body["rgb"])
                ir_b = base64.b64decode(body.get("ir", body["rgb"]))
                rgb, hw0 = _decode_letterboxed(rgb_b, BATCHER.engine.canvas)
                ir, _ = _decode_letterboxed(ir_b, BATCHER.engine.canvas)
                dets = BATCHER.submit(rgb, ir, orig_hw=hw0)
            else:
                with tempfile.NamedTemporaryFile(suffix=".jpg") as f1, \
                        tempfile.NamedTemporaryFile(suffix=".jpg") as f2:
                    f1.write(base64.b64decode(body["rgb"]))
                    f2.write(base64.b64decode(body.get("ir", body["rgb"])))
                    f1.flush()
                    f2.flush()
                    dets = ENGINE.predict_paths([f1.name], [f2.name])[0]
            records = [
                {"xmin": float(x1), "ymin": float(y1), "xmax": float(x2),
                 "ymax": float(y2), "confidence": float(c),
                 "class": int(k),
                 "name": NAMES[int(k)] if NAMES and int(k) < len(NAMES) else str(int(k))}
                for x1, y1, x2, y2, c, k in dets]
            payload = json.dumps(records).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)
        except Exception as e:  # noqa: BLE001
            msg = json.dumps({"error": str(e)}).encode()
            self.send_response(400)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(msg)))
            self.end_headers()
            self.wfile.write(msg)


def main(argv=None):
    ap = argparse.ArgumentParser("icafusion-serve")
    ap.add_argument("--weights", required=True)
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--img-size", default="640", metavar="S|HxW",
                    help="square size or HxW rect canvas (512x640 = the "
                         "KAIST-native minimal-rectangle geometry, 1.20x the "
                         "square on-chip — BENCH.md round-4 rect table)")
    ap.add_argument("--port", type=int, default=5000)
    ap.add_argument("--batch-size", type=int, default=32,
                    help="largest micro-batch bucket (requests coalesce up "
                         "to this; measured per-pair cost on v5e drops ~3x "
                         "from batch 1 to batch 32 — BENCH.md)")
    ap.add_argument("--max-wait-ms", type=float, default=0.0,
                    help="hold the first request of a batch up to this long "
                         "for peers to coalesce (0 = greedy dispatch: no "
                         "added latency when idle; the queue self-batches "
                         "under load anyway)")
    ap.add_argument("--names", nargs="*", default=None)
    ap.add_argument("--int8", action="store_true",
                    help="serve W8A8-quantized (~1.2x throughput). Calibrate "
                         "on REAL representative images via --calib-rgb/"
                         "--calib-ir; without them calibration falls back to "
                         "random noise, which mis-scales per-channel "
                         "activation ranges and degrades accuracy — fine for "
                         "smoke tests only")
    ap.add_argument("--calib-rgb", default=None,
                    help="folder/glob of RGB images for int8 calibration")
    ap.add_argument("--calib-ir", default=None,
                    help="folder/glob of IR images for int8 calibration")
    ap.add_argument("--merge", default="auto", metavar="K",
                    help="stream-merge the first K RGB/IR layer pairs "
                         "(utils/stream_merge.py; identical outputs); 'auto' merges "
                         "exactly the lane-starved prefix")
    args = ap.parse_args(argv)
    hw = [int(v) for v in str(args.img_size).split("x")]
    args.img_size = hw[0] if len(hw) == 1 else tuple(hw)

    from icafusion_tpu.cli._common import load_model_for_inference, setup_jax
    from icafusion_tpu.serve.engine import ServingEngine

    setup_jax()
    global ENGINE, NAMES
    mc, model, variables = load_model_for_inference(args.cfg, args.weights)
    NAMES = args.names
    from icafusion_tpu.utils.stream_merge import resolve_merge
    ENGINE = ServingEngine(model=model, variables=variables,
                           img_size=args.img_size, batch_size=args.batch_size,
                           merge_streams=resolve_merge(args.merge, mc))
    if args.int8:
        import numpy as np
        S = args.img_size
        if args.calib_rgb and args.calib_ir:
            import cv2

            from icafusion_tpu.data.augment import letterbox
            from icafusion_tpu.data.datasets import discover_images
            rgbs = discover_images(args.calib_rgb)[:16]
            irs = discover_images(args.calib_ir)[:16]
            pairs = []
            for p1, p2 in zip(rgbs, irs):
                a = cv2.cvtColor(cv2.imread(p1), cv2.COLOR_BGR2RGB)
                b = cv2.cvtColor(cv2.imread(p2), cv2.COLOR_BGR2RGB)
                pairs.append((letterbox(a, S, scaleup=True)[0],
                              letterbox(b, S, scaleup=True)[0]))
            calib = [(np.stack([p[0] for p in pairs]),
                      np.stack([p[1] for p in pairs]))]
            print(f"int8: calibrating on {len(pairs)} real pairs")
        else:
            rng = np.random.default_rng(0)
            H, W = (S, S) if isinstance(S, int) else S
            calib = [(rng.integers(0, 255, (args.batch_size, H, W, 3),
                                   np.uint8),
                      rng.integers(0, 255, (args.batch_size, H, W, 3),
                                   np.uint8))]
            print("int8: WARNING — noise calibration (no --calib-rgb/ir); "
                  "per-channel activation scales will not match real "
                  "traffic, accuracy degrades. Smoke-test use only.")
        # load-and-serve: the calibration absmax tree persists next to the
        # checkpoint keyed by its sha1 (+ scheme/merge/canvas) — a warm
        # process start skips the calibration forward entirely
        # (utils/quantize.save_calibration; reference deploy contract,
        # experimental.py:113-134)
        import time as _time
        from pathlib import Path as _Path

        from icafusion_tpu.utils.quantize import calibration_key
        t0 = _time.time()
        if args.weights and _Path(args.weights).is_file():
            sha = calibration_key(args.weights)["ckpt_sha1"]
            hit = ENGINE.quantize(
                calib, cache=args.weights + ".calib",
                cache_key={"ckpt_sha1": sha,
                           "calib_set": args.calib_rgb or "noise"})
        else:
            hit = ENGINE.quantize(calib)
        print(f"int8: engine quantized in {_time.time() - t0:.1f}s "
              f"({'persisted calibration loaded' if hit else 'calibrated fresh'})")
    global BATCHER
    from icafusion_tpu.serve.batcher import MicroBatcher
    BATCHER = MicroBatcher(ENGINE, max_wait_ms=args.max_wait_ms)
    print(f"compiling buckets {BATCHER.buckets} ...")
    BATCHER.warmup()
    print(f"serving on :{args.port} (POST /v1/detect, GET /v1/stats; "
          f"micro-batching buckets {BATCHER.buckets})")

    class _Server(ThreadingHTTPServer):
        # stdlib default backlog is 5: a 32-way concurrent client burst
        # overflows it into kernel SYN-cookie resets (measured by the round-5
        # HTTP soak). Size it for real concurrent load.
        request_queue_size = 128
        daemon_threads = True

    _Server(("0.0.0.0", args.port), Handler).serve_forever()


if __name__ == "__main__":
    main()
