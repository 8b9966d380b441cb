"""HTTP-serving soak: the real http_server under concurrent load, on-chip.

Launches `icafusion_tpu.serve.http_server` (trained checkpoint, int8+merge —
the production serving default) as a subprocess, drives N concurrent POST
/v1/detect requests with REAL JPEG pairs, and records what the reference's
Flask demo (utils/flask_rest_api/restapi.py:16-37) never measures:

  - per-request wall latency percentiles (p50/p90/p99) at each concurrency
  - end-to-end throughput (pairs/s) vs the offered concurrency
  - the micro-batcher's coalescing histogram from GET /v1/stats
  - cold-start timing split (engine build / int8 quantize / bucket compile),
    parsed from the server log — including the persisted-calibration path

Writes <out>/report.md + <out>/soak.json (committed as docs/r05_http_soak).

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/http_soak.py \
        --weights artifacts/trained_s640/stripped.ckpt --cfg zoo:tfb:s \
        --data artifacts/trained_s640/extval --imgsz 512x640 \
        --out docs/r05_http_soak
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import signal
import subprocess
import sys
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def post(port, body):
    req = urllib.request.Request(f"http://127.0.0.1:{port}/v1/detect",
                                 data=json.dumps(body).encode(),
                                 headers={"Content-Type": "application/json"})
    t0 = time.time()
    with urllib.request.urlopen(req, timeout=120) as r:
        dets = json.loads(r.read())
    return time.time() - t0, dets


def pct(xs, p):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(round(p / 100 * (len(xs) - 1))))]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="artifacts/trained_s640/stripped.ckpt")
    ap.add_argument("--cfg", default="zoo:tfb:s")
    ap.add_argument("--data", default="artifacts/trained_s640/extval")
    ap.add_argument("--imgsz", default="512x640")
    ap.add_argument("--port", type=int, default=5093)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--requests", type=int, default=96)
    ap.add_argument("--concurrency", default="1,8,32")
    ap.add_argument("--out", default="docs/r05_http_soak")
    ap.add_argument("--bf16", action="store_true", help="skip int8")
    args = ap.parse_args()

    data = Path(args.data)
    rgb_files = sorted((data / "visible" / "val").glob("*.jpg"))
    ir_files = sorted((data / "infrared" / "val").glob("*.jpg"))
    assert rgb_files and len(rgb_files) == len(ir_files), data
    bodies = []
    for rp, ip in list(zip(rgb_files, ir_files))[:32]:
        bodies.append({"rgb": base64.b64encode(rp.read_bytes()).decode(),
                       "ir": base64.b64encode(ip.read_bytes()).decode()})

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    log_path = out / "server.log"
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{ROOT}:{env.get('PYTHONPATH', '')}"
    cmd = [sys.executable, "-m", "icafusion_tpu.serve.http_server",
           "--weights", args.weights, "--cfg", args.cfg,
           "--img-size", args.imgsz, "--port", str(args.port),
           "--batch-size", str(args.batch_size),
           "--calib-rgb", str(data / "visible" / "val"),
           "--calib-ir", str(data / "infrared" / "val")]
    if not args.bf16:
        cmd.append("--int8")
    t_start = time.time()
    logf = open(log_path, "w")
    srv = subprocess.Popen(cmd, stdout=logf, stderr=subprocess.STDOUT,
                           env=env, cwd=str(ROOT))
    try:
        # wait for readiness
        ready = None
        for _ in range(1200):
            time.sleep(1)
            txt = log_path.read_text() if log_path.exists() else ""
            if "serving on" in txt:
                ready = time.time() - t_start
                break
            assert srv.poll() is None, f"server died:\n{txt[-2000:]}"
        assert ready, "server never became ready"
        print(f"server ready in {ready:.0f}s (cold start incl. compiles)")

        results = {}
        for conc in [int(c) for c in args.concurrency.split(",")]:
            lat = []
            ndet = 0
            # warm this concurrency's bucket
            with ThreadPoolExecutor(conc) as pool:
                list(pool.map(lambda i: post(args.port, bodies[i % len(bodies)]),
                              range(min(conc * 2, args.requests))))
            t0 = time.time()
            with ThreadPoolExecutor(conc) as pool:
                for dt, dets in pool.map(
                        lambda i: post(args.port, bodies[i % len(bodies)]),
                        range(args.requests)):
                    lat.append(dt * 1e3)
                    ndet += len(dets)
            wall = time.time() - t0
            row = {"concurrency": conc, "requests": args.requests,
                   "throughput_pairs_s": args.requests / wall,
                   "p50_ms": pct(lat, 50), "p90_ms": pct(lat, 90),
                   "p99_ms": pct(lat, 99), "mean_ms": sum(lat) / len(lat),
                   "detections": ndet}
            results[conc] = row
            print(f"conc={conc:3d}: {row['throughput_pairs_s']:6.1f} pairs/s  "
                  f"p50 {row['p50_ms']:6.1f}  p90 {row['p90_ms']:6.1f}  "
                  f"p99 {row['p99_ms']:6.1f} ms  ({ndet} dets)")

        with urllib.request.urlopen(
                f"http://127.0.0.1:{args.port}/v1/stats", timeout=30) as r:
            stats = json.loads(r.read())
        print(f"/v1/stats: {stats}")
    finally:
        srv.send_signal(signal.SIGTERM)
        try:
            srv.wait(timeout=10)
        except subprocess.TimeoutExpired:
            srv.kill()
        logf.close()

    server_log = log_path.read_text()
    quant_line = next((l for l in server_log.splitlines()
                       if "engine quantized" in l), "")
    payload = {
        "config": {"weights": args.weights, "cfg": args.cfg,
                   "imgsz": args.imgsz, "batch_size": args.batch_size,
                   "int8": not args.bf16,
                   "backend": "axon TPU" if "axon" not in
                   os.environ.get("JAX_PLATFORMS", "axon") else "cpu"},
        "cold_start_s": ready, "quantize_line": quant_line.strip(),
        "load": list(results.values()), "batcher_stats": stats,
    }
    (out / "soak.json").write_text(json.dumps(payload, indent=2))

    lines = [
        "# HTTP serving soak (round 5)", "",
        f"- server: `icafusion_tpu.serve.http_server` — `{args.cfg}` trained "
        f"checkpoint `{args.weights}`, canvas {args.imgsz}, "
        f"{'int8 W8A8 + merge (production default)' if not args.bf16 else 'bf16'},"
        f" micro-batch buckets up to {args.batch_size}",
        f"- real JPEG pairs from `{args.data}` posted as base64 over "
        "`POST /v1/detect` (decode in request threads, coalescing in the "
        "micro-batcher, forward+NMS on device)",
        f"- cold start to ready: **{ready:.0f}s** "
        f"({quant_line.strip() or 'no quantize line'})", "",
        "| concurrency | pairs/s | p50 ms | p90 ms | p99 ms |",
        "|---|---|---|---|---|",
    ]
    for row in results.values():
        lines.append(f"| {row['concurrency']} | "
                     f"{row['throughput_pairs_s']:.1f} | {row['p50_ms']:.1f} |"
                     f" {row['p90_ms']:.1f} | {row['p99_ms']:.1f} |")
    lines += ["", f"coalescing stats (`GET /v1/stats`): `{json.dumps(stats)}`",
              ""]
    (out / "report.md").write_text("\n".join(lines))
    print(f"wrote {out}/report.md and {out}/soak.json")


if __name__ == "__main__":
    main()
