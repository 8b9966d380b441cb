"""Trained-detector cross-framework accuracy parity — the STRONG instrument.

Round 2's harness (tools/accuracy_parity.py) measured pipeline parity with a
BN-calibrated random-weight detector on the CPU backend. This tool replaces
that instrument with the strongest one available in this container:

1. a detector TRAINED to convergence in THIS framework on the TPU
   (yolov5n-Transfusion @320, mAP@50 0.974 — runs/convergence_n320, committed
   round 2; architecture == /root/reference/models/transformer/
   yolov5n_Transfusion_FLIR.yaml, verified layer-list-identical);
2. its checkpoint pushed through utils/torch_convert.reverse_convert into the
   actual reference torch stack (models/yolo_test.py Model, strict
   load_state_dict — the same bridge tools/export_torch.py ships);
3. BOTH frameworks' complete eval pipelines (max-side resize -> letterbox ->
   forward -> decode -> NMS -> scale to native coords) run over the SAME val
   set at the reference's eval settings (conf 0.001, NMS IoU 0.5, multi-label,
   max_det 300 — /root/reference/test.py:374-378);
4. both detection sets scored against the REAL ground-truth labels by the
   REFERENCE's own matcher + ap_per_class (test.py:196-227,
   utils/metrics.py:18) — Δ mAP@50 is in exactly the units of the
   FLIR-within-0.3 acceptance gate (/root/reference/README.md:56-59);
5. our side runs on the ACTIVE jax backend — on the TPU this exercises the
   production numerics end-to-end (bf16 convs, the Pallas greedy-NMS kernel)
   that the CPU-fp32 instrument never touched. Rows: fp32, bf16 (product
   serving dtype), int8 W8A8 PTQ. No saturated-image exclusions: a trained
   detector has real decision margins.

Also re-measured on this instrument (VERDICT r2 weak #1): merge-NMS agreement
(was 0.9570 on the random-weight instrument) and the int8 delta (was
meaningless by construction there).

Run (TPU):  PYTHONPATH=/root/repo:$PYTHONPATH python tools/trained_parity.py
Run (CPU):  ... trained_parity.py --cpu       # fp32 reference-numerics row
Used by tests/test_trained_parity.py at small scale.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(Path(__file__).resolve().parent))

# committed artifact (fp16 EMA strip of the runs/convergence_n320 run —
# artifacts/trained_n320/README.md); both frameworks consume the identical
# post-rounding values, so the cross-framework deltas are unaffected
CKPT_DEFAULT = str(ROOT / "artifacts/trained_n320/stripped.ckpt")
DATA_DEFAULT = str(ROOT / "artifacts/trained_n320/data")
CFG_DEFAULT = "/root/reference/models/transformer/yolov5n_Transfusion_FLIR.yaml"


def load_val_set(data_root: str, n: int = 0):
    """Val pairs + native-coords GT from the committed synthetic paired set.
    Returns (pairs [(rgb,ir) HWC uint8], gts [(m,5) cls,x1,y1,x2,y2])."""
    import cv2
    vis = sorted((Path(data_root) / "visible/val").glob("*.jpg"))
    if n:
        vis = vis[:n]
    pairs, gts = [], []
    for p in vis:
        rgb = cv2.imread(str(p))[:, :, ::-1].copy()
        ir = cv2.imread(str(p).replace("visible", "infrared"))[:, :, ::-1].copy()
        h0, w0 = rgb.shape[:2]
        lp = Path(str(p.parent).replace("visible", "labels")) / (p.stem + ".txt")
        rows = []
        for line in lp.read_text().splitlines():
            c, cx, cy, bw, bh = map(float, line.split())
            rows.append([c, (cx - bw / 2) * w0, (cy - bh / 2) * h0,
                         (cx + bw / 2) * w0, (cy + bh / 2) * h0])
        pairs.append((rgb, ir))
        gts.append(np.asarray(rows, np.float32) if rows
                   else np.zeros((0, 5), np.float32))
    return pairs, gts


def build_torch_side(ckpt: str, cfg_path: str):
    """Checkpoint -> reference torch Model via reverse_convert (strict)."""
    import torch

    from icafusion_tpu.utils.checkpoint import load_inference_variables
    from icafusion_tpu.utils.torch_convert import reverse_convert
    from ref_compat import build_reference_model

    variables = load_inference_variables(ckpt)
    ref = build_reference_model(cfg_path)
    like = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    sd = reverse_convert(variables, like=like)
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False)
    assert not missing and not unexpected, (missing[:3], unexpected[:3])
    ref.float().eval()
    return ref, variables


def run(ckpt: str = CKPT_DEFAULT, data_root: str = DATA_DEFAULT,
        cfg_path: str = CFG_DEFAULT, imgsz: int = 320, n: int = 0,
        batch: int = 8, top_k: int = 8192, dtypes=("fp32", "bf16", "int8"),
        merge_sweep: bool = True, stream_merge=0,
        int8_weight_clip: str = "absmax", int8_skip="detect",
        rect: bool = False, verbose: bool = True):
    import jax
    import jax.numpy as jnp

    from accuracy_parity import (box_agreement, filter_degenerate, jax_detect,
                                 preprocess, score_ours, score_reference,
                                 torch_detect, torch_detect_merge)
    from icafusion_tpu.config import load_model_config
    from icafusion_tpu.models import build_model

    def log(msg):
        if verbose:
            print(f"[trained-parity] {msg}", flush=True)

    pairs, gts = load_val_set(data_root, n)
    n_gt = int(sum(len(g) for g in gts))
    log(f"{len(pairs)} val pairs, {n_gt} GT boxes, imgsz {imgsz}, "
        f"backend {jax.default_backend()}")

    ref_model, variables = build_torch_side(ckpt, cfg_path)
    log("reverse_convert -> reference Model: strict load ok")

    results = {"ckpt": str(Path(ckpt).relative_to(ROOT)) if str(ckpt).startswith(str(ROOT)) else ckpt,
               "cfg": Path(cfg_path).name, "imgsz": imgsz,
               "n_images": len(pairs), "n_gt": n_gt,
               "backend": jax.default_backend(),
               "eval": {"conf_thres": 0.001, "iou_thres": 0.5,
                        "multi_label": True, "max_det": 300, "top_k": top_k}}

    torch_dets, t_ms = torch_detect(ref_model, pairs, imgsz)
    torch_dets = filter_degenerate(torch_dets)
    results["torch_ms_per_img"] = round(t_ms * 1e3, 1)
    ref_scored = score_reference(torch_dets, gts)
    results["torch"] = ref_scored
    log(f"torch (CPU fp32): mAP50={ref_scored['map50']:.5f} "
        f"mAP={ref_scored['map']:.5f}")

    cfg = load_model_config(cfg_path)
    nc = cfg.nc
    results["ours"] = {}
    fp_dets = None
    for tag in dtypes:
        if tag == "int8":
            from icafusion_tpu.utils.quantize import (calibrate,
                                                      quantize_variables)
            model = build_model(cfg, dtype=jnp.float32)
            calib = []
            for i in range(0, min(8, len(pairs)), 4):
                rgb_b = np.stack([preprocess(*pairs[j], imgsz)[0]
                                  for j in range(i, min(i + 4, len(pairs)))])
                ir_b = np.stack([preprocess(*pairs[j], imgsz)[1]
                                 for j in range(i, min(i + 4, len(pairs)))])
                calib.append((jnp.asarray(rgb_b, jnp.float32) / 255.0,
                              jnp.asarray(ir_b, jnp.float32) / 255.0))
            if int8_skip == "detect":
                # the product default (cli/val, ServingEngine, bench):
                # Detect-feeder convs stay fp — utils/quantize.py
                from icafusion_tpu.utils.quantize import detect_feeder_skip
                int8_skip = detect_feeder_skip(cfg)
            use_vars = quantize_variables(
                variables, calibrate(model, variables, calib),
                weight_clip=int8_weight_clip, skip=tuple(int8_skip))
        else:
            model = build_model(cfg, dtype=jnp.bfloat16 if tag == "bf16"
                                else jnp.float32)
            use_vars = variables
        dets = filter_degenerate(
            jax_detect(use_vars, model, pairs, imgsz, top_k=top_k, batch=batch))
        if tag == "fp32":
            fp_dets = dets
        scored = score_reference(dets, gts)
        entry = {"ref_scored": scored,
                 "ours_scored": score_ours(dets, gts, nc),
                 "map50_delta_vs_torch": scored["map50"] - ref_scored["map50"],
                 "agreement_vs_torch": box_agreement(torch_dets, dets),
                 "agreement_conf0.01_vs_torch": box_agreement(torch_dets, dets,
                                                              conf_cut=0.01)}
        if tag == "int8" and fp_dets is not None:
            entry["map50_delta_vs_fp_ours"] = (
                scored["map50"] - results["ours"]["fp32"]["ref_scored"]["map50"])
            entry["agreement_conf0.01_vs_fp_ours"] = box_agreement(
                fp_dets, dets, conf_cut=0.01)
        results["ours"][tag] = entry
        a = entry["agreement_conf0.01_vs_torch"]
        log(f"ours {tag}: mAP50={scored['map50']:.5f} "
            f"delta={entry['map50_delta_vs_torch'] * 100:+.3f} pts "
            f"match@0.01={a['match_rate']:.4f} meanIoU={a['mean_iou']:.4f}")

    if rect:
        # rect pad-0.5 val (the reference's eval protocol, test.py:100):
        # per-image stride-aligned canvases on BOTH frameworks; scored against
        # the same GT so the delta stays in acceptance-gate units
        torch_r, _ = torch_detect(ref_model, pairs, imgsz, rect=True)
        torch_r = filter_degenerate(torch_r)
        ref_r = score_reference(torch_r, gts)
        results["torch_rect"] = ref_r
        model = build_model(cfg, dtype=jnp.float32)
        dets_r = filter_degenerate(
            jax_detect(variables, model, pairs, imgsz, rect=True,
                       top_k=top_k, batch=batch))
        scored = score_reference(dets_r, gts)
        results["ours"]["fp32+rect"] = {
            "ref_scored": scored,
            "map50_delta_vs_torch": scored["map50"] - ref_r["map50"],
            "agreement_conf0.01_vs_torch": box_agreement(torch_r, dets_r,
                                                         conf_cut=0.01)}
        a = results["ours"]["fp32+rect"]["agreement_conf0.01_vs_torch"]
        log(f"ours fp32+rect: mAP50={scored['map50']:.5f} vs torch-rect "
            f"{ref_r['map50']:.5f} "
            f"delta={(scored['map50'] - ref_r['map50']) * 100:+.3f} pts "
            f"match@0.01={a['match_rate']:.4f}")

    if stream_merge:
        # stream-merged graph (utils/stream_merge.py): must reproduce the
        # unmerged fp32 eval exactly — certifies the lane-recovery transform
        # on real data through the full eval pipeline
        from icafusion_tpu.utils.stream_merge import (merge_stream_variables,
                                                      resolve_merge)
        mk = resolve_merge(stream_merge, cfg)
        if mk:
            model = build_model(cfg, dtype=jnp.float32, merge_pairs=mk)
            mv = jax.device_put(
                merge_stream_variables(cfg, dict(variables), pairs=mk))
            dets = filter_degenerate(
                jax_detect(mv, model, pairs, imgsz, top_k=top_k, batch=batch))
            scored = score_reference(dets, gts)
            entry = {"merge_pairs": mk, "ref_scored": scored,
                     "map50_delta_vs_torch": scored["map50"]
                     - ref_scored["map50"]}
            if fp_dets is not None:
                entry["map50_delta_vs_fp_ours"] = (
                    scored["map50"]
                    - results["ours"]["fp32"]["ref_scored"]["map50"])
                entry["agreement_conf0.01_vs_fp_ours"] = box_agreement(
                    fp_dets, dets, conf_cut=0.01)
                am = entry["agreement_conf0.01_vs_fp_ours"]
                log(f"ours fp32+merge{mk}: mAP50={scored['map50']:.5f} "
                    f"delta_vs_fp_ours="
                    f"{entry['map50_delta_vs_fp_ours'] * 100:+.4f} pts "
                    f"match@0.01={am['match_rate']:.4f}")
            results["ours"][f"fp32+merge{mk}"] = entry

    if merge_sweep:
        log("merge-NMS sweep on trained weights (conf 0.1)...")
        model = build_model(cfg, dtype=jnp.float32)
        ours_m = filter_degenerate(
            jax_detect(variables, model, pairs, imgsz, top_k=top_k,
                       batch=batch, merge=True, conf_thres=0.1))
        torch_m = filter_degenerate(
            torch_detect_merge(ref_model, pairs, imgsz, conf_thres=0.1))
        results["merge"] = {
            "torch": score_reference(torch_m, gts),
            "ours": score_reference(ours_m, gts),
            "agreement_conf0.01": box_agreement(torch_m, ours_m,
                                                conf_cut=0.01)}
        am = results["merge"]["agreement_conf0.01"]
        log(f"merge: torch mAP50={results['merge']['torch']['map50']:.5f} "
            f"ours mAP50={results['merge']['ours']['map50']:.5f} "
            f"match@0.01={am['match_rate']:.4f}")

    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=CKPT_DEFAULT)
    ap.add_argument("--data", default=DATA_DEFAULT)
    ap.add_argument("--cfg", default=CFG_DEFAULT)
    ap.add_argument("--imgsz", type=int, default=320)
    ap.add_argument("--n", type=int, default=0, help="limit val images (0=all)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtypes", default="fp32,bf16,int8")
    ap.add_argument("--int8-weight-clip", default="absmax",
                    choices=["absmax", "mse"])
    ap.add_argument("--stream-merge", default="auto",
                    help="also score the stream-merged fp32 graph "
                         "(int, 'auto', or 0 to skip)")
    ap.add_argument("--no-merge", action="store_true")
    ap.add_argument("--rect", action="store_true",
                    help="also score the rect pad-0.5 val protocol on both "
                         "frameworks (reference test.py:100)")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--write-json", default="TRAINED_PARITY.json")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    r = run(ckpt=args.ckpt, data_root=args.data, cfg_path=args.cfg,
            imgsz=args.imgsz, n=args.n, batch=args.batch,
            dtypes=tuple(args.dtypes.split(",")),
            merge_sweep=not args.no_merge, stream_merge=args.stream_merge,
            int8_weight_clip=args.int8_weight_clip, rect=args.rect)
    if args.write_json:
        Path(args.write_json).write_text(json.dumps(r, indent=2, default=float))
        print(f"wrote {args.write_json}")
    worst = max(abs(e["map50_delta_vs_torch"]) for e in r["ours"].values()
                if "map50_delta_vs_torch" in e)
    print(f"\nworst |delta mAP50| across dtypes = {worst * 100:.4f} pts (gate 0.3)")


if __name__ == "__main__":
    main()
