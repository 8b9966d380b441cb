"""Validation CLI — counterpart of reference test.py:370-419.

    python -m icafusion_tpu.cli.val --weights runs/train/exp/weights/best.ckpt \
        --cfg zoo:tfb:s --data FLIR.yaml [--task val] [--save-txt] [--kaist-ann ...]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from icafusion_tpu.cli._common import load_model_for_inference, setup_jax


def parse_args(argv=None):
    ap = argparse.ArgumentParser("icafusion-val")
    ap.add_argument("--weights", required=True)
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--conf-thres", type=float, default=0.001)
    ap.add_argument("--iou-thres", type=float, default=0.5)
    ap.add_argument("--task", default="val",
                    choices=["val", "test", "speed", "study"],
                    help="speed: conf 0.25/iou 0.45 throughput run "
                         "(test.py:421-423); study: sweep image sizes, write "
                         "study_*.txt + study.png (test.py:425-438)")
    ap.add_argument("--study-sizes", default="256:1664:128",
                    help="--task study size sweep as start:stop:step "
                         "(reference: 256..1536+128 step 128). Each size is a "
                         "fresh XLA compile — narrow the range to iterate")
    ap.add_argument("--rect", action="store_true",
                    help="rect pad-0.5 letterbox val (the reference's eval "
                         "protocol, test.py:100): per-image stride-aligned "
                         "canvases grouped by shape, one jit compile per "
                         "distinct canvas. Default is fixed-square letterbox")
    ap.add_argument("--save-txt", action="store_true",
                    help="write MR-format detection txts")
    ap.add_argument("--save-dir", default="runs/val/exp")
    ap.add_argument("--kaist-ann", default=None,
                    help="KAIST annotation json: also compute the miss-rate suite")
    ap.add_argument("--confusion", action="store_true")
    ap.add_argument("--single-cls", action="store_true",
                    help="treat as single-class (test.py:157-158)")
    ap.add_argument("--augment", action="store_true",
                    help="TTA multi-scale/flip ensemble (test.py:128)")
    ap.add_argument("--save-json", action="store_true",
                    help="dump COCO-format detections json (test.py:185-194)")
    ap.add_argument("--int8", action="store_true",
                    help="serve with W8A8 post-training quantization, "
                         "calibrated on the first val batches — reports the "
                         "quantized model's metrics (utils/quantize.py)")
    ap.add_argument("--merge", default="0", metavar="K",
                    help="stream-merge the first K RGB/IR layer pairs "
                         "(block-diagonal kernels, identical outputs) — MXU "
                         "lane recovery (utils/stream_merge.py); 'auto' merges "
                         "exactly the lane-starved prefix")
    ap.add_argument("--confluence", action="store_true",
                    help="replace NMS with confluence clustering — the "
                         "reference's optional swap-in (commented at "
                         "test.py:140; utils/confluence.py). Host-side and "
                         "quadratic in candidates per class: raise "
                         "--conf-thres (e.g. 0.1) with it")
    ap.add_argument("--confluence-p", type=float, default=0.6,
                    help="confluence proximity threshold (reference default)")
    ap.add_argument("--coco-gt", default=None,
                    help="COCO annotations json: run the full AP/AR suite on "
                         "the saved detections (test.py:329-352; implies "
                         "--save-json)")
    return ap.parse_args(argv)


def _quantize_from_dir(args, data_cfg, model, variables, rgb_dir, ir_dir):
    """W8A8-quantize using the first val batches at args.img_size as the
    calibration set (same normalization the Evaluator applies).

    When --weights is a real checkpoint file, the calibration absmax tree is
    persisted next to it (<weights>.calib, keyed by the checkpoint's sha1 +
    scheme version + merge + calib-set identity) and loaded on later runs —
    load-and-serve instead of a fresh calibration forward per process
    (reference deploy contract, experimental.py:113-134)."""
    import jax.numpy as jnp

    from icafusion_tpu.config import load_hyp_config
    from icafusion_tpu.data.datasets import PairedDetectionDataset
    from icafusion_tpu.data.loader import PairedLoader
    from icafusion_tpu.utils.quantize import (calibrate, calibrate_cached,
                                              calibration_key,
                                              detect_feeder_skip,
                                              quantize_variables)

    def calib_batches():
        ds = PairedDetectionDataset(rgb_dir, ir_dir, img_size=args.img_size,
                                    hyp=load_hyp_config(), augment=False,
                                    nc=data_cfg.nc)
        loader = PairedLoader(ds, batch_size=args.batch_size, shuffle=False)
        batches = []
        for batch in loader.val_batches():
            batches.append((jnp.asarray(batch["rgb"], jnp.float32) / 255.0,
                            jnp.asarray(batch["ir"], jnp.float32) / 255.0))
            if len(batches) >= 2:
                break
        print(f"int8: calibrated on {len(batches)} batches")
        return batches

    w = Path(args.weights) if args.weights else None
    if w is not None and w.is_file():
        key = calibration_key(str(w), merge=getattr(model, "merge_pairs", 0),
                              extra={"imgsz": args.img_size,
                                     "calib_set": str(rgb_dir),
                                     "batch": args.batch_size})
        calib, hit = calibrate_cached(model, variables, calib_batches,
                                      str(w) + ".calib", key)
        print("int8: loaded persisted calibration "
              f"({w}.calib)" if hit else
              f"int8: calibration persisted to {w}.calib")
    else:
        calib = calibrate(model, variables, calib_batches())
    skip = detect_feeder_skip(model.cfg)
    print(f"int8: Detect-feeder convs kept in fp ({', '.join(skip)}) — "
          "measured +0.4 pts mAP@50 vs quantizing them (ACCURACY.md)")
    return quantize_variables(variables, calib, skip=skip)


def run_study(args, data_cfg, model, variables, rgb_dir: str, ir_dir: str):
    """--task study: evaluate over a range of image sizes, write the
    reference-layout study_*.txt (10 cols: P R mAP50 mAP lbox lobj lcls
    t_inf t_nms t_total; test.py:425-438) and plot the speed/accuracy
    frontier. NMS runs fused on-device here, so t_nms=0 and t_inf==t_total."""
    from icafusion_tpu.config import load_hyp_config
    from icafusion_tpu.data.datasets import PairedDetectionDataset
    from icafusion_tpu.data.loader import PairedLoader
    from icafusion_tpu.eval.evaluator import Evaluator
    from icafusion_tpu.utils.plots import plot_study_txt

    import numpy as np

    start, stop, step = (int(v) for v in args.study_sizes.split(":"))
    sizes = list(range(start, stop, step))
    save_dir = Path(args.save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    ev = Evaluator(model=model, nc=data_cfg.nc, conf_thres=args.conf_thres,
                   iou_thres=args.iou_thres, single_cls=args.single_cls,
                   augment=args.augment, confluence=args.confluence,
                   confluence_p=args.confluence_p)
    rows = []
    for s in sizes:
        print(f"study point: imgsz={s} ...")
        ds = PairedDetectionDataset(rgb_dir, ir_dir, img_size=s,
                                    hyp=load_hyp_config(), augment=False,
                                    nc=data_cfg.nc)
        loader = PairedLoader(ds, batch_size=args.batch_size, shuffle=False)
        out = ev.run(variables, loader.val_batches(), s)
        t = out["t_total_ms"]
        rows.append([out["mp"], out["mr"], out["map50"], out["map"],
                     0.0, 0.0, 0.0, t, 0.0, t])
        print(f"  mAP50={out['map50']:.4f} mAP={out['map']:.4f} "
              f"{t:.2f} ms/img")
    stem = f"study_{Path(args.data).stem}_{Path(args.weights).stem}"
    txt = save_dir / f"{stem}.txt"
    np.savetxt(txt, np.array(rows), fmt="%10.4g")
    png = plot_study_txt(save_dir)
    print(f"wrote {txt} and {png}")
    return rows


def main(argv=None):
    args = parse_args(argv)
    setup_jax()
    from icafusion_tpu.config import load_data_config, load_hyp_config
    from icafusion_tpu.data.datasets import PairedDetectionDataset
    from icafusion_tpu.data.loader import PairedLoader
    from icafusion_tpu.eval.evaluator import Evaluator

    data_cfg = load_data_config(args.data)
    mc, model, variables = load_model_for_inference(args.cfg, args.weights,
                                                     merge=args.merge,
                                                    nc=data_cfg.nc)
    root = Path(data_cfg.path)
    rgb = data_cfg.test_rgb if args.task == "test" else data_cfg.val_rgb
    ir = data_cfg.test_ir if args.task == "test" else data_cfg.val_ir
    if args.task == "speed":
        # throughput benchmark settings (test.py:421-423)
        args.conf_thres, args.iou_thres = 0.25, 0.45
        args.save_json = args.confusion = args.save_txt = False
        args.coco_gt = args.kaist_ann = None
    if args.task == "study":
        if args.int8:
            variables = _quantize_from_dir(args, data_cfg, model, variables,
                                           str(root / rgb), str(root / ir))
        return run_study(args, data_cfg, model, variables, str(root / rgb),
                         str(root / ir))
    ds = PairedDetectionDataset(str(root / rgb), str(root / ir),
                                img_size=args.img_size,
                                hyp=load_hyp_config(), augment=False,
                                nc=data_cfg.nc)
    loader = PairedLoader(ds, batch_size=args.batch_size, shuffle=False)

    if args.int8:
        variables = _quantize_from_dir(args, data_cfg, model, variables,
                                       str(root / rgb), str(root / ir))

    ev = Evaluator(model=model, nc=data_cfg.nc, conf_thres=args.conf_thres,
                   iou_thres=args.iou_thres, single_cls=args.single_cls,
                   augment=args.augment, confluence=args.confluence,
                   confluence_p=args.confluence_p)
    save_dir = Path(args.save_dir)
    mr_dir = str(save_dir / "labels") if (args.save_txt or args.kaist_ann) else None
    save_json = args.save_json or args.coco_gt is not None
    batches = loader.rect_val_batches() if args.rect else loader.val_batches()
    out = ev.run(variables, batches, args.img_size,
                 confusion=args.confusion, mr_txt_dir=mr_dir,
                 names=list(data_cfg.names),
                 coco_json=str(save_dir / "detections.json") if save_json else None)

    if args.task == "speed":
        print(f"speed: {out['t_total_ms']:.2f} ms/img end-to-end "
              f"(fwd+decode+NMS+D2H, batch {args.batch_size}, "
              f"first/compile batch excluded)")
    print(f"{'Class':>12} {'Images':>8} {'P':>8} {'R':>8} {'mAP50':>8} "
          f"{'mAP75':>8} {'mAP':>8}")
    print(f"{'all':>12} {out['seen']:>8} {out['mp']:8.4f} {out['mr']:8.4f} "
          f"{out['map50']:8.4f} {out['map75']:8.4f} {out['map']:8.4f}")
    for c, d in out.get("per_class", {}).items():
        name = data_cfg.names[c] if c < len(data_cfg.names) else str(c)
        print(f"{name:>12} {out['seen']:>8} {d['p']:8.4f} {d['r']:8.4f} "
              f"{d['ap50']:8.4f} {'':8} {d['ap']:8.4f}")

    if args.coco_gt:
        from icafusion_tpu.eval.cocoeval import evaluate_files
        print("\nEvaluating COCO AP/AR suite...")
        stats, _ = evaluate_files(args.coco_gt,
                                  str(save_dir / "detections.json"))
        out["coco_map"], out["coco_map50"] = float(stats[0]), float(stats[1])

    if args.kaist_ann:
        from icafusion_tpu.eval.kaist import evaluate_kaist
        mr = evaluate_kaist(args.kaist_ann, str(save_dir / "labels" / "result.txt"))
        print("KAIST MR suite:", json.dumps(
            {k: round(v * 100, 2) for k, v in mr.as_dict().items()}))

    save_dir.mkdir(parents=True, exist_ok=True)
    summary = {k: v for k, v in out.items() if k not in ("cm", "per_class")}
    summary["nt"] = out["nt"].tolist() if hasattr(out.get("nt"), "tolist") else out.get("nt")
    (save_dir / "metrics.json").write_text(json.dumps(summary, indent=2))
    return out


if __name__ == "__main__":
    main()
