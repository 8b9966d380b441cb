"""Paired-folder streaming inference CLI — counterpart of reference
detect_twostream.py:19-236: zip two image folders, letterbox both modalities,
run the two-stream model + NMS fully on device, draw/save/report FPS.

    python -m icafusion_tpu.cli.detect --weights best.ckpt --cfg zoo:tfb:s \
        --source1 visible/test --source2 infrared/test --save-dir runs/detect
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np

from icafusion_tpu.cli._common import load_model_for_inference, setup_jax

from icafusion_tpu.utils.plots import COLORS, plot_one_box, save_one_box


def _label(names, cls, conf, args) -> str:
    """Caption per the reference's hide-labels/hide-conf flags
    (detect_twostream.py:151-153)."""
    if args.hide_labels:
        return ""
    s = names[int(cls)]
    return s if args.hide_conf else f"{s} {conf:.2f}"


def parse_args(argv=None):
    ap = argparse.ArgumentParser("icafusion-detect")
    ap.add_argument("--weights", required=True)
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--source1", required=True, help="RGB folder/glob")
    ap.add_argument("--source2", required=True, help="IR folder/glob")
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--rect", action="store_true",
                    help="minimal-rectangle letterbox (the reference "
                         "detect_twostream default, datasets.py:1424): canvas "
                         "= scaled size rounded up to a stride multiple, "
                         "batched by canvas shape (one compile per shape)")
    ap.add_argument("--conf-thres", type=float, default=0.25)
    ap.add_argument("--iou-thres", type=float, default=0.45)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--save-dir", default="runs/detect/exp")
    ap.add_argument("--save-txt", action="store_true",
                    help="save per-image labels (normalized cls xc yc w h)")
    ap.add_argument("--save-conf", action="store_true",
                    help="append confidence to --save-txt lines")
    ap.add_argument("--save-crop", action="store_true",
                    help="save detection crops under save-dir/crops/<class>/")
    ap.add_argument("--classes", nargs="+", type=int, default=None,
                    help="keep only these class ids in NMS")
    ap.add_argument("--agnostic-nms", action="store_true",
                    help="class-agnostic NMS")
    ap.add_argument("--line-thickness", type=int, default=None,
                    help="box line thickness px (default: auto from size)")
    ap.add_argument("--hide-labels", action="store_true")
    ap.add_argument("--merge", default="0", metavar="K",
                    help="stream-merge the first K RGB/IR layer pairs "
                         "(block-diagonal kernels, identical outputs) — MXU "
                         "lane recovery (utils/stream_merge.py); 'auto' merges "
                         "exactly the lane-starved prefix")
    ap.add_argument("--hide-conf", action="store_true")
    ap.add_argument("--names", nargs="*", default=None)
    ap.add_argument("--nosave", action="store_true")
    ap.add_argument("--augment", action="store_true",
                    help="TTA multi-scale/flip ensemble")
    ap.add_argument("--max-frames", type=int, default=0,
                    help="stream mode: stop after N frames (0 = run forever)")
    ap.add_argument("--stream-fps", type=float, default=0.0,
                    help="stream mode: pace file-replay 'streams' at this "
                         "rate (real cameras pace themselves; 0 = no pacing)")
    return ap.parse_args(argv)


VIDEO_FORMATS = (".mp4", ".avi", ".mov", ".mkv", ".m4v", ".webm")


def _make_infer(model, args):
    """One jitted two-stream inference closure shared by the image / video /
    stream branches (uint8 in, fused decode+NMS on device; TTA optional)."""
    import jax
    import jax.numpy as jnp

    from icafusion_tpu.ops.nms import non_max_suppression

    @jax.jit
    def infer(v, rgb, ir):
        rgb = rgb.astype(jnp.float32) / 255.0
        ir = ir.astype(jnp.float32) / 255.0
        if args.augment:
            from icafusion_tpu.models.tta import tta_inference
            pred = tta_inference(model, v, rgb, ir)
        else:
            pred, _, _ = model.apply(v, rgb, ir, train=False, decode=True)
        return non_max_suppression(
            pred, conf_thres=args.conf_thres, iou_thres=args.iou_thres,
            top_k=1024, agnostic=getattr(args, "agnostic_nms", False),
            classes=(tuple(args.classes)
                     if getattr(args, "classes", None) else None))

    return infer


def _annotate_bgr(im0_rgb, pred, names, args):
    """RGB frame + detections -> BGR frame with drawn boxes (for cv2 IO)."""
    frame = im0_rgb[:, :, ::-1].copy()
    for x1, y1, x2, y2, conf, cls in pred:
        plot_one_box(frame, (x1, y1, x2, y2), _label(names, cls, conf, args),
                     COLORS[int(cls) % len(COLORS)],
                     line_thickness=args.line_thickness)
    return frame


def detect_videos(args, model, variables, names):
    """Paired-video inference (reference detect_twostream video branch via
    LoadImages, datasets.py:212-239): per-frame two-stream inference, annotated
    output video, FPS report."""
    import cv2
    import jax.numpy as jnp
    import time as _time

    from icafusion_tpu.data.streams import LoadPairedVideos
    from icafusion_tpu.eval.evaluator import scale_coords_np
    from icafusion_tpu.ops.nms import detections_to_numpy

    S = args.img_size
    save_dir = Path(args.save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    infer = _make_infer(model, args)

    src = LoadPairedVideos(args.source1, args.source2, img_size=S)
    writer = None
    n, t_total = 0, 0.0
    for rgb_l, ir_l, im0, _ in src:
        t0 = _time.time()
        dets = infer(variables, jnp.asarray(rgb_l[None]), jnp.asarray(ir_l[None]))
        pred = detections_to_numpy(dets)[0]
        dt = _time.time() - t0
        if n > 0:
            t_total += dt
        h0, w0 = im0.shape[:2]
        if len(pred):
            pred[:, :4] = scale_coords_np((S, S), pred[:, :4], (h0, w0))
        frame = _annotate_bgr(im0, pred, names, args)
        if writer is None and not args.nosave:
            out_path = str(save_dir / (Path(args.source1).stem + "_det.mp4"))
            writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                                     25, (w0, h0))
        if writer is not None:
            writer.write(frame)
        n += 1
    src.release()
    if writer is not None:
        writer.release()
        print(f"video saved to {save_dir}")
    if n > 1:
        print(f"average: {(n - 1) / t_total:.1f} paired FPS")


def _is_stream(src: str) -> bool:
    """Webcam index or network stream URL (reference detect_twostream.py:51-54
    routes these to LoadStreams; here BOTH modalities are wired, not just
    stream 1)."""
    s = str(src)
    return s.isnumeric() or s.lower().startswith(("rtsp://", "rtmp://",
                                                  "http://", "https://"))


def detect_streams(args, model, variables, names, stale_timeout: float = 30.0):
    """Live paired-stream inference (LoadStreams counterpart,
    datasets.py:310-388): threaded latest-frame readers per modality pair,
    annotated jpg of the most recent frame per stream, FPS report. Each frame
    is processed ONCE (sequence-number dedup); if no new frame arrives for
    stale_timeout seconds (EOF/disconnect) the loop ends instead of spinning
    on the stale frame."""
    import cv2
    import jax.numpy as jnp
    import time as _time

    from icafusion_tpu.data.streams import LoadPairedStreams
    from icafusion_tpu.eval.evaluator import scale_coords_np
    from icafusion_tpu.ops.nms import detections_to_numpy

    S = args.img_size
    save_dir = Path(args.save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    infer = _make_infer(model, args)

    src = LoadPairedStreams([args.source1], [args.source2], img_size=S,
                            fps=getattr(args, "stream_fps", 0.0))
    n, t_total, last_seq = 0, 0.0, 0
    t_last_new = _time.time()
    try:
        while args.max_frames <= 0 or n < args.max_frames:
            if src.seq[0] == last_seq:
                if _time.time() - t_last_new > stale_timeout:
                    print(f"stream stale for {stale_timeout:.0f}s "
                          "(EOF/disconnect) — stopping")
                    break
                _time.sleep(0.005)
                continue
            t_last_new = _time.time()
            frames = src.read()
            # snapshot seq AFTER read(): if the reader thread published a new
            # frame between the staleness check and read(), we got the newer
            # frame — recording the pre-read seq would reprocess it next loop
            last_seq = src.seq[0]
            rgb_l, ir_l, im0, _ = frames[0]
            t0 = _time.time()
            dets = infer(variables, jnp.asarray(rgb_l[None]),
                         jnp.asarray(ir_l[None]))
            pred = detections_to_numpy(dets)[0]
            if n > 0:
                t_total += _time.time() - t0
            h0, w0 = im0.shape[:2]
            if len(pred):
                pred[:, :4] = scale_coords_np((S, S), pred[:, :4], (h0, w0))
            if not args.nosave:
                cv2.imwrite(str(save_dir / "stream0_last.jpg"),
                            _annotate_bgr(im0, pred, names, args))
            n += 1
    finally:
        src.close()
    if n > 1:
        print(f"stream: {n} frames, average {(n - 1) / t_total:.1f} paired FPS")
    return n


def _emit_image(args, save_dir, names, stem, origs, pred, shape_info, canvas):
    """Per-image outputs shared by the square and rect folder paths: scale
    boxes to native coords, write --save-txt labels (reference format,
    detect_twostream.py:145-148), --save-crop crops, annotated jpgs."""
    import cv2

    from icafusion_tpu.eval.evaluator import scale_coords_np

    im0, im1 = origs
    (h0, w0), ratio_pad = shape_info
    if len(pred):
        pred[:, :4] = scale_coords_np(canvas, pred[:, :4], (h0, w0),
                                      ratio_pad=ratio_pad)
    if args.save_txt and len(pred):
        lines = []
        for x1, y1, x2, y2, s, c in pred:
            xc, yc = (x1 + x2) / 2 / w0, (y1 + y2) / 2 / h0
            bw, bh = (x2 - x1) / w0, (y2 - y1) / h0
            row = f"{int(c)} {xc:g} {yc:g} {bw:g} {bh:g}"
            lines.append(row + (f" {s:g}" if args.save_conf else ""))
        (save_dir / f"{stem}.txt").write_text("\n".join(lines) + "\n")
    if args.save_crop:
        for x1, y1, x2, y2, conf, cls in pred:
            save_one_box((x1, y1, x2, y2), im0,
                         save_dir / "crops" / names[int(cls)] / f"{stem}.jpg")
    if not args.nosave:
        for x1, y1, x2, y2, conf, cls in pred:
            label = _label(names, cls, conf, args)
            color = COLORS[int(cls) % len(COLORS)]
            plot_one_box(im0, (x1, y1, x2, y2), label, color,
                         line_thickness=args.line_thickness)
            plot_one_box(im1, (x1, y1, x2, y2), label, color,
                         line_thickness=args.line_thickness)
        cv2.imwrite(str(save_dir / f"{stem}_rgb.jpg"), im0)
        cv2.imwrite(str(save_dir / f"{stem}_ir.jpg"), im1)
    print(f"{stem}: {len(pred)} detections")


def detect_folder_rect(args, model, variables, names, files1, files2):
    """Minimal-rectangle folder inference (the reference detect_twostream
    default: letterbox auto=True, datasets.py:1424). Each pair letterboxes to
    its scaled size rounded up to a stride-32 multiple; pairs are batched by
    canvas shape (lazy buckets flushed when full), so a folder of same-size
    sources costs ONE compile on a smaller canvas than the --img-size square
    (512x640 KAIST sources at 640: 20% fewer pixels than 640x640)."""
    import cv2
    import jax.numpy as jnp

    from icafusion_tpu.data.augment import letterbox
    from icafusion_tpu.ops.nms import detections_to_numpy

    S, B = args.img_size, args.batch_size
    save_dir = Path(args.save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    infer = _make_infer(model, args)

    buckets = {}  # canvas (h, w) -> list of (stem, im0, im1, rgb_l, ir_l, shape_info)
    n_done, t_total = 0, 0.0

    def flush(canvas, items):
        nonlocal n_done, t_total
        hh, ww = canvas
        count = len(items)
        while len(items) < B:
            items.append(items[-1])
        rgb_b = np.stack([it[3] for it in items])
        ir_b = np.stack([it[4] for it in items])
        t0 = time.time()
        dets = infer(variables, jnp.asarray(rgb_b), jnp.asarray(ir_b))
        det_list = detections_to_numpy(dets)
        dt = time.time() - t0
        if canvas in compiled:  # first batch per shape pays the compile
            t_total += dt
            n_done += count
        compiled.add(canvas)
        for slot in range(count):
            stem, im0, im1, _, _, shape_info = items[slot]
            _emit_image(args, save_dir, names, stem, (im0, im1),
                        det_list[slot], shape_info, canvas)

    compiled = set()
    for f1, f2 in zip(files1, files2):
        im0 = cv2.imread(f1)
        im1 = cv2.imread(f2)
        rgb_l, ratio, pad = letterbox(cv2.cvtColor(im0, cv2.COLOR_BGR2RGB), S,
                                      scaleup=False, auto=True)
        ir_l, _, _ = letterbox(cv2.cvtColor(im1, cv2.COLOR_BGR2RGB), S,
                               scaleup=False, auto=True)
        canvas = rgb_l.shape[:2]
        buckets.setdefault(canvas, []).append(
            (Path(f1).stem, im0, im1, rgb_l, ir_l,
             (im0.shape[:2], (ratio, pad))))
        if len(buckets[canvas]) == B:
            flush(canvas, buckets.pop(canvas))
    for canvas, items in buckets.items():
        flush(canvas, items)
    if n_done:
        print(f"average: {n_done / t_total:.1f} paired FPS "
              f"({t_total / n_done * 1e3:.1f} ms/pair incl. host IO, "
              f"{len(compiled)} canvas shape(s))")
    print(f"results saved to {save_dir}")


def main(argv=None):
    args = parse_args(argv)
    setup_jax()
    import cv2
    import jax
    import jax.numpy as jnp

    from icafusion_tpu.data.augment import letterbox
    from icafusion_tpu.data.datasets import discover_images
    from icafusion_tpu.eval.evaluator import scale_coords_np
    from icafusion_tpu.ops.nms import detections_to_numpy, non_max_suppression

    mc, model, variables = load_model_for_inference(args.cfg, args.weights,
                                                    merge=args.merge)

    if _is_stream(args.source1):
        names = args.names or [str(i) for i in range(mc.nc)]
        return detect_streams(args, model, variables, names)
    if str(args.source1).lower().endswith(VIDEO_FORMATS):
        names = args.names or [str(i) for i in range(mc.nc)]
        return detect_videos(args, model, variables, names)
    names = args.names or [str(i) for i in range(mc.nc)]
    files1 = discover_images(args.source1)
    files2 = discover_images(args.source2)
    assert len(files1) == len(files2), "paired sources must have equal counts"
    if args.rect:
        return detect_folder_rect(args, model, variables, names, files1, files2)
    save_dir = Path(args.save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    S, B = args.img_size, args.batch_size

    infer = _make_infer(model, args)

    n_done, t_total = 0, 0.0
    for start in range(0, len(files1), B):
        idx = list(range(start, min(start + B, len(files1))))
        count = len(idx)
        while len(idx) < B:
            idx.append(idx[-1])
        rgb_b = np.zeros((B, S, S, 3), np.uint8)
        ir_b = np.zeros((B, S, S, 3), np.uint8)
        origs, shapes = [], []
        for slot, i in enumerate(idx):
            im0 = cv2.imread(files1[i])
            im1 = cv2.imread(files2[i])
            origs.append((im0, im1))
            rgb_l, ratio, pad = letterbox(cv2.cvtColor(im0, cv2.COLOR_BGR2RGB), S,
                                          scaleup=False)
            ir_l, _, _ = letterbox(cv2.cvtColor(im1, cv2.COLOR_BGR2RGB), S,
                                   scaleup=False)
            rgb_b[slot], ir_b[slot] = rgb_l, ir_l
            # keep the actual letterbox ratio/pad: scaleup=False clamps r<=1,
            # which scale_coords_np can't re-derive for small source images
            shapes.append((im0.shape[:2], (ratio, pad)))
        t0 = time.time()
        dets = infer(variables, jnp.asarray(rgb_b), jnp.asarray(ir_b))
        det_list = detections_to_numpy(dets)
        dt = time.time() - t0
        if start > 0:  # skip compile batch in timing
            t_total += dt
            n_done += count
        for slot in range(count):
            _emit_image(args, save_dir, names, Path(files1[idx[slot]]).stem,
                        origs[slot], det_list[slot], shapes[slot], (S, S))
    if n_done:
        print(f"average: {n_done / t_total:.1f} paired FPS "
              f"({t_total / n_done * 1e3:.1f} ms/pair incl. host IO)")
    print(f"results saved to {save_dir}")


if __name__ == "__main__":
    main()
