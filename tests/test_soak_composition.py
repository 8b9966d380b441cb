"""Composition soak at CPU-mesh scale: ONE pipeline chaining every training
and serving feature the way production composes them (reference
one-driver-does-all contract, train.py:42-490):

  fit(merge_streams x accum x multi-scale x reference-results-csv x kaist-MR)
  -> interrupted -> resume -> strip
  -> ServingEngine(merge_streams='auto') + int8 quantize on the stripped ckpt
  -> rect eval of the same ckpt through the int8+merge product path.

Composition is where state machines break (merge x accum x resume interacts
through opt-state masking and ckpt layout) — no single-feature test covers
these seams. The on-chip twin is tools/r4_soak.sh (docs/r04_soak)."""

import json
from pathlib import Path

import numpy as np
import pytest

from test_fit_driver import _make_disk_dataset


@pytest.mark.slow
def test_soak_composition(tmp_path):
    from icafusion_tpu.config import DataConfig, load_hyp_config
    from icafusion_tpu.models import build_model
    from icafusion_tpu.models.zoo import tiny_icafusion_config
    from icafusion_tpu.train.fit import FitConfig, fit
    from icafusion_tpu.utils.checkpoint import load_inference_variables

    # 192px sources so a good fraction of the 0.2-0.4-fraction boxes clear
    # the KAIST 'Reasonable' height floor (55px, eval/kaist.py HT_RNG)
    HW = 192
    _make_disk_dataset(tmp_path / "data", n=12, hw=HW)
    data_cfg = DataConfig(nc=2, names=("a", "b"), path=str(tmp_path / "data"),
                          train_rgb="visible/train", val_rgb="visible/train",
                          train_ir="infrared/train", val_ir="infrared/train")

    # KAIST-format ann json from the labels (category 1, sorted-file order)
    images, annotations = [], []
    for img_id, lp in enumerate(sorted((tmp_path / "data/labels/train").glob("*.txt"))):
        images.append({"id": img_id, "im_name": lp.stem, "height": HW, "width": HW})
        for line in lp.read_text().splitlines():
            c, cx, cy, bw, bh = map(float, line.split())
            annotations.append({
                "id": len(annotations), "image_id": img_id, "category_id": 1,
                "bbox": [(cx - bw / 2) * HW, (cy - bh / 2) * HW, bw * HW, bh * HW],
                "height": bh * HW, "occlusion": 0, "ignore": 0})
    ann_path = tmp_path / "kaist_ann.json"
    ann_path.write_text(json.dumps(
        {"images": images, "annotations": annotations,
         "categories": [{"id": 1, "name": "object"}]}))

    mc = tiny_icafusion_config(nc=2)
    kw = dict(model_cfg=mc, data_cfg=data_cfg, hyp=load_hyp_config(None),
              batch_size=4, imgsz=96, project=str(tmp_path / "runs"),
              autoanchor=False, workers=0, warmup_min_steps=2,
              max_targets=16, n_devices=2,
              merge_streams=3, accum_steps=2, multi_scale=True,
              results_format="reference", kaist_ann=str(ann_path))

    # phase 1: interrupted after 1 epoch (epochs=1 run; the on-chip soak
    # SIGKILLs a longer run — in-process we stop at the epoch boundary)
    r1 = fit(FitConfig(name="soak", epochs=1, **kw))
    last = Path(r1["run_dir"]) / "weights/last.ckpt"
    assert last.exists()

    # phase 2: resume with the SAME feature set -> completes + strips
    r2 = fit(FitConfig(name="soak_resume", epochs=3, resume=str(last), **kw))
    run_dir = Path(r2["run_dir"])
    stripped = run_dir / "weights/stripped.ckpt"
    assert stripped.exists()

    # reference-format csv with populated MR columns across the resume seam
    lines = (run_dir / "results.csv").read_text().strip().splitlines()
    assert lines[0].startswith("epoch,train/box_loss") and len(lines) == 3
    header = lines[0].split(",")
    row = dict(zip(header, lines[-1].split(",")))
    assert float(row["epoch"]) == 2 and float(row["val/obj_loss"]) > 0
    assert np.isfinite(float(row["MR_all"]))

    # stripped ckpt (standard layout, written from the merged run) serves
    # through the production engine: merge auto + int8 quantize over the mesh
    from icafusion_tpu.serve.engine import ServingEngine
    model = build_model(mc)
    variables = load_inference_variables(str(stripped))
    engine = ServingEngine(model=model, variables=variables, img_size=96,
                           batch_size=4, n_devices=2, conf_thres=0.001,
                           merge_streams="auto")
    assert engine.merge_streams > 0, "tiny config must have a mergeable prefix"
    import cv2

    from icafusion_tpu.data.augment import letterbox
    vis = sorted((tmp_path / "data/visible/train").glob("*.jpg"))[:4]
    rgb = np.stack([letterbox(cv2.imread(str(p))[:, :, ::-1], (96, 96))[0]
                    for p in vis])
    ir = np.stack([letterbox(
        cv2.imread(str(p).replace("visible", "infrared"))[:, :, ::-1],
        (96, 96))[0] for p in vis])
    engine.quantize([(rgb, ir)])
    dets = engine.predict_arrays(rgb, ir)
    assert len(dets) == 4 and all(np.isfinite(d).all() for d in dets)

    # rect eval of the same ckpt through the int8+merge product path
    from icafusion_tpu.cli import val as val_cli
    out = val_cli.main([
        "--weights", str(stripped), "--cfg", "zoo:tiny", "--data",
        str(_write_data_yaml(tmp_path, data_cfg)), "--img-size", "96",
        "--batch-size", "4", "--rect", "--int8", "--merge", "auto",
        "--save-txt", "--kaist-ann", str(ann_path),
        "--save-dir", str(tmp_path / "val")])
    assert out["seen"] == 12 and np.isfinite(out["map50"])
    assert (tmp_path / "val/labels/result.txt").exists()


def _write_data_yaml(tmp_path: Path, dc) -> Path:
    p = tmp_path / "data.yaml"
    p.write_text(
        f"path: {dc.path}\ntrain_rgb: {dc.train_rgb}\ntrain_ir: {dc.train_ir}\n"
        f"val_rgb: {dc.val_rgb}\nval_ir: {dc.val_ir}\n"
        f"nc: {dc.nc}\nnames: ['a', 'b']\n")
    return p
