"""Soak-run preparation: synthetic paired dataset + data yaml + a KAIST-format
annotation json derived from the val labels (single category, ids in sorted
val-file order — the same order the Evaluator numbers its MR txt lines), so
`cli/val --kaist-ann` produces a REAL miss-rate report on the soak data.

Part of the round-4 production soak (tools/r4_soak.sh): one run composing
merge-streams x accum x multi-scale x kill/resume x strip x int8+merge
serving x rect+KAIST scoring (reference one-driver-does-all contract,
train.py:42-490).
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "examples"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="runs/soak")
    ap.add_argument("--n", type=int, default=160)
    ap.add_argument("--canvas", default="256x320")
    args = ap.parse_args()

    from convergence_run import make_dataset

    work = Path(args.workdir)
    data_root = work / "data"
    hw = tuple(int(x) for x in args.canvas.split("x"))
    if not (data_root / "visible/train").exists():
        make_dataset(data_root, args.n, np.random.default_rng(7), hw=hw)
        print(f"dataset: {args.n} pairs ({hw[0]}x{hw[1]}) under {data_root}")

    (work / "data.yaml").write_text(
        f"path: {data_root}\n"
        "train_rgb: visible/train\ntrain_ir: infrared/train\n"
        "val_rgb: visible/val\nval_ir: infrared/val\n"
        "nc: 3\nnames: ['red', 'green', 'blue']\n")

    # KAIST-format annotations from the val labels (category 1, ids in
    # sorted-file order — matches the Evaluator's `seen` numbering)
    images, annotations = [], []
    aid = 0
    val_files = sorted((data_root / "labels/val").glob("*.txt"))
    h0, w0 = hw
    for img_id, lp in enumerate(val_files):
        images.append({"id": img_id, "im_name": lp.stem,
                       "height": h0, "width": w0})
        for line in lp.read_text().splitlines():
            c, cx, cy, bw, bh = map(float, line.split())
            x = (cx - bw / 2) * w0
            y = (cy - bh / 2) * h0
            annotations.append({"id": aid, "image_id": img_id,
                                "category_id": 1,
                                "bbox": [x, y, bw * w0, bh * h0],
                                "height": bh * h0, "occlusion": 0,
                                "ignore": 0})
            aid += 1
    ann = {"info": "soak synthetic val split", "images": images,
           "annotations": annotations,
           "categories": [{"id": 1, "name": "object"}]}
    (work / "kaist_ann.json").write_text(json.dumps(ann))
    print(f"wrote {work}/data.yaml and {work}/kaist_ann.json "
          f"({len(images)} images, {aid} boxes)")


if __name__ == "__main__":
    main()
