"""Export a TPU-trained checkpoint as a reference-format torch .pt.

The interchange path OUT of this framework: reverse_convert maps the flax
variables onto the reference's parameter names/layouts (bit-exact inverse of
the .pt importer — tests/test_torch_parity.py round-trip), the reference
two-stream Model (models/yolo_test.py:75) is built in-process and loaded
strict, and the result is saved in the reference's own checkpoint layout
({'model': <nn.Module>, 'epoch': -1, ...}) — directly consumable by its
test.py / detect_twostream.py / models/export.py (TorchScript, ONNX, CoreML;
export.py:66-124).

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/export_torch.py \
        --weights runs/train/exp/weights/best.ckpt \
        --cfg /root/reference/models/transformer/yolov5n_Transfusion_FLIR.yaml \
        --out best_torch.pt [--state-dict-only]

Requires torch (CPU is fine) and an importable reference checkout; the saved
full-model pickle likewise unpickles only where the reference package is
importable — which is exactly the deployment context it targets. Under
torch >= 2.6 pass weights_only=False to torch.load (the reference targets
torch 1.x where that was the default). Use --state-dict-only for a plain
tensor dict with no code dependency.
"""

import argparse
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True, help="msgpack .ckpt (ours)")
    ap.add_argument("--cfg", required=True,
                    help="reference model YAML (the graph to instantiate)")
    ap.add_argument("--out", required=True, help="output .pt path")
    ap.add_argument("--state-dict-only", action="store_true",
                    help="save a plain {name: tensor} dict instead of the "
                         "full reference checkpoint layout")
    args = ap.parse_args()

    import numpy as np
    import torch

    from icafusion_tpu.utils.checkpoint import load_inference_variables
    from icafusion_tpu.utils.torch_convert import reverse_convert
    from ref_compat import build_reference_model

    variables = load_inference_variables(args.weights)
    model = build_reference_model(args.cfg)
    like = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    sd = reverse_convert(variables, like=like)
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd.items()}

    if args.state_dict_only:
        torch.save(tensors, args.out)
        print(f"state_dict ({len(tensors)} tensors) -> {args.out}")
        return

    missing, unexpected = model.load_state_dict(tensors, strict=False)
    assert not unexpected, f"unexpected keys: {unexpected[:5]}"
    assert not missing, f"missing keys: {missing[:5]}"
    model.float().eval()
    ckpt = {"model": model, "ema": None, "epoch": -1, "best_fitness": None,
            "optimizer": None, "training_results": None}
    torch.save(ckpt, args.out)
    print(f"reference-format checkpoint -> {args.out} "
          f"(load with its attempt_load/test.py/export.py)")


if __name__ == "__main__":
    main()
