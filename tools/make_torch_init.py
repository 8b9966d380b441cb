"""Generate a torch-default-initialized reference state dict for pretrained-
init experiments (the `--pretrained` path of examples/convergence_run.py).

The reference trains VGG16 backbones from torchvision's pretrained weights
(models/common.py:109-128 builds the VGG stream; train.py:94-99 loads
--weights). torchvision is not in this image, so the strongest available
donor is the reference model's own torch default init (kaiming-uniform convs,
uniform biases) — exactly what a reference user starting from scratch gets.
The saved file is a plain state dict, loadable by
icafusion_tpu.utils.torch_convert.load_torch_checkpoint.

Usage:
    python tools/make_torch_init.py \
        --yaml /root/reference/models/transformer/yolov5_VGG16_NiNfusion_FLIR.yaml \
        --out artifacts/vgg16_nin_torch_init.pt
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--yaml", required=True, help="reference model YAML")
    ap.add_argument("--out", required=True, help="output .pt (state dict only)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import torch
    from ref_compat import build_reference_model

    m = build_reference_model(args.yaml, seed=args.seed)
    sd = {k: v for k, v in m.state_dict().items()}
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    torch.save(sd, args.out)
    n = sum(v.numel() for v in sd.values())
    print(f"saved torch-init state dict: {len(sd)} tensors, "
          f"{n / 1e6:.1f}M values -> {args.out}")


if __name__ == "__main__":
    main()
