"""Conv+BatchNorm folding — inference-time model surgery.

Behavioral counterpart of reference fuse_conv_and_bn (utils/torch_utils.py:182-202)
and Model.fuse (yolo_test.py:182-190): absorb each BatchNorm's affine into the
preceding conv kernel. Because this framework's Conv module always applies its BN,
folding is expressed as a *variables transform*: the kernel is rescaled and the BN
parameters are set to an exact identity (mean=0, var=1-eps, scale=1, bias=beta'),
leaving the module graph unchanged. XLA fuses the remaining identity affine into
the conv epilogue, so the numerical result and performance match a structural fold.
"""

from __future__ import annotations

import jax
import numpy as np

from icafusion_tpu.nn.layers import BN_EPS


def fold_conv_bn(variables: dict) -> dict:
    """Return new variables with every conv+bn pair folded. Works on the standard
    {'params', 'batch_stats'} tree produced by the assembler."""
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables.get("batch_stats", {}))

    def walk(p_node, s_node):
        if not isinstance(p_node, dict):
            return p_node
        out = {}
        keys = list(p_node.keys())
        for k in keys:
            out[k] = walk(p_node[k], s_node.get(k, {}) if isinstance(s_node, dict) else {})
        # fold any (conv-like, bn-like) sibling pair: a conv child with a 4D
        # kernel and a bn sibling holding mean/var
        for bn_name, bn in list(out.items()):
            if not (isinstance(bn, dict) and "scale" in bn and
                    isinstance(s_node, dict) and bn_name in s_node
                    and "mean" in s_node[bn_name]):
                continue
            conv_name = {"bn": "conv", "bn1": "conv1", "bn2": "conv2",
                         "bn3": "conv3", "stem_bn": "stem_conv",
                         "shortcut_bn": "shortcut_conv"}.get(bn_name)
            if conv_name is None or conv_name not in out:
                continue
            conv = out[conv_name]
            if "kernel" not in conv or conv["kernel"].ndim != 4:
                continue
            mean = s_node[bn_name]["mean"]
            var = s_node[bn_name]["var"]
            gamma = bn["scale"]
            beta = bn["bias"]
            scale = gamma / np.sqrt(var + BN_EPS)
            conv = dict(conv)
            conv["kernel"] = conv["kernel"] * scale  # broadcast over out-channels
            out[conv_name] = conv
            bn = dict(bn)
            bn["scale"] = np.ones_like(gamma)
            bn["bias"] = beta - mean * scale
            out[bn_name] = bn
            # identity running stats
            s_node[bn_name] = {"mean": np.zeros_like(mean),
                               "var": np.ones_like(var) - BN_EPS}
        return out

    new_params = walk(params, stats)
    return {**variables, "params": new_params, "batch_stats": stats}
