"""Reference-checkpoint converter: torch state_dict -> flax variables.

Maps the reference's parameter names (models/yolo_test.py graphs built from
models/common.py modules) onto this framework's param tree, including:

- layout transposes: torch Conv2d OIHW -> flax HWIO, torch Linear (out,in) ->
  flax kernel (in,out)
- BatchNorm weight/bias/running_mean/running_var -> scale/bias + batch_stats
- the fusion transformer's naming (que_proj_vis -> q_vis, LN1/LN2 -> ln_vis/ln_ir,
  mlp Sequential indices -> fc1/fc2, coefficient1..8.bias -> coefficients[8])
- the pretrained-bootstrap stream remap model.{0-9} -> model.{10-19} that seeds the
  IR tower from single-stream YOLOv5 weights (reference train.py:94-99)

Checkpoint loading prefers the EMA weights when present, like attempt_load
(models/experimental.py:113-126).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

# child-name translations (mine -> reference)
_NAME_MAP = {
    "q_vis": "que_proj_vis", "k_vis": "key_proj_vis", "v_vis": "val_proj_vis",
    "q_ir": "que_proj_ir", "k_ir": "key_proj_ir", "v_ir": "val_proj_ir",
    "out_vis": "out_proj_vis", "out_ir": "out_proj_ir",
    "ln_vis": "LN1", "ln_ir": "LN2",
    "mlp_ln": "LN2",
    "mlp_vis_fc1": "mlp_vis.0", "mlp_vis_fc2": "mlp_vis.2",
    "mlp_ir_fc1": "mlp_ir.0", "mlp_ir_fc2": "mlp_ir.2",
    "stem_conv": "layer.0", "stem_bn": "layer.1",
    "shortcut_conv": "shortcut.0", "shortcut_bn": "shortcut.1",
}
_LEAF_MAP = {"kernel": "weight", "scale": "weight", "bias": "bias",
             "mean": "running_mean", "var": "running_var"}


def _translate(path: Tuple[str, ...]) -> str:
    """My param path ('m20','crosstransformer0','crossatt','q_vis','kernel') ->
    reference key 'model.20.crosstransformer.0.crossatt.que_proj_vis.weight'."""
    out = []
    for depth, tok in enumerate(path[:-1]):
        if depth == 0:
            m = re.fullmatch(r"m(\d+)", tok)
            assert m, f"unexpected top-level token {tok}"
            out.append(f"model.{m.group(1)}")
            continue
        if tok in _NAME_MAP:
            out.append(_NAME_MAP[tok])
            continue
        m = re.fullmatch(r"crosstransformer(\d+)", tok)
        if m:
            out.append(f"crosstransformer.{m.group(1)}")
            continue
        m = re.fullmatch(r"m(\d+)", tok)
        if m:  # C3/CSP inner bottlenecks and Detect's conv list
            out.append(f"m.{m.group(1)}")
            continue
        m = re.fullmatch(r"r(\d+)", tok)
        if m:  # repeated module (nn.Sequential)
            out.append(m.group(1))
            continue
        m = re.fullmatch(r"conv(\d+)", tok)
        if m and depth == 1:  # VGGblock convs: vggblock.{i}.0
            out.append(f"vggblock.{m.group(1)}.0")
            continue
        m = re.fullmatch(r"blk(\d+)", tok)
        if m:  # ResNet stage blocks
            out.append(f"layer.{m.group(1)}")
            continue
        out.append(tok)
    out.append(_LEAF_MAP.get(path[-1], path[-1]))
    return ".".join(out)


def _fetch(sd: Dict[str, np.ndarray], key: str, like: np.ndarray,
           leaf: str) -> np.ndarray:
    v = np.asarray(sd[key], dtype=np.float32)
    if leaf == "kernel":
        if v.ndim == 4:          # conv OIHW -> HWIO
            v = v.transpose(2, 3, 1, 0)
        elif v.ndim == 2:        # linear (out,in) -> (in,out)
            v = v.T
    if v.shape != like.shape:
        v = v.reshape(like.shape)
    return v


def convert_state_dict(state_dict: Dict[str, np.ndarray], variables,
                       strict: bool = True):
    """Populate a freshly-initialized `variables` pytree ({'params','batch_stats'})
    from a reference state_dict (torch names -> numpy arrays). Returns the new
    variables pytree and the list of reference keys left unused."""
    import jax.tree_util as jtu

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    used = set()
    leaves_p, treedef_p = jtu.tree_flatten_with_path(variables["params"])
    new_params = jtu.tree_unflatten(
        jtu.tree_structure(variables["params"]),
        [_leaf_value(sd, path, leaf, used, strict) for path, leaf in leaves_p])
    new_bs = variables.get("batch_stats", {})
    if new_bs:
        leaves_b, _ = jtu.tree_flatten_with_path(new_bs)
        new_bs = jtu.tree_unflatten(
            jtu.tree_structure(new_bs),
            [_leaf_value(sd, path, leaf, used, strict) for path, leaf in leaves_b])
    unused = [k for k in sd
              if k not in used and not k.endswith("num_batches_tracked")
              and not k.endswith(("anchors", "anchor_grid"))]
    out = dict(variables)
    out["params"] = new_params
    out["batch_stats"] = new_bs
    return out, unused


def _leaf_value(sd, path, leaf, used, strict):
    toks = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
    if toks[-1] == "coefficients":
        prefix = _translate(toks[:-1] + ("dummy",)).rsplit(".", 1)[0]
        vals = []
        for k in range(1, 9):
            key = f"{prefix}.coefficient{k}.bias"
            vals.append(np.asarray(sd[key], np.float32).reshape(()))
            used.add(key)
        return np.asarray(vals, np.float32)
    key = _translate(toks)
    if key not in sd:
        if strict:
            raise KeyError(f"reference key {key} (for {'/'.join(toks)}) missing")
        return np.asarray(leaf)
    used.add(key)
    return _fetch(sd, key, np.asarray(leaf), toks[-1])


def remap_single_stream_to_two_stream(state_dict: Dict[str, np.ndarray],
                                      stream_offset: int = 10):
    """Duplicate backbone keys model.{0..offset-1} into model.{offset..2*offset-1}
    so both towers start from the same single-stream weights (train.py:94-99)."""
    out = dict(state_dict)
    pat = re.compile(r"^model\.(\d+)\.(.+)$")
    for k, v in list(state_dict.items()):
        m = pat.match(k)
        if m and int(m.group(1)) < stream_offset:
            out[f"model.{int(m.group(1)) + stream_offset}.{m.group(2)}"] = v
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference .pt checkpoint into {name: np.ndarray}, preferring EMA
    weights (experimental.py:119). Accepts the reference's full checkpoint
    dict, a bare nn.Module pickle, or a plain state_dict (the
    tools/export_torch.py --state-dict-only format). Requires torch (CPU)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    model = ckpt
    if isinstance(ckpt, dict):
        # full reference checkpoint layout; a plain state_dict has neither key
        model = ckpt.get("ema") or ckpt.get("model") or ckpt
    sd = model.float().state_dict() if hasattr(model, "state_dict") else model
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}


# reference parameters that exist but are dead in its forward pass
# (yolo_test.py graphs never call them): CrossTransformerBlock's
# ln_input/ln_output/LN1 and its third unused `mlp` (common.py:701-724),
# plus torch bookkeeping buffers.
_REF_DEAD_KEY = re.compile(
    r"(ln_input|ln_output|\.LN1\.|crosstransformer\.\d+\.mlp\.)|"
    r"num_batches_tracked$|anchors$|anchor_grid$")


def _to_torch_layout(v: np.ndarray, leaf: str) -> np.ndarray:
    """Inverse of _fetch's layout mapping (flax -> torch)."""
    v = np.asarray(v, np.float32)
    if leaf == "kernel":
        if v.ndim == 4:          # HWIO -> OIHW
            v = v.transpose(3, 2, 0, 1)
        elif v.ndim == 2:        # (in,out) -> (out,in)
            v = v.T
    return v


def reverse_convert(variables, like: Dict[str, np.ndarray] = None
                    ) -> Dict[str, np.ndarray]:
    """Inverse of convert_state_dict: flax variables -> reference-named torch
    state_dict (numpy arrays, OIHW conv / (out,in) linear layouts).

    Lets TPU-trained checkpoints flow back into the reference stack — e.g.
    `Model(cfg).load_state_dict(...)` there, then its export.py TorchScript/
    ONNX/CoreML paths (models/export.py:66-124) or test.py. `like`: optional
    template state_dict (e.g. from a freshly built reference model) used to
    reshape entries whose torch shape is not derivable from the flax leaf
    (e.g. scalar gains stored as (1,) tensors) and to verify key coverage.
    """
    import jax.tree_util as jtu

    sd: Dict[str, np.ndarray] = {}
    for collection in ("params", "batch_stats"):
        tree = variables.get(collection)
        if not tree:
            continue
        leaves, _ = jtu.tree_flatten_with_path(tree)
        for path, leaf in leaves:
            toks = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
            leaf = np.asarray(leaf, np.float32)
            if toks[-1] == "coefficients":
                prefix = _translate(toks[:-1] + ("x",)).rsplit(".", 1)[0]
                for k in range(8):
                    sd[f"{prefix}.coefficient{k + 1}.bias"] = \
                        leaf[k].reshape(1).copy()
                continue
            sd[_translate(toks)] = _to_torch_layout(leaf, toks[-1])
    if like is not None:
        missing = []
        for k, tmpl in like.items():
            if k in sd:
                if sd[k].shape != tuple(np.shape(tmpl)):
                    sd[k] = sd[k].reshape(np.shape(tmpl))
            elif _REF_DEAD_KEY.search(k):
                # parameters the reference allocates but never touches in its
                # forward (CTB ln_input/ln_output/LN1 + the third unused mlp,
                # common.py:701-724; torch bookkeeping buffers): copy from the
                # template so strict load_state_dict round-trips
                sd[k] = np.asarray(tmpl, np.float32).copy()
            else:
                missing.append(k)
        if missing:
            raise KeyError(f"reverse_convert did not produce {missing[:5]} "
                           f"(+{max(0, len(missing) - 5)} more)")
    return sd
