"""Post-training W8A8 quantization for serving — a TPU-native capability the
reference does not have (its export path mentions CoreML int8 only as a
commented option, models/export.py:118).

v5e's MXU runs int8 at 2x the bf16 peak; measured conv speedups including the
requant epilogue are 1.5-1.8x (BENCH.md). The scheme keeps the graph intact:

- per-Conv static symmetric quantization (zero-point 0): int8 weights with
  per-output-channel scales, int8 activations with per-INPUT-channel scales
  folded into the weights pre-quantization (per-tensor fallback for grouped
  convs), calibrated from representative batches (absmax);
- quantize/dequant happen INSIDE each Conv module (nn/layers.py Conv._int8_conv)
  so Concat/Add/SPPF/attention/Detect all stay in bf16/f32 — no graph surgery,
  the Detect head and fusion transformer keep full precision;
- enabled purely by data: `quantize_variables` returns the variables dict with
  an added "quant" collection; `model.apply` with those variables takes the
  int8 path automatically (eval only — training never quantizes).

Usage:
    calib = calibrate(model, variables, [(rgb1, ir1), (rgb2, ir2), ...])
    qvars = quantize_variables(variables, calib)
    pred, _, _ = model.apply(qvars, rgb, ir, train=False, decode=True)

Compatibility: the 'quant' collection layout changed when activation scales
went per-channel (s_in folded into w8/s_w; dequant is now y*s_w, not
y*s_in*s_w). The quant collection itself is never checkpointed — it is
rebuilt from params + the CALIBRATION tree, and the calibration tree IS
persistable: save_calibration()/load_calibration() write a versioned artifact
(QUANT_SCHEME_VERSION + a caller key, e.g. the checkpoint's sha1) next to the
checkpoint, so production engines load-and-serve (the reference's deploy
contract, models/experimental.py:113-134) instead of re-running the
calibration forward on every process start (measured 206 s cold for the
l-scale flagship, BENCH_r04.json). A key/version mismatch silently falls
back to fresh calibration.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Callable, Iterable, Optional, Tuple

import jax
import numpy as np

# bump when the calibration semantics change (what absmax means / how it is
# folded); persisted artifacts from other versions are ignored
QUANT_SCHEME_VERSION = "2-perchannel-fold"


def calibrate(model, variables, batches: Iterable[Tuple]) -> dict:
    """Run forward passes with the 'calib' collection mutable, reducing each
    Conv input's absmax over all batches. Returns the calib tree (numpy)."""
    @jax.jit
    def fwd(v, rgb, ir):
        _, mut = model.apply(v, rgb, ir, train=False, decode=False,
                             mutable=["calib"])
        return mut["calib"]

    acc: Optional[dict] = None
    for rgb, ir in batches:
        cal = jax.tree.map(np.asarray, fwd(variables, rgb, ir))
        acc = cal if acc is None else jax.tree.map(np.maximum, acc, cal)
    if acc is None:
        raise ValueError("calibrate() needs at least one batch")
    return acc


def calibration_key(ckpt_path: Optional[str] = None, merge: int = 0,
                    extra: Optional[dict] = None) -> dict:
    """Identity of a calibration artifact: scheme version + checkpoint file
    sha1 (weights determine the absmax tree's structure and, with the data,
    its values) + the stream-merge K (merged graphs have different module
    paths). extra: caller-specific entries (e.g. canvas, calib-set id)."""
    key = {"scheme": QUANT_SCHEME_VERSION, "merge": int(merge)}
    if ckpt_path:
        h = hashlib.sha1()
        with open(ckpt_path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        key["ckpt_sha1"] = h.hexdigest()
    if extra:
        key.update(extra)
    return key


def save_calibration(path, calib: dict, key: dict) -> None:
    """Versioned calibration artifact (msgpack): {key-json, absmax tree}."""
    from flax import serialization
    payload = {"key": json.dumps(key, sort_keys=True),
               "calib": jax.tree.map(np.asarray, calib)}
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    tmp = p.with_suffix(p.suffix + ".tmp")
    tmp.write_bytes(serialization.msgpack_serialize(payload))
    tmp.replace(p)


def load_calibration(path, key: dict) -> Optional[dict]:
    """Load a calibration artifact if present AND its key matches exactly;
    None otherwise (caller falls back to fresh calibrate())."""
    from flax import serialization
    p = Path(path)
    if not p.is_file():
        return None
    try:
        payload = serialization.msgpack_restore(p.read_bytes())
    except Exception:
        return None
    if payload.get("key") != json.dumps(key, sort_keys=True):
        return None
    return payload["calib"]


def calibrate_cached(model, variables, batches_fn: Callable[[], Iterable],
                     cache_path, key: dict) -> Tuple[dict, bool]:
    """Load the calibration artifact when valid, else run the calibration
    forward (batches_fn is only called on a miss — the batches themselves can
    be expensive to assemble) and persist the result. Returns (calib, hit)."""
    calib = load_calibration(cache_path, key)
    if calib is not None:
        return calib, True
    calib = calibrate(model, variables, batches_fn())
    save_calibration(cache_path, calib, key)
    return calib, False


def _mse_scales(w2d: np.ndarray, absmax: np.ndarray, min_scale: float,
                ratios=np.linspace(0.5, 1.0, 21)) -> np.ndarray:
    """Per-out-channel MSE-optimal symmetric clip: search scale = r*absmax/127
    over r and keep the one minimizing the int8 reconstruction error. Clipping
    a few outlier weights buys finer resolution for the bulk (ACIQ-style);
    pure host-side post-processing, no graph change."""
    best_s = np.maximum(absmax / 127.0, min_scale)
    best_err = np.full(w2d.shape[1], np.inf)
    for r in ratios:
        s = np.maximum(absmax * r / 127.0, min_scale)
        q = np.clip(np.round(w2d / s), -127, 127) * s
        err = ((q - w2d) ** 2).sum(axis=0)
        better = err < best_err
        best_s = np.where(better, s, best_s)
        best_err = np.minimum(err, best_err)
    return best_s


def detect_feeder_skip(cfg) -> Tuple[str, ...]:
    """Skip-list for the convs feeding Detect — the quantization-sensitive
    tail. Measured on the trained instrument (ACCURACY.md): quantizing
    everything costs -0.364 pts mAP@50; skipping just the FINAL conv of each
    Detect-feeding block (three 1x1 convs kept in bf16/f32) recovers it to
    +0.013. For C3-family feeders that's the cv3 child; other module types
    skip the whole block."""
    from icafusion_tpu.models.assembler import detect_layer, resolve_model
    resolved, _ = resolve_model(cfg)
    by_i = {r.i: r for r in resolved}
    out = []
    for i in detect_layer(cfg).f:
        mod = by_i[i].module
        out.append(f"m{i}/cv3" if mod in ("C3", "C3TR") else f"m{i}")
    return tuple(out)


_FUSION_DENSE_LEAVES = ("out_vis", "out_ir")
_FUSION_DENSE_SUFFIXES = ("_fc1", "_fc2")


def _quantize_fusion_dense(params: dict, quant: dict, min_scale: float):
    """Weight-only int8 for the fusion transformer's Dense layers (consumed
    by nn/fusion.py _QDense): per-out-channel symmetric w8 + s_w, no
    activation quantization. These matmuls run at tiny M and are
    weight-bandwidth-bound (round-4 profile: 169 GB/s on the P5 MLPs), so
    halving weight bytes is the available lever; weight-only keeps the
    numerics near-lossless (per-channel absmax on weights alone)."""
    def walk(p_node, path=()):
        if not isinstance(p_node, dict):
            return
        name = path[-1] if path else ""
        if "kernel" in p_node and np.ndim(p_node["kernel"]) == 2 and (
                name in _FUSION_DENSE_LEAVES
                or name.endswith(_FUSION_DENSE_SUFFIXES)):
            w = np.asarray(p_node["kernel"], np.float32)
            s_w = np.maximum(np.abs(w).max(axis=0) / 127.0, min_scale)
            node = quant
            for key in path[:-1]:
                node = node.setdefault(key, {})
            node[name] = {
                "w8": np.clip(np.round(w / s_w), -127, 127).astype(np.int8),
                "s_w": s_w.astype(np.float32),
            }
            return
        for key, child in p_node.items():
            walk(child, path + (key,))

    walk(params)


def quantize_variables(variables: dict, calib: dict,
                       min_scale: float = 1e-8,
                       min_ch: int = 0,
                       skip: Tuple[str, ...] = (),
                       weight_clip: str = "absmax",
                       fusion_dense: bool = False) -> dict:
    """Build the 'quant' collection from params + calibration absmaxes.

    For every module path that has both a calibrated 'absmax' (sown by Conv)
    and a 4D conv kernel child, emit {w8 int8 HWIO, s_w (cout,) f32,
    s_in () f32}; grouped convs keep their feature_group_count in the int8
    path.

    min_ch: skip convs with fewer than this many in- OR out-channels.
    Default 0 = quantize everything, which MEASURES FASTEST: the hypothesis
    that sub-128-channel stages (lane-bound in any dtype) only pay quantize
    epilogues was refuted end-to-end — min_ch=128 serves 56.97 ms/b32 vs
    54.0 quantizing all (the mixed bf16<->s8 boundary converts cost more
    than the early-map epilogues save; BENCH.md). Kept as a knob for other
    model shapes.

    skip: module-path prefixes ('m0', or nested like 'm30/cv3') to leave in
    full precision. Measured use (ACCURACY.md): skipping the three
    Detect-adjacent blocks turns the trained yolov5n int8 cost from
    -0.364 pts into +0.040 — the head carries nearly all the quantization
    sensitivity; cli/val.py --int8 applies the Detect-feeder skip by
    default via detect_feeder_skip().

    weight_clip: 'absmax' (default) or 'mse' — per-out-channel MSE-optimal
    clip search over scale = r*absmax/127 (r in [0.5, 1]); measured effect in
    ACCURACY.md's int8 row.

    fusion_dense: also emit weight-only int8 for the fusion transformer's
    Dense layers (attention out-projections and the MLP fc1/fc2 — see
    _quantize_fusion_dense / nn/fusion.py _QDense). Off by default: the
    conv path's W8A8 is measured end-to-end; this knob's value depends on
    whether XLA fuses the dequant into the dot's operand load (BENCH.md)."""
    params = jax.tree.map(np.asarray, variables["params"])
    skip = (skip,) if isinstance(skip, str) else tuple(skip)

    def walk(p_node, c_node, path=()):
        if not isinstance(p_node, dict) or not isinstance(c_node, dict):
            return None
        if path and any("/".join(path) == s or "/".join(path).startswith(s + "/")
                        or s == path[0] for s in skip):
            return None
        out = {}
        for key, child in c_node.items():
            if key == "absmax":
                continue
            sub = walk(p_node.get(key, {}), child, path + (key,))
            if sub:
                out[key] = sub
        if "absmax" in c_node and "conv" in p_node and \
                isinstance(p_node["conv"], dict) and \
                p_node["conv"].get("kernel") is not None and \
                np.ndim(p_node["conv"]["kernel"]) == 4:
            w = np.asarray(p_node["conv"]["kernel"], np.float32)  # HWIO
            if w.shape[2] < min_ch or w.shape[3] < min_ch:
                return out or None  # lane-bound stage: int8 can't win (min_ch)
            absmax = np.asarray(c_node["absmax"], np.float32).reshape(-1)
            if absmax.shape[0] == w.shape[2]:
                # per-input-channel activation scales, folded into the weights
                s_in = np.maximum(absmax / 127.0, min_scale)
            else:
                # grouped conv (kernel ci = c1/g): per-tensor fallback
                s_in = np.float32(max(float(absmax.max()) / 127.0, min_scale))
            w_eff = w * np.reshape(s_in, (1, 1, -1, 1)) if np.ndim(s_in) \
                else w * s_in
            absmax_w = np.abs(w_eff).max(axis=(0, 1, 2))
            if weight_clip == "mse":
                s_w = _mse_scales(w_eff.reshape(-1, w_eff.shape[3]),
                                  absmax_w, min_scale)
            else:
                s_w = np.maximum(absmax_w / 127.0, min_scale)
            w8 = np.clip(np.round(w_eff / s_w), -127, 127).astype(np.int8)
            out["w8"] = w8
            out["s_w"] = s_w.astype(np.float32)
            out["s_in"] = np.asarray(s_in, np.float32)
        return out or None

    quant = walk(params, calib)
    if not quant:
        raise ValueError("no quantizable convs found (empty calibration?)")
    if fusion_dense:
        _quantize_fusion_dense(params, quant, min_scale)
    new = dict(variables)
    new["quant"] = jax.tree.map(jax.numpy.asarray, quant)
    return new
