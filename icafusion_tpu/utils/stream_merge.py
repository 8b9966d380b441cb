"""Stream-merge: run the two towers' lane-starved stages as ONE conv.

The reference executes the RGB and IR backbones as two separate module chains
(yolo_test.py:140-156 routes layer 10's input to the second image via -4); on
the MXU that wastes half the systolic array for every sub-128-channel stage:
XLA pads BOTH channel operands of a 64-ch conv to the 128-lane width, so an
isolated 3x3 64->64 costs the same as a 3x3 128->128 (BENCH.md round-2
per-instance profile — the two 64-ch stages run at 11-24% MFU and appear
twice, once per stream).

This transform concatenates the streams on the channel axis and replaces each
(layer i, layer s+i) pair with a single module whose kernels are BLOCK-
DIAGONAL scatters of the two per-stream kernels — the padding lanes XLA burns
anyway now carry the other stream, and the zero blocks contribute exact zeros,
so outputs are numerically identical (bit-identical on the int8 path, where
accumulation is exact int32). C3's cv3 needs its input rows permuted because
the merged concat interleaves the two streams' branch outputs; any fixed
channel permutation folds into the next kernel's row placement at transform
time — zero runtime cost.

Only the first `pairs` layer pairs are merged (the >=128-channel stages
already run at 51-64% MFU; block-diagonal merging there would double useful
FLOPs for no lane recovery). Apply with:

    mvars = merge_stream_variables(cfg, variables, pairs=3)
    mmodel = build_model(cfg, dtype=..., merge_pairs=3)
    mmodel.apply(mvars, rgb, ir, ...)

Composes with int8 PTQ by merging FIRST, then calibrating/quantizing the
merged model (utils/quantize.py is purely tree-driven and the merged input's
per-channel absmax equals the concat of the per-stream absmaxes).

TRAINING on the merged graph is also exact, with one addition: the zero
blocks of a merged kernel receive nonzero weight-gradients (each stream's
activations correlate with the other's output error through the shared
conv), so unconstrained SGD would couple the streams. Multiplying the
gradient by the block-support mask (grad_mask()) restores step-for-step
equivalence: masked grads keep the zero blocks at exactly zero under
SGD/momentum/weight-decay/EMA (0 stays 0 through all of them), and the
64-ch stages appear THREE times in a train step (forward + data-grad +
weight-grad convs). unmerge_stream_variables() slices a trained merged
checkpoint back to the reference layout.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

MERGEABLE = ("Conv", "C3", "VGGblock", "ResNetlayer", "SPPF", "SPP")
# where (c1, c2) sit in each mergeable module's resolved args
_CH_ARGS = {"Conv": (0, 1), "C3": (0, 1), "VGGblock": (1, 2),
            "ResNetlayer": (0, 1), "SPPF": (0, 1), "SPP": (0, 1)}


def ir_stream_start(resolved) -> int:
    """Index of the IR tower's first layer (the one fed by -4)."""
    for r in resolved:
        if r.f == -4:
            return r.i
    raise ValueError("not a two-stream model: no layer takes the -4 input")


def validate_merge(resolved, pairs: int) -> int:
    """Check layers 0..pairs-1 pair structurally with s..s+pairs-1; return s."""
    s = ir_stream_start(resolved)
    if not 0 < pairs <= s:
        raise ValueError(f"merge_pairs must be in 1..{s} for this graph")
    for i in range(pairs):
        a, b = resolved[i], resolved[s + i]
        if a.module not in MERGEABLE:
            raise ValueError(f"layer {i} ({a.module}) is not stream-mergeable "
                             f"(supported: {MERGEABLE})")
        if (a.module, a.args, a.n) != (b.module, b.args, b.n):
            raise ValueError(f"layers {i} and {s+i} differ: "
                             f"{a.module}{a.args} vs {b.module}{b.args}")
        if b.f not in (-1, -4) or (i > 0 and a.f != -1):
            raise ValueError(f"merged layers must form plain chains; layer "
                             f"{s+i} has from={b.f}")
        if a.module == "Conv" and len(a.args) > 5 and a.args[5] != 1:
            raise ValueError("grouped Conv cannot be stream-merged")
        if a.module == "C3" and len(a.args) > 4:
            raise ValueError(
                "C3 with explicit g/e args cannot be stream-merged (the cv3 "
                "row permutation assumes the default hidden width c2*0.5)")
    if pairs < s and resolved[s + pairs].f != -1:
        raise ValueError(f"layer {s+pairs} must chain on the previous layer")
    return s


def _min_internal_width(r) -> int:
    """Narrowest channel dimension any conv inside the layer sees."""
    if r.module == "C3":
        return min(r.args[0], r.args[1], int(r.args[1] * 0.5))
    if r.module in ("SPPF", "SPP"):
        return min(r.args[0] // 2, r.args[1])
    if r.module == "VGGblock":
        return min(r.args[1], r.args[2])
    if r.module == "ResNetlayer":
        return r.args[1] if r.args[3] else min(r.args[0], r.args[1])
    return min(r.args[0], r.args[1])  # Conv


def auto_merge_pairs(cfg, lane_width: int = 128) -> int:
    """Largest prefix worth merging: consecutive mergeable layer pairs whose
    narrowest internal conv is below the MXU lane width (those are the ones
    XLA pads — merging wider stages doubles useful FLOPs for no recovery).
    yolov5l -> 3 (stem, 64->128 down, C3(128) w/ 64-ch bottlenecks); smaller
    width multiples starve deeper: yolov5s -> 5, yolov5n -> 7; VGG16 -> 2,
    ResNet50 -> 2. Returns 0 for single-stream graphs."""
    from icafusion_tpu.models.assembler import resolve_model

    resolved, _ = resolve_model(cfg)
    try:
        s = ir_stream_start(resolved)
    except ValueError:
        return 0
    k = 0
    while k < s:
        a, b = resolved[k], resolved[s + k]
        if (a.module not in MERGEABLE
                or (a.module, a.args, a.n) != (b.module, b.args, b.n)
                or _min_internal_width(a) >= lane_width
                or (a.module == "Conv" and len(a.args) > 5 and a.args[5] != 1)):
            break
        k += 1
    # the layer after the merged block must chain on it (validate_merge)
    while k and k < s and resolved[s + k].f != -1:
        k -= 1
    return k


def resolve_merge(spec, cfg) -> int:
    """CLI '--merge' value: an int, or 'auto' for auto_merge_pairs(cfg)."""
    if str(spec).lower() == "auto":
        return auto_merge_pairs(cfg)
    return int(spec or 0)


def merged_args(module: str, args: Tuple) -> Tuple:
    """Double the module's two channel args (position map in _CH_ARGS)."""
    i, j = _CH_ARGS[module]
    a = list(args)
    a[i], a[j] = 2 * a[i], 2 * a[j]
    return tuple(a)


# ---------------------------------------------------------------------------
# variables transform
# ---------------------------------------------------------------------------

def _merged_kernel(kA: np.ndarray, kB: np.ndarray,
                   rows_a=None, rows_b=None) -> np.ndarray:
    """HWIO block scatter: kA into rows rows_a / first coA output columns,
    kB into rows rows_b / remaining columns, zeros elsewhere."""
    kh, kw, ci_a, co_a = kA.shape
    ci_b, co_b = kB.shape[2:]
    if rows_a is None:
        rows_a = np.arange(ci_a)
    if rows_b is None:
        rows_b = ci_a + np.arange(ci_b)
    k = np.zeros((kh, kw, ci_a + ci_b, co_a + co_b), np.result_type(kA, kB))
    k[:, :, rows_a, :co_a] = kA
    k[:, :, rows_b, co_a:] = kB
    return k


def _merge_raw(a, b, rows_a=None, rows_b=None):
    """Merge two matching per-stream subtrees leaf-by-leaf: 4-D conv kernels
    become block scatters (HWIO), per-channel vectors (conv bias, BN
    scale/bias/mean/var) concatenate. Correct for any module whose internal
    dataflow never reorders channels across submodules — layers.Conv,
    Bottleneck, VGGblock (plain conv+bias chains, common.py:109-128),
    ResNetlayer/ResNetblock (residual adds are per-channel,
    common.py:131-181). rows_a/rows_b override kernel input-row placement
    (C3's cv3, whose input concat interleaves the streams)."""
    if not isinstance(a, dict):
        ta, tb = np.asarray(a), np.asarray(b)
        if ta.ndim == 4:
            return _merged_kernel(ta, tb, rows_a, rows_b)
        return np.concatenate([ta, tb], axis=0)
    return {k: _merge_raw(a[k], b[k], rows_a, rows_b) for k in a}


def _interleave_rows(c_: int, n_seg: int):
    """Merged-row placement for the conv AFTER an internal concat of n_seg
    per-stream segments (each c_ wide): the merged concat interleaves the
    streams as [A0|B0|A1|B1|...], so stream A's kernel rows land at segment
    offsets 2k*c_ and B's at 2k*c_ + c_."""
    rows_a = np.concatenate([np.arange(c_) + 2 * k * c_ for k in range(n_seg)])
    return rows_a, rows_a + c_


def _merge_c3(a: dict, b: dict, c_: int) -> dict:
    """layers.C3 subtree. c_ = the PER-STREAM hidden width (c2*e): cv3
    consumes the 2-segment concat [m-branch | cv2-branch]."""
    return {k: _merge_raw(a[k], b[k], *(_interleave_rows(c_, 2) if k == "cv3"
                                        else (None, None)))
            for k in a}


def _merge_spp(a: dict, b: dict, c_: int, n_seg: int) -> dict:
    """layers.SPPF/SPP subtree: cv2 consumes the n_seg-segment pool concat
    (c_ = per-stream c1//2)."""
    return {k: _merge_raw(a[k], b[k],
                          *(_interleave_rows(c_, n_seg) if k == "cv2"
                            else (None, None)))
            for k in a}


def _split_raw(m, rows_a=None, rows_b=None):
    """Inverse of _merge_raw: slice the two per-stream subtrees back out."""
    if not isinstance(m, dict):
        t = np.asarray(m)
        if t.ndim == 4:
            co = t.shape[3] // 2
            ra, rb = rows_a, rows_b
            if ra is None:
                ci = t.shape[2] // 2
                ra, rb = np.arange(ci), ci + np.arange(ci)
            return t[:, :, ra, :co], t[:, :, rb, co:]
        c = t.shape[0] // 2
        return t[:c], t[c:]
    halves = {k: _split_raw(v, rows_a, rows_b) for k, v in m.items()}
    return ({k: v[0] for k, v in halves.items()},
            {k: v[1] for k, v in halves.items()})


def _split_c3(m: dict, c_: int) -> Tuple[dict, dict]:
    a, b = {}, {}
    for k in m:
        a[k], b[k] = _split_raw(m[k], *(_interleave_rows(c_, 2) if k == "cv3"
                                        else (None, None)))
    return a, b


def _split_spp(m: dict, c_: int, n_seg: int) -> Tuple[dict, dict]:
    a, b = {}, {}
    for k in m:
        a[k], b[k] = _split_raw(m[k], *(_interleave_rows(c_, n_seg)
                                        if k == "cv2" else (None, None)))
    return a, b


def _spp_segments(r) -> int:
    if r.module == "SPPF":
        return 4
    ks = r.args[2] if len(r.args) > 2 else (5, 9, 13)
    return len(ks) + 1


def unmerge_stream_variables(cfg, variables: dict, pairs: int) -> dict:
    """Inverse of merge_stream_variables: slice merged m{i}_{s+i} subtrees
    back into per-stream m{i} / m{s+i} — e.g. to write a reference-layout
    checkpoint after training on the merged graph."""
    from icafusion_tpu.models.assembler import resolve_model

    resolved, _ = resolve_model(cfg)
    s = validate_merge(resolved, pairs)
    out = {}
    for col in variables:
        if col == "calib":
            continue
        tree = dict(variables[col])
        for i in range(pairs):
            r = resolved[i]
            m = tree.pop(f"m{i}_{s+i}", None)
            if m is None:
                continue
            if r.module == "C3":
                a, b = _split_c3(m, c_=int(r.args[1] * 0.5))
            elif r.module in ("SPPF", "SPP"):
                a, b = _split_spp(m, r.args[0] // 2, _spp_segments(r))
            else:
                a, b = _split_raw(m)
            tree[f"m{i}"], tree[f"m{s+i}"] = a, b
        out[col] = tree
    return out


def _transform_train_state(cfg, state, pairs: int, fn):
    """Apply merge/unmerge to every params-shaped tree inside a TrainState:
    params, batch_stats, optimizer momentum buffers (SGD pytree or Adam's
    {'m','v'}), and the EMA shadow. Momentum/EMA zero blocks are exactly
    zero under the gradient mask, so both directions are lossless."""
    import jax

    state = jax.device_get(state)

    def pshaped(tree):
        return fn(cfg, {"params": tree}, pairs)["params"]

    mom = state.opt.momentum
    if isinstance(mom, dict) and set(mom) == {"m", "v"}:  # YoloAdam
        mom = {"m": pshaped(mom["m"]), "v": pshaped(mom["v"])}
    else:
        mom = pshaped(mom)
    return state.replace(
        params=pshaped(state.params),
        batch_stats=fn(cfg, {"batch_stats": state.batch_stats},
                       pairs)["batch_stats"],
        opt=state.opt._replace(momentum=mom),
        ema=state.ema._replace(tree=fn(cfg, state.ema.tree, pairs)))


def merge_train_state(cfg, state, pairs: int):
    """Reference-layout TrainState -> merged-graph TrainState (train with
    build_model(cfg, merge_pairs=pairs) + make_train_step(grad_mask=...))."""
    return _transform_train_state(cfg, state, pairs, merge_stream_variables)


def unmerge_train_state(cfg, state, pairs: int):
    """Merged-graph TrainState -> reference layout (checkpoints stay in the
    standard layout so resume/export/conversion never see merged trees)."""
    return _transform_train_state(cfg, state, pairs, unmerge_stream_variables)


def grad_mask(cfg, params: dict, pairs: int):
    """Sparse 0/1 mask covering ONLY the merged m{i}_{s+i} subtrees of
    `params`: 1 on the block-diagonal support of every merged kernel, 0 on
    the zero blocks. Trainer.make_train_step multiplies just these top-level
    gradient entries each step — zero blocks then stay exactly zero through
    SGD/momentum/weight-decay/EMA, making merged training step-for-step
    equivalent to separate-stream training (the other ~99% of the gradient
    tree is untouched, so no full-model mask constant enters the program)."""
    import jax

    from icafusion_tpu.models.assembler import resolve_model

    resolved, _ = resolve_model(cfg)
    s = validate_merge(resolved, pairs)
    sub = {f"m{i}_{s+i}": params[f"m{i}_{s+i}"] for i in range(pairs)}
    ones = jax.tree.map(lambda x: np.ones(np.shape(x), np.float32),
                        {"params": sub})
    split = unmerge_stream_variables(cfg, ones, pairs)
    return merge_stream_variables(cfg, split, pairs)["params"]


def merge_stream_variables(cfg, variables: dict, pairs: int) -> dict:
    """Return a variables dict for build_model(cfg, merge_pairs=pairs):
    per-stream subtrees m{i}/m{s+i} replaced by merged m{i}_{s+i}."""
    from icafusion_tpu.models.assembler import resolve_model

    resolved, _ = resolve_model(cfg)
    s = validate_merge(resolved, pairs)

    out = {}
    for col in variables:
        if col == "calib":
            continue  # never persisted — regenerate via calibrate() on the
            # merged model (its absmax is the concat of the streams')
        if col not in ("params", "batch_stats"):
            raise ValueError(
                f"merge before adding the {col!r} collection (quantize the "
                "merged model: its calib absmax is the concat of the streams')")
        tree = dict(variables[col])
        for i in range(pairs):
            r = resolved[i]
            a = tree.pop(f"m{i}", None)
            b = tree.pop(f"m{s+i}", None)
            if a is None and b is None:
                continue  # collection doesn't cover these layers
            if r.module == "C3":
                # e fixed at the reference default 0.5 for shipped configs
                merged = _merge_c3(a, b, c_=int(r.args[1] * 0.5))
            elif r.module in ("SPPF", "SPP"):
                merged = _merge_spp(a, b, r.args[0] // 2, _spp_segments(r))
            else:
                merged = _merge_raw(a, b)
            tree[f"m{i}_{s+i}"] = merged
        out[col] = tree
    return out
