"""Full training driver — the counterpart of reference train.py:42-490 (train_rgb_ir).

Orchestrates: config load -> datasets/loaders -> model build -> (optional)
pretrained weight conversion -> anchor check -> SPMD train steps over a device
mesh -> per-epoch EMA evaluation -> results.csv -> last/best checkpoints ->
final strip. Differences from the reference are all TPU-shaped:

- one jitted step; the epoch loop is pure host orchestration
- DDP/NCCL -> jax.sharding data mesh (single host here; multi-host via
  jax.distributed.initialize would reuse the same program)
- AMP/GradScaler -> bf16 compute under fp32 params (optional)
- eval runs batched on device, not batch-1 (train.py:382)
"""

from __future__ import annotations

import csv
import dataclasses
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from icafusion_tpu.config import DataConfig, HypConfig, ModelConfig
from icafusion_tpu.data.datasets import PairedDetectionDataset
from icafusion_tpu.data.loader import PairedLoader
from icafusion_tpu.eval.evaluator import Evaluator
from icafusion_tpu.eval.metrics import fitness
from icafusion_tpu.models.assembler import build_model
from icafusion_tpu.parallel.mesh import (make_mesh, process_batch_slice,
                                         replicate_tree, shard_batch)
from icafusion_tpu.train.trainer import Trainer, scaled_size
from icafusion_tpu.utils.checkpoint import (load_checkpoint, restore_train_state,
                                            save_checkpoint, strip_checkpoint)
from icafusion_tpu.utils.general import colorstr, increment_path

RESULTS_HEADER = ["epoch", "lbox", "lobj", "lcls", "P", "R", "mAP50", "mAP",
                  "fitness", "lr", "time_s"]

# The reference's 29-key per-epoch row (train.py:398-411), consumed by its
# plot_results (plots.py:457-480). Written when FitConfig.results_format ==
# "reference"; the MR columns are zeros unless kaist_ann is set (the
# reference reserves them but has the computation disabled, test.py:260-285).
REFERENCE_RESULTS_KEYS = [
    "train/box_loss", "train/obj_loss", "train/cls_loss", "train/rank_loss",
    "TP", "FP", "FN", "F1", "metrics/precision", "metrics/recall",
    "metrics/mAP_0.5", "metrics/mAP_0.5:0.95",
    "val/box_loss", "val/obj_loss", "val/cls_loss", "val/rank_loss",
    "x/lr0", "x/lr1", "x/lr2",
    "MR_all", "MR_day", "MR_night", "MR_near", "MR_medium", "MR_far",
    "MR_none", "MR_partial", "MR_heavy", "Recall_all"]


def viable_train_scales(model, params, batch_stats, h, w, scales, log):
    """Drop multi-scale buckets the model cannot run at.

    A TransformerFusionBlock pools each stream to a fixed (vert, horz) anchor
    grid; when the scaled feature map is smaller than that grid the block has
    no valid pooling (the reference crashes the same way at runtime — its
    AdaptivePool2d passes the too-small map through, common.py:874-885, and
    the fixed-size positional-embedding add then fails). Here each candidate
    bucket is abstractly traced up front (jax.eval_shape — no compile, no
    FLOPs) and non-viable buckets are removed with a warning instead of
    aborting mid-epoch. The base 1.0 bucket is never dropped: if the model
    cannot run at the configured --img-size, that error should propagate.

    params/batch_stats may be concrete arrays or ShapeDtypeStructs."""
    keep = []
    for s in scales:
        if s == 1.0:
            keep.append(s)
            continue
        nh, nw = scaled_size(h, s), scaled_size(w, s)

        def fwd(p, bs):
            return model.apply(
                {"params": p, "batch_stats": bs},
                jnp.zeros((1, nh, nw, 3), jnp.float32),
                jnp.zeros((1, nh, nw, 3), jnp.float32),
                train=True, decode=False,
                rngs={"dropout": jax.random.PRNGKey(0)},
                mutable=["batch_stats"])

        try:
            jax.eval_shape(fwd, params, batch_stats)
            keep.append(s)
        except Exception as e:
            reason = str(e).splitlines()[0] if str(e) else type(e).__name__
            log(f"multi-scale: dropping x{s} bucket ({nh}x{nw}): {reason}")
    return tuple(keep)


class EpochMeter:
    """Device-side running sums of the per-step loss components.

    Adds are lazy jax ops (no host sync); means() syncs ONCE per epoch. The
    reference keeps a host-side running mloss (train.py:288-359); this is the
    same average without a device->host transfer per step."""
    KEYS = ("lbox", "lobj", "lcls", "loss")

    def __init__(self):
        self.sums = None   # lazy: first add adopts the metrics' (possibly
        self.n = 0         # multi-host replicated) sharding

    def add(self, metrics):
        s = jnp.stack([metrics[k] for k in self.KEYS])
        self.sums = s if self.sums is None else self.sums + s
        self.n += 1

    def means(self) -> np.ndarray:
        if self.sums is None:
            return np.zeros(len(self.KEYS))
        return (np.asarray(jax.device_get(self.sums), np.float64)
                / max(self.n, 1))


@dataclasses.dataclass
class FitConfig:
    model_cfg: ModelConfig
    data_cfg: DataConfig
    hyp: HypConfig
    epochs: int = 60
    batch_size: int = 8
    imgsz: int = 640
    project: str = "runs/train"
    name: str = "exp"
    seed: int = 0
    bf16: bool = False
    max_targets: int = 128
    eval_every: int = 1
    save_every: int = 1                  # last.ckpt save period (epochs)
    pretrained: Optional[str] = None     # reference .pt or our .ckpt
    resume: Optional[str] = None
    n_devices: Optional[int] = None
    workers: int = 8
    warmup_min_steps: int = 1000         # reference floor (train.py:264)
    autoanchor: bool = True              # check/evolve anchors (train.py:227-228)
    image_weights: bool = False          # class-aware resampling (train.py:267-278)
    multi_scale: bool = False            # bucketed size jitter (train.py:325-331)
    # gradient accumulation: A microbatches of batch_size per optimizer step
    # (reference nbs=64 rule, train.py:123-124). None/1 = off — on TPU the
    # native route to a 64-image effective batch is a bigger sharded batch,
    # not accumulation; pass accum_steps (or --accum auto) to reproduce the
    # reference's memory-constrained behavior exactly.
    accum_steps: Optional[int] = None
    # multi-host SPMD: jax.distributed.initialize() + process_index()==0
    # gating of csv/ckpt/print side effects (reference DDP env init + rank
    # gates, train.py:567-573, :71/:210/:289/:355/:375)
    distributed: bool = False
    # torch.optim.Adam instead of SGD (reference --adam, train.py:128-146);
    # betas=(hyp.momentum, 0.999), same 3 param groups
    adam: bool = False
    # stream-merged training (utils/stream_merge.py): run the first K RGB/IR
    # layer pairs as block-diagonal modules with masked gradients — exact
    # same training trajectory, sub-128-ch stages on full MXU lanes.
    # Checkpoints are written in the standard (unmerged) layout.
    merge_streams: int = 0
    # linear LR decay instead of one-cycle cosine (reference --linear-lr,
    # train.py:148-152)
    linear_lr: bool = False
    # substring-match parameter freeze — the reference's transfer-learning
    # hook (train.py:115-120; names in our layout, e.g. 'm0' or 'm23/cv3')
    freeze: tuple = ()
    # treat the dataset as single-class: every label becomes class 0
    # (reference --single-cls, train.py / datasets.py:393); pair with a
    # model_cfg/data_cfg resolved at nc=1 — cli/train.py does both
    single_cls: bool = False
    # only save checkpoints on the final epoch (reference --nosave,
    # train.py:384 `if (not opt.nosave) or final_epoch`)
    nosave: bool = False
    # only run eval on the final epoch (reference --notest, train.py:370)
    notest: bool = False
    # results.csv layout: "native" (11-col) or "reference" — the reference's
    # epoch + 29-key row (train.py:398-411), parseable by its plot_results
    # unmodified; val losses are computed from the eval forward's raw fmaps.
    results_format: str = "native"
    # KAIST annotation json: per-epoch eval also writes the MR submission txts
    # and populates the 9 MR + recall columns of the reference-format row
    # (the plumbing the reference reserves at train.py:398-411/test.py:260-285)
    kaist_ann: Optional[str] = None


def fit(cfg: FitConfig) -> dict:
    if cfg.distributed and jax.process_count() == 1:
        # multi-host launch: same SPMD program spans hosts over DCN
        # (replaces torch.distributed.launch env contract, train.py:567-573)
        jax.distributed.initialize()
    # non-zero ranks run the identical SPMD program but write/print nothing
    # (reference `rank in [-1, 0]` gates train.py:71/:210/:289/:355/:375)
    is_main = jax.process_index() == 0
    n_proc = jax.process_count()
    log = print if is_main else (lambda *a, **k: None)

    run_dir = increment_path(Path(cfg.project) / cfg.name)
    if n_proc > 1:
        # every process must agree on the run dir (increment_path races with
        # process 0's mkdir otherwise) — broadcast process 0's choice, the
        # counterpart of the reference's rank-0-first barrier
        # (torch_distributed_zero_first, torch_utils.py:27-36)
        from jax.experimental import multihost_utils
        buf = np.zeros(512, np.uint8)
        raw = str(run_dir).encode()
        buf[:len(raw)] = np.frombuffer(raw, np.uint8)
        buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
        run_dir = Path(bytes(buf[buf != 0]).decode())
    wdir = run_dir / "weights"
    if is_main:
        wdir.mkdir(parents=True, exist_ok=True)
    log(colorstr("run dir: ") + str(run_dir))

    # reproducibility artifacts (reference train.py:56-59 re-serializes hyp/opt)
    import dataclasses as _dc
    import json as _json
    import sys as _sys
    import yaml as _yaml
    if is_main:
        (run_dir / "hyp.yaml").write_text(_yaml.safe_dump(cfg.hyp.as_dict()))
        opt_payload = {k: v for k, v in _dc.asdict(cfg).items()
                       if k not in ("model_cfg", "data_cfg", "hyp")}
        (run_dir / "opt.json").write_text(
            _json.dumps(opt_payload, indent=2, default=str))
    if is_main and len(_sys.argv) > 1:
        argv, skip = [], False
        for a in _sys.argv[1:]:
            if skip:
                skip = False
                continue
            if a == "--resume":
                skip = True
                continue
            argv.append(a)
        (run_dir / "train_args.txt").write_text(" ".join(argv))

    # --- data ---
    root = Path(cfg.data_cfg.path)
    # per-process label-cache dirs: no cross-process write races, no barrier
    # needed (replaces the reference's rank-0-first caching guard,
    # datasets.py:105 / torch_utils.py:27-36)
    cache_dir = str(run_dir / (".cache" if n_proc == 1
                               else f".cache_p{jax.process_index()}"))
    train_ds = PairedDetectionDataset(
        str(root / cfg.data_cfg.train_rgb), str(root / cfg.data_cfg.train_ir),
        img_size=cfg.imgsz, hyp=cfg.hyp, augment=True, nc=cfg.data_cfg.nc,
        cache_dir=cache_dir, single_cls=cfg.single_cls)
    val_ds = PairedDetectionDataset(
        str(root / cfg.data_cfg.val_rgb), str(root / cfg.data_cfg.val_ir),
        img_size=cfg.imgsz, hyp=cfg.hyp, augment=False, nc=cfg.data_cfg.nc,
        cache_dir=cache_dir, single_cls=cfg.single_cls)
    from icafusion_tpu.utils.general import labels_to_class_weights
    class_w = labels_to_class_weights(train_ds.labels, cfg.data_cfg.nc)

    # observability: TB facade + label-distribution plot at start
    # (reference SummaryWriter train.py:586, plot_labels train.py:222/plots.py:330)
    from icafusion_tpu.utils.loggers import Loggers
    loggers = Loggers(run_dir, enable_tb=is_main)
    names = list(cfg.data_cfg.names or [])
    try:
        if is_main and any(len(l) for l in train_ds.labels):
            from icafusion_tpu.utils.plots import plot_labels
            plot_labels(train_ds.labels, names, run_dir)
    except Exception as e:  # plotting must never kill training
        log(f"plot_labels failed: {e}")
    # gradient accumulation: the loader yields A*B samples per optimizer step;
    # the jitted step scans A microbatches of B (trainer.py make_train_step)
    accum = max(int(cfg.accum_steps or 1), 1)
    # the data mesh spans every process's devices; with n_proc > 1 each
    # process's loader materializes only its contiguous row range of every
    # global batch (the DistributedSampler counterpart — datasets.py:119)
    mesh = make_mesh(cfg.n_devices)
    local_rows = None
    if n_proc > 1:
        local_rows = process_batch_slice(cfg.batch_size * accum, mesh)
        log(f"multi-process SPMD: {n_proc} processes x "
            f"{jax.local_device_count()} devices; this process feeds rows "
            f"{local_rows} of each global {cfg.batch_size * accum}-batch")
    loader = PairedLoader(train_ds, batch_size=cfg.batch_size * accum,
                          max_targets=cfg.max_targets, seed=cfg.seed,
                          num_workers=cfg.workers,
                          image_weights=cfg.image_weights, class_weights=class_w,
                          local_rows=local_rows)
    val_loader = PairedLoader(val_ds, batch_size=cfg.batch_size, shuffle=False,
                              num_workers=cfg.workers)

    # --- anchors (train.py:227-228) ---
    model_cfg = cfg.model_cfg
    if cfg.autoanchor:
        from icafusion_tpu.config import with_anchors
        from icafusion_tpu.train.autoanchor import maybe_autoanchor
        anchors_px = np.asarray(model_cfg.anchors, np.float32).reshape(
            model_cfg.nl, -1, 2)
        new_anchors, changed = maybe_autoanchor(train_ds, anchors_px, cfg.imgsz,
                                                thr=cfg.hyp.anchor_t)
        if changed:
            model_cfg = with_anchors(model_cfg, new_anchors)
            log("autoanchor: updated model anchors")

    # --- model + trainer ---
    dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32
    model = build_model(model_cfg, dtype=dtype)
    trainer = Trainer(model=model, hyp=cfg.hyp, epochs=cfg.epochs,
                      steps_per_epoch=loader.steps_per_epoch,
                      batch_size=cfg.batch_size, imgsz=cfg.imgsz,
                      warmup_min_steps=cfg.warmup_min_steps,
                      accum_steps=accum, adam=cfg.adam,
                      linear_lr=cfg.linear_lr, freeze=tuple(cfg.freeze))

    sample = next(iter(loader.epoch(0)))
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed),
                               sample["rgb"][:1].astype(np.float32),
                               sample["ir"][:1].astype(np.float32))

    if cfg.freeze:
        # reference prints each frozen parameter (train.py:118-120)
        from icafusion_tpu.train.optim import _is_frozen, _path_str
        paths = [p for p, _ in
                 jax.tree_util.tree_flatten_with_path(state.params)[0]]
        frozen = [_path_str(p) for p in paths
                  if _is_frozen(p, tuple(cfg.freeze))]
        assert frozen, f"--freeze {cfg.freeze} matched no parameters"
        for k in frozen:
            log(f"freezing {k}")
        log(f"frozen: {len(frozen)}/{len(paths)} params")

    if cfg.pretrained:
        state = _load_pretrained(cfg.pretrained, state, model)
    start_epoch, best_fit = 0, 0.0
    if cfg.resume:
        ckpt = load_checkpoint(cfg.resume)
        state = restore_train_state(ckpt, state)
        start_epoch = int(ckpt["meta"]["epoch"]) + 1
        best_fit = float(ckpt["meta"]["best_fitness"])
        log(f"resumed from {cfg.resume} at epoch {start_epoch}")

    # --- stream-merged training (optional) ---
    merge_k = int(cfg.merge_streams or 0)
    gmask = None
    if merge_k:
        from icafusion_tpu.utils.stream_merge import (grad_mask,
                                                      merge_train_state)
        state = merge_train_state(model_cfg, state, merge_k)
        model = build_model(model_cfg, dtype=dtype, merge_pairs=merge_k)
        # re-runs __post_init__; every other Trainer knob stays in lockstep
        trainer = dataclasses.replace(trainer, model=model)
        gmask = jax.tree.map(jnp.asarray,
                             grad_mask(model_cfg, state.params, merge_k))
        log(f"stream-merge: first {merge_k} RGB/IR layer pairs run block-"
            "diagonal with masked grads (identical trajectory, full MXU lanes)")

    # --- SPMD step over the data mesh ---
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))
    state = replicate_tree(state, mesh)

    def make_step(scale: float):
        raw_step = trainer.make_train_step(scale=scale, grad_mask=gmask)

        def step_u8(st, rgb, ir, t, m):
            return raw_step(st, rgb.astype(jnp.float32) / 255.0,
                            ir.astype(jnp.float32) / 255.0, t, m)

        return jax.jit(step_u8,
                       in_shardings=(repl, data_sh, data_sh, data_sh, data_sh),
                       out_shardings=(repl, repl), donate_argnums=(0,))

    # multi-scale: a small bucket of precompiled sizes replaces the reference's
    # random per-batch size (train.py:325-331) — dynamic shapes don't exist
    # under XLA, and each bucket costs one compile of the full step
    scales = (0.75, 0.875, 1.0, 1.125, 1.25) if cfg.multi_scale else (1.0,)
    if cfg.multi_scale:
        scales = viable_train_scales(model, state.params, state.batch_stats,
                                     sample["rgb"].shape[1],
                                     sample["rgb"].shape[2], scales, log)
    steps = {s: make_step(s) for s in scales}
    step = steps[1.0]
    scale_rng = np.random.default_rng(cfg.seed + 1)

    if n_proc > 1:
        # Cross-process collective contexts (gloo on CPU test clusters) are
        # established at the step's FIRST EXECUTION with a short rendezvous
        # timeout; if one process is still compiling while another already
        # executes, the rendezvous expires (measured: a 2m45s XLA compile vs
        # gloo's 30s). So AOT-compile every bucket on every process first,
        # then rendezvous via the gRPC coordination service (generous
        # timeout, no device collective) so first executions land together.
        B = cfg.batch_size * accum
        H, W = sample["rgb"].shape[1], sample["rgb"].shape[2]
        sds = [jax.ShapeDtypeStruct((B, H, W, 3), jnp.uint8),
               jax.ShapeDtypeStruct((B, H, W, 3), jnp.uint8),
               jax.ShapeDtypeStruct((B, cfg.max_targets, 5), jnp.float32),
               jax.ShapeDtypeStruct((B, cfg.max_targets), jnp.bool_)]
        # rebind each bucket to its COMPILED executable — the jit wrapper
        # would re-trace + reload from the persistent cache at first call,
        # and that skew alone can exceed the rendezvous window
        steps = {s: steps[s].lower(state, *sds).compile() for s in scales}
        step = steps[1.0]
        from jax._src import distributed as _distributed
        client = _distributed.global_state.client
        if client is not None:
            client.wait_at_barrier(f"icafusion_fit_compiled_{run_dir.name}",
                                   60 * 60 * 1000)
        log("multi-process: train step AOT-compiled on all processes, "
            "rendezvous complete")

    ref_csv = cfg.results_format == "reference"
    evaluator = Evaluator(model=model, nc=cfg.data_cfg.nc,
                          loss_fn=trainer.loss_fn if ref_csv else None,
                          max_targets=cfg.max_targets)

    def ckpt_view(st):
        """Checkpoints always carry the standard layout: unmerge before write
        (momentum/EMA zero blocks are exactly zero, so this is lossless)."""
        if not merge_k:
            return st
        from icafusion_tpu.utils.stream_merge import unmerge_train_state
        return unmerge_train_state(model_cfg, st, merge_k)

    results_csv = run_dir / "results.csv"
    if is_main and not results_csv.exists():
        with open(results_csv, "w", newline="") as f:
            if ref_csv:
                # exact reference header semantics (train.py:407-409)
                n = len(REFERENCE_RESULTS_KEYS) + 1
                f.write((("%s," * n) % tuple(["epoch"] + REFERENCE_RESULTS_KEYS)
                         ).rstrip(",") + "\n")
            else:
                csv.writer(f).writerow(RESULTS_HEADER)

    final = {}
    for epoch in range(start_epoch, cfg.epochs):
        t0 = time.time()
        meter = EpochMeter()
        def put(b):
            # async H2D: dispatch uploads ahead so they stream while the previous
            # step computes (device_put returns before the transfer completes).
            # Multi-process: b holds this process's rows; shard_batch assembles
            # the global array via make_array_from_process_local_data.
            return shard_batch((b["rgb"], b["ir"], b["targets"], b["mask"]),
                               mesh)

        assert loader.steps_per_epoch > 0, "dataset smaller than one batch"
        it = iter(loader.epoch(epoch))
        pending = None
        n_plotted = 0
        for batch in it:
            # first-3-batch training mosaics (reference train.py:361-365)
            if is_main and epoch == start_epoch and n_plotted < 3:
                try:
                    from icafusion_tpu.utils.plots import plot_images
                    plot_images(batch["rgb"], batch["targets"], batch["mask"],
                                run_dir / f"train_batch{n_plotted}.jpg", names)
                except Exception as e:
                    log(f"plot_images failed: {e}")
                n_plotted += 1
            nxt = put(batch)
            if pending is None:
                pending = nxt
                continue
            cur, pending = pending, nxt
            if cfg.multi_scale:
                step = steps[scales[scale_rng.integers(len(scales))]]
            state, metrics = step(state, *cur)
            meter.add(metrics)
        if pending is not None:  # last prefetched batch
            if cfg.multi_scale:
                step = steps[scales[scale_rng.integers(len(scales))]]
            state, metrics = step(state, *pending)
            meter.add(metrics)
        means = meter.means()
        lr_now = float(metrics["lr"])

        ev = {"mp": 0, "mr": 0, "map50": 0, "map": 0}
        mr_vals = [0.0] * 10
        last_epoch = epoch == cfg.epochs - 1
        # eval is main-process-only (reference rank-0 gate, train.py:379);
        # fetching the replicated EMA works on any process, but duplicating
        # the whole val pass N times buys nothing
        if is_main and (((epoch + 1) % cfg.eval_every == 0 and not cfg.notest)
                        or last_epoch):
            ema_vars = jax.device_get(state.ema.tree)
            # final epoch also emits PR/F1/P/R curves + confusion matrix
            # (reference test.py plots at final eval, train.py:454-473)
            ev = evaluator.run(ema_vars, val_loader.val_batches(), cfg.imgsz,
                               confusion=last_epoch, names=names,
                               mr_txt_dir=str(run_dir / "mr_txt")
                               if (cfg.kaist_ann and is_main) else None,
                               plots_dir=str(run_dir)
                               if (last_epoch and is_main) else None)
            if cfg.kaist_ann and is_main:
                # per-epoch KAIST MR columns (the slots the reference reserves
                # at train.py:398-411 with the computation disabled)
                try:
                    from icafusion_tpu.eval.kaist import evaluate_kaist
                    kr = evaluate_kaist(cfg.kaist_ann,
                                        str(run_dir / "mr_txt" / "result.txt"))
                    mr_vals = [kr.MR_all, kr.MR_day, kr.MR_night, kr.MR_near,
                               kr.MR_medium, kr.MR_far, kr.MR_none,
                               kr.MR_partial, kr.MR_heavy, kr.recall_all]
                except Exception as e:
                    log(f"KAIST MR eval failed: {e}")
            fit_val = fitness(np.array([0, 0, 0, 0, ev["mp"], ev["mr"],
                                        ev["map50"], ev["map"]]))
            if fit_val > best_fit:
                best_fit = fit_val
                if is_main and (not cfg.nosave or last_epoch):
                    save_checkpoint(wdir / "best.ckpt", ckpt_view(state), epoch, best_fit,
                                    background=True)
        if is_main and (not cfg.nosave or epoch == cfg.epochs - 1) \
                and ((epoch + 1) % cfg.save_every == 0
                     or epoch == cfg.epochs - 1):
            save_checkpoint(wdir / "last.ckpt", ckpt_view(state), epoch, best_fit,
                            background=True)

        dt = time.time() - t0
        if not is_main:
            final = ev
            continue
        with open(results_csv, "a", newline="") as f:
            if ref_csv:
                val_items = list(ev.get("val_loss_items", [0.0] * 4))
                vals = ([*means[:3], 0.0,                     # train losses
                         ev.get("tp", 0.0), ev.get("fp", 0.0),
                         ev.get("fn", 0.0), ev.get("f1", 0.0),
                         ev["mp"], ev["mr"], ev["map50"], ev["map"],
                         *val_items,                          # val losses
                         lr_now, lr_now, lr_now,              # x/lr0-2
                         *mr_vals])
                n = len(vals) + 1
                f.write((("%g," * n) % tuple([epoch] + vals)).rstrip(",")
                        + "\n")
            else:
                csv.writer(f).writerow(
                    [epoch, *[f"{x:.5f}" for x in means[:3]],
                     f"{ev['mp']:.5f}", f"{ev['mr']:.5f}", f"{ev['map50']:.5f}",
                     f"{ev['map']:.5f}", f"{best_fit:.5f}", f"{lr_now:.6f}",
                     f"{dt:.1f}"])
        loggers.log_scalars(
            {"train/box_loss": means[0], "train/obj_loss": means[1],
             "train/cls_loss": means[2], "train/loss": means[3],
             "metrics/precision": ev["mp"], "metrics/recall": ev["mr"],
             "metrics/mAP_0.5": ev["map50"], "metrics/mAP_0.5:0.95": ev["map"],
             "x/lr": lr_now}, epoch)
        log(f"epoch {epoch}/{cfg.epochs - 1}: loss={means[3]:.4f} "
              f"mAP50={ev['map50']:.4f} best={best_fit:.4f} ({dt:.0f}s)")
        final = ev

    if is_main:
        from icafusion_tpu.utils.checkpoint import wait_pending_saves
        wait_pending_saves()  # background writers must land before strip/read
        strip_checkpoint(wdir / "best.ckpt" if (wdir / "best.ckpt").exists()
                         else wdir / "last.ckpt", wdir / "stripped.ckpt")
    try:  # results.png + confusion png (reference plot_results plots.py:457)
        from icafusion_tpu.utils.plots import plot_confusion_matrix, plot_results
        if is_main:
            plot_results(results_csv)
        if is_main and isinstance(final.get("cm"), np.ndarray):
            plot_confusion_matrix(final["cm"], names,
                                  run_dir / "confusion_matrix.png")
    except Exception as e:
        log(f"final plots failed: {e}")
    loggers.close()
    final.pop("cm", None)
    final["best_fitness"] = best_fit
    final["run_dir"] = str(run_dir)
    return final


def _load_pretrained(path: str, state, model):
    """Reference .pt (converted, incl. stream remap) or our .ckpt."""
    from icafusion_tpu.utils.torch_convert import (convert_state_dict,
                                                   load_torch_checkpoint,
                                                   remap_single_stream_to_two_stream)
    if path.endswith(".pt"):
        sd = load_torch_checkpoint(path)
        if not any(k.startswith("model.10.") for k in sd):
            sd = remap_single_stream_to_two_stream(sd)
        variables, unused = convert_state_dict(
            sd, {"params": state.params, "batch_stats": state.batch_stats},
            strict=False)
        print(f"pretrained: converted {path} ({len(unused)} unused ref keys)")
        return state.replace(params=variables["params"],
                             batch_stats=variables["batch_stats"])
    ckpt = load_checkpoint(path)
    tree = ckpt.get("ema_tree", ckpt)
    return state.replace(
        params=jax.tree.map(lambda a, b: np.asarray(b, np.float32),
                            state.params, tree["params"]),
        batch_stats=jax.tree.map(lambda a, b: np.asarray(b, np.float32),
                                 state.batch_stats, tree["batch_stats"]))
