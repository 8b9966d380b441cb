"""Training CLI — counterpart of reference train.py:493-588.

    python -m icafusion_tpu.cli.train --cfg zoo:tfb:s \
        --data /root/reference/data/multispectral/FLIR-align-3class.yaml \
        --hyp /root/reference/data/hyp.scratch.yaml --epochs 60 --batch-size 8
"""

from __future__ import annotations

import argparse

from icafusion_tpu.cli._common import resolve_model_config, setup_jax


def parse_args(argv=None):
    ap = argparse.ArgumentParser("icafusion-train")
    ap.add_argument("--cfg", required=True, help="model yaml or zoo:<fusion>:<scale>")
    ap.add_argument("--data", required=True, help="dataset yaml")
    ap.add_argument("--hyp", default=None, help="hyperparameter yaml")
    ap.add_argument("--weights", default=None, help="pretrained .pt or .ckpt")
    ap.add_argument("--resume", default=None, help="checkpoint to resume from")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--project", default="runs/train")
    ap.add_argument("--name", default="exp")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--bf16", action="store_true", help="bf16 compute (AMP analog)")
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--eval-every", type=int, default=1)
    ap.add_argument("--devices", type=int, default=None,
                    help="number of mesh devices (default: all)")
    ap.add_argument("--save-every", type=int, default=1)
    ap.add_argument("--warmup-min", type=int, default=1000,
                    help="warmup floor in iterations (reference: 1000)")
    ap.add_argument("--multi-scale", action="store_true",
                    help="bucketed multi-scale training (compiles 5 step sizes)")
    ap.add_argument("--image-weights", action="store_true",
                    help="class-aware image resampling per epoch")
    ap.add_argument("--noautoanchor", action="store_true")
    ap.add_argument("--accum", default=None,
                    help="gradient accumulation: an integer, or 'auto' for the "
                         "reference nbs=64 rule (train.py:123-124)")
    ap.add_argument("--freeze", nargs="+", default=[], metavar="NAME",
                    help="freeze parameters whose /-joined path contains any "
                         "NAME (substring, like the reference's freeze hook, "
                         "train.py:115-120). Anchor at the top level with a "
                         "leading slash: '/m0/' freezes layer 0 only, while "
                         "bare 'm0' also hits C3-internal m0 bottlenecks; "
                         "every frozen param is printed")
    ap.add_argument("--adam", action="store_true",
                    help="Adam optimizer, betas=(momentum, 0.999) "
                         "(reference train.py:128-146)")
    ap.add_argument("--evolve", type=int, default=0, metavar="N",
                    help="evolve hyperparameters for N generations of short "
                         "runs (reference GA, train.py:590-670)")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host SPMD: jax.distributed.initialize() + "
                         "process_index()==0 side-effect gating")
    ap.add_argument("--merge-streams", default="0", metavar="K",
                    help="stream-merged training: run the first K RGB/IR "
                         "layer pairs block-diagonal with masked grads — "
                         "identical trajectory, full MXU lanes on sub-128-ch "
                         "stages (utils/stream_merge.py); checkpoints keep "
                         "the standard layout")
    ap.add_argument("--linear-lr", action="store_true",
                    help="linear LR decay instead of one-cycle cosine "
                         "(reference train.py:148-152)")
    ap.add_argument("--label-smoothing", type=float, default=0.0,
                    metavar="EPS",
                    help="BCE target smoothing epsilon (reference "
                         "train.py:231, loss.py:15-17)")
    ap.add_argument("--single-cls", action="store_true",
                    help="train as a single-class dataset: labels collapse "
                         "to class 0, model built with nc=1 (reference "
                         "train.py:523, datasets.py:393)")
    ap.add_argument("--nosave", action="store_true",
                    help="only save checkpoints on the final epoch "
                         "(reference train.py:384)")
    ap.add_argument("--notest", action="store_true",
                    help="only run eval on the final epoch "
                         "(reference train.py:370)")
    ap.add_argument("--results-format", default="native",
                    choices=["native", "reference"],
                    help="results.csv layout; 'reference' writes the "
                         "reference's epoch + 29-key row (train.py:398-411), "
                         "parseable by its plot_results unmodified")
    ap.add_argument("--kaist-ann", default=None, metavar="JSON",
                    help="KAIST annotation json: per-epoch eval writes MR "
                         "submission txts and fills the reference-format "
                         "row's 9 MR + recall columns")
    return ap.parse_args(argv)


def resolve_accum(accum, batch_size: int, nbs: int = 64) -> int:
    """'auto' -> reference rule max(round(nbs / batch), 1) (train.py:123-124)."""
    if accum in (None, "", "none"):
        return 1
    if str(accum).lower() == "auto":
        return max(round(nbs / batch_size), 1)
    return max(int(accum), 1)


def main(argv=None):
    args = parse_args(argv)
    setup_jax()
    from icafusion_tpu.config import load_data_config, load_hyp_config
    from icafusion_tpu.train.fit import FitConfig, fit
    from icafusion_tpu.utils.general import check_img_size, init_seeds
    from icafusion_tpu.utils.stream_merge import resolve_merge

    init_seeds(args.seed)
    data_cfg = load_data_config(args.data)
    hyp = load_hyp_config(args.hyp)
    if args.label_smoothing:
        # reference train.py:231: hyp['label_smoothing'] = opt.label_smoothing
        hyp = hyp.replace(label_smoothing=args.label_smoothing)
    if args.single_cls:
        # one merged class; the reference keeps the dataset's own name when it
        # already has exactly one class (train.py:82 `names = ['item'] if
        # opt.single_cls and len(data_dict['names']) != 1 else ...`)
        import dataclasses as _dc
        names = (tuple(data_cfg.names) if data_cfg.names
                 and len(data_cfg.names) == 1 else ("item",))
        data_cfg = _dc.replace(data_cfg, nc=1, names=names)
    model_cfg = resolve_model_config(args.cfg, nc=data_cfg.nc)
    imgsz = check_img_size(args.img_size, 32)

    def make_cfg(hyp_cfg, name=None, epochs=None):
        return FitConfig(
            model_cfg=model_cfg, data_cfg=data_cfg, hyp=hyp_cfg,
            epochs=epochs or args.epochs, batch_size=args.batch_size,
            imgsz=imgsz, project=args.project, name=name or args.name,
            seed=args.seed, bf16=args.bf16, workers=args.workers,
            eval_every=args.eval_every, pretrained=args.weights,
            resume=args.resume, n_devices=args.devices,
            save_every=args.save_every, warmup_min_steps=args.warmup_min,
            multi_scale=args.multi_scale, image_weights=args.image_weights,
            autoanchor=not args.noautoanchor,
            accum_steps=resolve_accum(args.accum, args.batch_size),
            distributed=args.distributed, adam=args.adam,
            merge_streams=resolve_merge(args.merge_streams, model_cfg),
            results_format=args.results_format, kaist_ann=args.kaist_ann,
            linear_lr=args.linear_lr, single_cls=args.single_cls,
            nosave=args.nosave, notest=args.notest,
            freeze=tuple(args.freeze))

    if args.evolve:
        # GA over the hyp space: each generation is a short fit() run scored
        # by fitness = mAP@0.5 (reference train.py:590-670)
        import yaml
        from pathlib import Path
        from icafusion_tpu.train.evolve import evolve
        gen = [0]

        def train_fn(hyp_cand):
            gen[0] += 1
            r = fit(make_cfg(hyp_cand, name=f"{args.name}_evolve{gen[0]}"))
            return r.get("best_fitness", 0.0)

        best = evolve(train_fn, hyp, generations=args.evolve,
                      log_path=str(Path(args.project) / "evolve.csv"),
                      seed=args.seed)
        out = Path(args.project) / "hyp_evolved.yaml"
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(yaml.safe_dump(best.as_dict()))
        # value-vs-fitness scatter per hyp (reference train.py:667 ->
        # plots.py:378-400)
        from icafusion_tpu.utils.plots import plot_evolution
        png = plot_evolution(Path(args.project) / "evolve.csv")
        print(f"evolve done: best hyp -> {out} (plot: {png})")
        return best

    result = fit(make_cfg(hyp))
    print(f"done: mAP50={result.get('map50', 0):.4f} "
          f"best_fitness={result.get('best_fitness', 0):.4f} "
          f"run={result.get('run_dir')}")
    return result


if __name__ == "__main__":
    main()
