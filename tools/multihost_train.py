"""Multi-process (multi-host) SPMD training proof — a REAL 2-process cluster run.

The reference's DDP genuinely runs N processes (NCCL init train.py:567-573,
DistributedSampler per-rank data sharding datasets.py:119, rank-0-first cache
barrier torch_utils.py:27-36, rank-0 eval/ckpt gates). This tool proves the
TPU-native counterpart executes for real — not a monkeypatch:

1. generates a small synthetic paired dataset;
2. runs the FULL fit() driver as a 1-process baseline over 2*D virtual CPU
   devices (XLA_FLAGS=--xla_force_host_platform_device_count);
3. runs the SAME fit() as a genuine 2-process JAX cluster
   (jax.distributed.initialize over a localhost coordinator, D virtual CPU
   devices per process — default D=2; this 1-CPU container schedules every
   virtual device's compute plus the gloo rendezvous threads on one core,
   and 8 ranks can starve gloo's 30s context-init window — real pods use
   ICI/DCN, not gloo, so the cap is a test-harness property, not a framework
   one — Gloo cross-process collectives) — per-process dataset
   sharding (PairedLoader.local_rows), global batch assembly via
   jax.make_array_from_process_local_data (parallel/mesh.shard_batch),
   replicated state via make_array_from_callback, process-0-only csv/ckpt/eval;
4. compares the two runs' per-epoch loss columns — the global batches are
   row-identical by construction (sample RNG keyed on dataset index, shared
   permutation seed), so losses must agree to collective-reduction-order noise.

Writes MULTIHOST json: per-epoch rows of both runs + max abs loss delta.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python tools/multihost_train.py \
          [--epochs 3] [--n 64] [--write-json MULTIHOST_r05.json]
Used by tests/test_multihost.py (slow marker).
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def probe_main(args):
    """Per-STEP full-precision loss probe: Trainer + PairedLoader + the mesh
    helpers directly, N steps of epoch 0. The strict instrument — before
    training dynamics can amplify collective-reduction-order noise, the
    1x(2D) and 2xD losses must agree to float32 epsilon levels."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    if args.num_processes > 1:
        jax.distributed.initialize(coordinator_address=args.coordinator,
                                   num_processes=args.num_processes,
                                   process_id=args.process_id)
    sys.path.insert(0, str(ROOT))
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from icafusion_tpu.config import DataConfig, load_hyp_config
    from icafusion_tpu.data.datasets import PairedDetectionDataset
    from icafusion_tpu.data.loader import PairedLoader
    from icafusion_tpu.models import build_model
    from icafusion_tpu.models.zoo import tiny_icafusion_config
    from icafusion_tpu.parallel.mesh import (make_mesh, process_batch_slice,
                                             replicate_tree, shard_batch)
    from icafusion_tpu.train.trainer import Trainer

    if args.expect_devices:
        assert jax.device_count() == args.expect_devices, jax.devices()
    work = Path(args.workdir)
    hyp = load_hyp_config(None).replace(mosaic=0.5, warmup_epochs=1.0)
    ds = PairedDetectionDataset(str(work / "data/visible/train"),
                                str(work / "data/infrared/train"),
                                img_size=64, hyp=hyp, augment=True, nc=3)
    mesh = make_mesh()
    B = args.batch
    local = process_batch_slice(B, mesh) if args.num_processes > 1 else None
    loader = PairedLoader(ds, batch_size=B, max_targets=16, seed=0,
                          num_workers=2, local_rows=local)
    model = build_model(tiny_icafusion_config(nc=3))
    trainer = Trainer(model=model, hyp=hyp, epochs=1,
                      steps_per_epoch=loader.steps_per_epoch, batch_size=B,
                      imgsz=64, warmup_min_steps=10)
    state = trainer.init_state(jax.random.PRNGKey(0),
                               np.zeros((1, 64, 64, 3), np.float32),
                               np.zeros((1, 64, 64, 3), np.float32))
    state = replicate_tree(state, mesh)
    repl, data = NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))
    raw = trainer.make_train_step()

    def step_u8(st, rgb, ir, t, m):
        return raw(st, rgb.astype(jnp.float32) / 255.0,
                   ir.astype(jnp.float32) / 255.0, t, m)

    step = jax.jit(step_u8, in_shardings=(repl, data, data, data, data),
                   out_shardings=(repl, repl), donate_argnums=(0,))
    if args.num_processes > 1:
        # same compile-skew guard as fit(): AOT-compile, then rendezvous via
        # the coordination service BEFORE the first execution — gloo's
        # context-init rendezvous at first execution is only ~30 s, and a
        # warm-vs-cold compile cache across processes blows it
        sds = [jax.ShapeDtypeStruct((B, 64, 64, 3), jnp.uint8),
               jax.ShapeDtypeStruct((B, 64, 64, 3), jnp.uint8),
               jax.ShapeDtypeStruct((B, 16, 5), jnp.float32),
               jax.ShapeDtypeStruct((B, 16), jnp.bool_)]
        # rebind to the COMPILED executable: calling the jit wrapper would
        # re-trace and re-load from the persistent cache at first call, and
        # that deserialization skew alone can blow the 30s window
        step = step.lower(state, *sds).compile()
        from jax._src import distributed as _dist
        _dist.global_state.client.wait_at_barrier("icafusion_probe_compiled",
                                                  60 * 60 * 1000)
    losses = []
    for i, b in enumerate(loader.epoch(0)):
        if i >= args.probe_steps:
            break
        gb = shard_batch((b["rgb"], b["ir"], b["targets"], b["mask"]), mesh)
        state, metrics = step(state, *gb)
        losses.append(float(metrics["loss"]))
    if jax.process_index() == 0:
        out = work / f"probe_{'mp' if args.num_processes > 1 else 'base'}.json"
        out.write_text(json.dumps(losses))
        print(f"probe losses -> {out}: {losses}")


def worker_main(args):
    """One fit() run. --num-processes 2 makes this a real cluster member."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    if args.num_processes > 1:
        jax.distributed.initialize(coordinator_address=args.coordinator,
                                   num_processes=args.num_processes,
                                   process_id=args.process_id)
    sys.path.insert(0, str(ROOT))
    import numpy as np

    from icafusion_tpu.config import DataConfig, load_hyp_config
    from icafusion_tpu.models.zoo import tiny_icafusion_config
    from icafusion_tpu.train.fit import FitConfig, fit

    if args.expect_devices:
        assert jax.device_count() == args.expect_devices, jax.devices()
    assert jax.process_count() == args.num_processes

    work = Path(args.workdir)
    data_cfg = DataConfig(nc=3, names=("red", "green", "blue"),
                          path=str(work / "data"),
                          train_rgb="visible/train", val_rgb="visible/val",
                          train_ir="infrared/train", val_ir="infrared/val")
    hyp = load_hyp_config(None).replace(mosaic=0.5, warmup_epochs=1.0)
    result = fit(FitConfig(
        model_cfg=tiny_icafusion_config(nc=3), data_cfg=data_cfg, hyp=hyp,
        epochs=args.epochs, batch_size=args.batch, imgsz=64,
        project=str(work / "runs"), name=args.run_name, seed=0,
        eval_every=10 ** 6, max_targets=16, workers=2, warmup_min_steps=10))
    if jax.process_index() == 0:
        print(f"worker done: run={result['run_dir']} "
              f"map50={result.get('map50', 0):.4f}")


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def launch(env_extra, argv, log_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{ROOT}:{env.get('PYTHONPATH', '')}"
    env["JAX_PLATFORMS"] = "cpu"
    env.update(env_extra)
    logf = open(log_path, "w")
    return subprocess.Popen([sys.executable, __file__, *argv],
                            stdout=logf, stderr=subprocess.STDOUT, env=env), logf


def read_losses(csv_path: Path):
    rows = []
    for line in csv_path.read_text().splitlines()[1:]:
        c = line.split(",")
        rows.append({"epoch": int(c[0]), "lbox": float(c[1]),
                     "lobj": float(c[2]), "lcls": float(c[3])})
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--coordinator", default="")
    ap.add_argument("--run-name", default="exp")
    ap.add_argument("--workdir", default=str(ROOT / "runs" / "multihost"))
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--local-devices", type=int, default=2,
                    help="virtual CPU devices per cluster process (total = "
                         "2x this; kept small — this 1-CPU host runs every "
                         "virtual device's compute AND the gloo rendezvous "
                         "threads on one core, and 8 ranks can starve the "
                         "30s context-init window)")
    ap.add_argument("--expect-devices", type=int, default=0)
    ap.add_argument("--probe", action="store_true",
                    help="(worker) per-step probe mode instead of full fit()")
    ap.add_argument("--probe-steps", type=int, default=5)
    ap.add_argument("--tol", type=float, default=1e-3,
                    help="max abs per-EPOCH loss delta for the fit() runs. "
                         "Cross-process Gloo all-reduce sums in a different "
                         "order than the single-process reduction; the "
                         "~1e-7-per-step float32 noise compounds through SGD/"
                         "BN updates over an epoch (measured: exact at epoch "
                         "0, ~3e-4 by epoch 1). The strict equality check is "
                         "the per-STEP probe (--probe-tol).")
    ap.add_argument("--probe-tol", type=float, default=2e-4,
                    help="max abs loss delta over the first probe steps "
                         "(reduction-order noise compounds chaotically "
                         "through SGD/BN: measured 1.2e-7 at step 1 growing "
                         "to ~7e-5 by step 5)")
    ap.add_argument("--probe-step1-tol", type=float, default=5e-6,
                    help="the STRICT gate: step-1 loss delta before any "
                         "parameter update can compound — pure forward+loss "
                         "+grad reduction equivalence (measured ~1e-7)")
    ap.add_argument("--write-json", default="")
    args = ap.parse_args()

    if args.worker:
        (probe_main if args.probe else worker_main)(args)
        return

    import numpy as np
    sys.path.insert(0, str(ROOT / "examples"))
    from convergence_run import make_dataset

    work = Path(args.workdir)
    if not (work / "data" / "visible/train").exists():
        make_dataset(work / "data", args.n, np.random.default_rng(0),
                     hw=(96, 128))
        print(f"dataset: {args.n} pairs under {work / 'data'}")

    D = args.local_devices          # devices per cluster process
    T = 2 * D                       # total devices (baseline runs 1 x T)
    base_flags = {"XLA_FLAGS": f"--xla_force_host_platform_device_count={T}"}
    clus_flags = {"XLA_FLAGS": f"--xla_force_host_platform_device_count={D}"}
    common = ["--worker", "--workdir", str(work), "--epochs", str(args.epochs),
              "--batch", str(args.batch), "--expect-devices", str(T)]

    # --- per-step strict probe: 1xT vs 2xD, first steps, full precision ---
    probe = ["--worker", "--probe", "--workdir", str(work),
             "--batch", str(args.batch), "--probe-steps", str(args.probe_steps),
             "--expect-devices", str(T)]
    print(f"probe: per-step losses, 1 process x {T} devices ...")
    p, f = launch(base_flags, probe, work / "probe_base.log")
    rc = p.wait()
    f.close()
    assert rc == 0, f"probe baseline failed: {work / 'probe_base.log'}"
    port = free_port()
    print(f"probe: per-step losses, 2 processes x {D} devices ...")
    procs = [launch(clus_flags,
                    probe + ["--num-processes", "2", "--process-id", str(pid),
                             "--coordinator", f"localhost:{port}"],
                    work / f"probe_mp{pid}.log") for pid in range(2)]
    rcs = [p.wait() for p, _ in procs]
    for _, f in procs:
        f.close()
    assert rcs == [0, 0], f"probe cluster failed: {work}/probe_mp*.log"
    pb = json.loads((work / "probe_base.json").read_text())
    pm = json.loads((work / "probe_mp.json").read_text())
    step_d = max(abs(a - b) for a, b in zip(pb, pm))
    step1_d = abs(pb[0] - pm[0])
    print(f"probe: step-1 loss delta {step1_d:.2e} (strict tol "
          f"{args.probe_step1_tol:.0e}); max over {len(pb)} steps "
          f"{step_d:.2e} (tol {args.probe_tol:.0e})")
    assert step1_d <= args.probe_step1_tol, (pb, pm)
    assert step_d <= args.probe_tol, (pb, pm)

    # 1-process baseline
    print(f"baseline: 1 process x {T} devices ...")
    p, f = launch(base_flags, common + ["--run-name", "base"], work / "base.log")
    rc = p.wait()
    f.close()
    assert rc == 0, f"baseline failed (rc={rc}): {work / 'base.log'}"

    # 2-process cluster
    port = free_port()
    print(f"cluster: 2 processes x {D} devices (coordinator localhost:{port}) ...")
    procs = []
    for pid in range(2):
        procs.append(launch(
            clus_flags,
            common + ["--run-name", "mp", "--num-processes", "2",
                      "--process-id", str(pid),
                      "--coordinator", f"localhost:{port}"],
            work / f"mp{pid}.log"))
    rcs = [p.wait() for p, _ in procs]
    for _, f in procs:
        f.close()
    assert rcs == [0, 0], f"cluster run failed (rcs={rcs}): {work}/mp*.log"

    base = read_losses(work / "runs" / "base" / "results.csv")
    mp = read_losses(work / "runs" / "mp" / "results.csv")
    assert len(base) == len(mp) == args.epochs, (len(base), len(mp))
    max_d = 0.0
    for b, m in zip(base, mp):
        for k in ("lbox", "lobj", "lcls"):
            max_d = max(max_d, abs(b[k] - m[k]))
    verdict = "MATCH" if max_d <= args.tol else "MISMATCH"
    print(f"per-epoch loss delta (1x{T} vs 2x{D}): max {max_d:.2e} "
          f"(tol {args.tol:.0e}) -> {verdict}")
    payload = {
        "what": "real 2-process JAX cluster fit() vs 1-process fit() on the "
                "same total devices, same data/seed; per-epoch loss columns "
                "compared",
        "devices": f"CPU, xla_force_host_platform_device_count ({D}x2 vs {T}x1)",
        "epochs": args.epochs, "batch": args.batch, "n_pairs": args.n,
        "per_step_probe": {"baseline": pb, "multiprocess": pm,
                           "step1_abs_delta": step1_d,
                           "step1_tol": args.probe_step1_tol,
                           "max_abs_delta": step_d, "tol": args.probe_tol},
        "baseline": base, "multiprocess": mp,
        "max_abs_loss_delta": max_d, "tol": args.tol, "verdict": verdict,
    }
    if args.write_json:
        Path(args.write_json).write_text(json.dumps(payload, indent=2))
        print(f"wrote {args.write_json}")
    assert verdict == "MATCH", f"loss mismatch: {max_d}"
    print("MULTIHOST OK")


if __name__ == "__main__":
    main()
