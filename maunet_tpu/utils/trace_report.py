"""Per-kernel XPlane trace reports for the hot paths.

Round 2 proved the measurement methodology (docs/TRACE.md): capture a
``jax.profiler`` trace of N dispatched steps, parse the ``XLA Ops`` lane of
the TPU device process, and report per-kernel device-busy time.  This module
commits that tooling (it lived in session-local /tmp scripts before) and adds
the train-step target the round-2 verdict flagged as never-profiled.

CLI::

    python -m maunet_tpu.utils.trace_report infer --model unet++ --hw 256
    python -m maunet_tpu.utils.trace_report train --loss l1-gradient-ssim
    python -m maunet_tpu.utils.trace_report parse /tmp/prof/tag --steps 10

Timing notes (docs/TRACE.md §1): wall clock through the axon relay is
host-limited; the trace's device-busy total is the ground truth.  The wall
number printed next to it uses the data-dependent-scalar drain.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import time

import numpy as np


def parse_xplane(logdir: str, n_steps: int) -> dict:
    """Parse the newest ``*.trace.json.gz`` under ``logdir`` → per-kernel
    device-busy table for the TPU 'XLA Ops' lanes."""
    paths = sorted(glob.glob(
        os.path.join(logdir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace under {logdir}")
    data = json.load(gzip.open(paths[-1]))
    events = data["traceEvents"]
    tnames, pnames = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e["name"] == "thread_name":
                tnames[(e["pid"], e["tid"])] = e["args"]["name"]
            elif e["name"] == "process_name":
                pnames[e["pid"]] = e["args"]["name"]
    device_pids = {p for p, n in pnames.items() if "TPU" in n}
    durs: collections.Counter = collections.Counter()
    cnts: collections.Counter = collections.Counter()
    long_names: dict[str, str] = {}
    total, tmin, tmax = 0.0, float("inf"), 0.0
    for e in events:
        if (e.get("ph") == "X" and e["pid"] in device_pids
                and tnames.get((e["pid"], e.get("tid"))) == "XLA Ops"):
            durs[e["name"]] += e["dur"]
            cnts[e["name"]] += 1
            ln = e.get("args", {}).get("long_name")
            if ln and e["name"] not in long_names:
                long_names[e["name"]] = ln  # full HLO op incl. operand shapes
            total += e["dur"]
            tmin = min(tmin, e["ts"])
            tmax = max(tmax, e["ts"] + e["dur"])
    return {
        "total_ms": total / 1e3,
        "span_ms": (tmax - tmin) / 1e3 if tmax else 0.0,
        "per_step_ms": total / 1e3 / n_steps,
        "n_steps": n_steps,
        "kernels": [
            {"name": name, "total_ms": d / 1e3, "per_step_ms": d / 1e3 / n_steps,
             "count": cnts[name], "long_name": long_names.get(name)}
            for name, d in durs.most_common()
        ],
    }


def print_report(report: dict, top: int = 25) -> None:
    print(f"device busy total: {report['total_ms']:.2f} ms over span "
          f"{report['span_ms']:.2f} ms; per-step busy "
          f"{report['per_step_ms']:.2f} ms")
    print(f"{'total ms':>9} {'/step ms':>9} {'count':>6}  name")
    for k in report["kernels"][:top]:
        print(f"{k['total_ms']:9.3f} {k['per_step_ms']:9.3f} "
              f"{k['count']:6d}  {k['name'][:110]}")


def capture(step_fn, drain, logdir: str, n_steps: int = 10,
            warmup: int = 20) -> dict:
    """Warm up + wall-time ``step_fn`` with the scalar drain, then trace
    ``n_steps`` dispatches and parse the XPlane."""
    import jax

    drain(step_fn())  # compile + sync
    t0 = time.time()
    out = None
    for _ in range(warmup):
        out = step_fn()
    drain(out)
    wall_ms = (time.time() - t0) / warmup * 1e3

    with jax.profiler.trace(logdir):
        for _ in range(n_steps):
            out = step_fn()
        drain(out)
    report = parse_xplane(logdir, n_steps)
    report["wall_ms"] = wall_ms
    print(f"wall: {wall_ms:.2f} ms/step (scalar drain)")
    print_report(report)
    return report


def _drain_scalar(out):
    import jax.numpy as jnp

    if isinstance(out, (tuple, list)):
        out = out[0]
    if isinstance(out, dict):
        out = next(iter(out.values()))
    return float(jnp.sum(out.astype(jnp.float32)))


def trace_inference(model_type: str, hw: int, batch: int, logdir: str,
                    base_filters: int | None = None, n_steps: int = 10) -> dict:
    import jax
    import jax.numpy as jnp

    from maunet_tpu.models import UrbanPredictor

    bf = base_filters or (32 if model_type == "unet++" else 64)
    rng = np.random.default_rng(0)
    args = (
        jnp.asarray(rng.normal(size=(batch, hw, hw, 23)), jnp.bfloat16),
        jnp.asarray(rng.normal(size=(batch, 828)), jnp.float32),
        jnp.asarray(rng.normal(size=(batch, 8)), jnp.float32),
        jnp.full((batch,), 828, jnp.int32),
    )
    model = UrbanPredictor(model_type, base_filters=bf, temporal_dim=64,
                           meta_dim=64, lstm_dim=96)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *args)
    fwd = jax.jit(lambda v, *a: model.apply(v, *a))
    return capture(lambda: fwd(variables, *args), _drain_scalar, logdir,
                   n_steps)


def trace_train(model_type: str, loss: str, hw: int, batch: int, logdir: str,
                base_filters: int | None = None, n_steps: int = 10) -> dict:
    import jax

    from maunet_tpu.losses import get_loss_fn
    from maunet_tpu.models import UrbanPredictor
    from maunet_tpu.train import create_train_state, make_optimizer, make_train_step

    bf = base_filters or (32 if model_type == "unet++" else 64)
    rng = np.random.default_rng(0)
    b, t = batch, 828
    batch_np = {
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
    model = UrbanPredictor(model_type, base_filters=bf, temporal_dim=64,
                           meta_dim=64, lstm_dim=96)
    opt = make_optimizer("adamw", 1e-4, gradient_clipping=1.0)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), batch_np)
    step = make_train_step(model, get_loss_fn(loss), opt)
    batch_dev = jax.device_put(batch_np)
    holder = {"state": state}

    def one():
        holder["state"], metrics = step(holder["state"], batch_dev)
        return metrics["total"]

    return capture(one, lambda x: float(x), logdir, n_steps)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("infer", "train"):
        s = sub.add_parser(name)
        s.add_argument("--model", default="unet++" if name == "infer" else "unet")
        s.add_argument("--hw", type=int, default=256)
        s.add_argument("--batch", type=int, default=8)
        s.add_argument("--base-filters", type=int, default=None)
        s.add_argument("--steps", type=int, default=10)
        s.add_argument("--logdir", default=None)
        s.add_argument("--json", default=None, help="dump full report JSON")
        if name == "train":
            s.add_argument("--loss", default="l1-gradient-ssim")
    s = sub.add_parser("parse")
    s.add_argument("logdir")
    s.add_argument("--steps", type=int, default=10)
    args = p.parse_args(argv)

    if args.cmd == "parse":
        print_report(parse_xplane(args.logdir, args.steps))
        return 0
    logdir = args.logdir or f"/tmp/prof/{args.cmd}_{args.model.replace('+', 'p')}"
    if args.cmd == "infer":
        report = trace_inference(args.model, args.hw, args.batch, logdir,
                                 args.base_filters, args.steps)
    else:
        report = trace_train(args.model, args.loss, args.hw, args.batch,
                             logdir, args.base_filters, args.steps)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
