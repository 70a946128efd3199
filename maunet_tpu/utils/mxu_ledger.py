"""Per-kernel MXU-pass ledger for the fused packed-conv rows.

TRACE.md §9 proved the classic U-Net's hottest fused row at 97% of its MXU
pass roofline by hand-counting M-rows over every dot the kernel issues.
This module commits that accounting as a tool and extends it to EVERY fused
row of a model (VERDICT r4 next #2: the U-Net++ "ceiling" claim needs a
per-node ledger, not a single-kernel spot check).

Method: on v5e each 128x128 MXU pass retires one M-row per cycle, so a dot
with M rows and K contraction depth costs M * ceil(K/128) row-passes
(N = s*cout <= 128 always — a ``supported`` invariant).  Summing over every
dot a kernel issues (3 dy main dots per concat part + the halo dots in
whichever form ``_per_part_halo`` picked) and multiplying by the grid gives
the kernel's pass count; at the §9-calibrated 6.0e9 rows/s this is its
roofline.  Measured time comes from an XPlane trace; the kernels are matched
by name — ``ops/pallas/packed_vgg`` names each kernel from its static config
(``pvgg_conv_c64_64_s2_o64_bh32``), so every trace row is attributable.

CLI::

    python -m maunet_tpu.utils.mxu_ledger --model unet++ --hw 256 --batch 8
    python -m maunet_tpu.utils.mxu_ledger --model unet --json ledger.json
"""

from __future__ import annotations

import argparse
import json
import re
from collections import Counter

# §9 calibration: v5e bf16 peak 197 TFLOP/s / (128*128*2*2 FLOP per
# MXU-row-pass... measured constant) — 6.0e9 M-rows/s.
MXU_ROWS_PER_SEC = 6.0e9


def _passes(k: int) -> int:
    return -(-k // 128)


def _conv_rows(n_out: int, g: int, cins, s: int, per_part_halo: bool) -> dict:
    """M-row pass count for one grid step of ``_conv_from_xh``."""
    m = n_out * g
    main = sum(3 * m * _passes(s * c) for c in cins)
    if per_part_halo:
        halo = sum(3 * m * _passes(s * c) for c in cins)
    else:
        halo = 3 * m * _passes(2 * sum(cins))
    return {"main": main, "halo": halo}


def kernel_rows(cfg: dict) -> dict:
    """Total M-row passes for one invocation of a fused kernel (all grid
    steps), split main/halo.  ``cfg`` is a ``packed_vgg.CALL_CONFIGS``
    entry."""
    grid = cfg["b"] * (cfg["h"] // cfg["bh"])
    if cfg["kind"] == "pair":
        r1 = _conv_rows(cfg["bh"] + 2, cfg["g"], cfg["cins"], cfg["s"],
                        cfg["per_part_halo"])
        r2 = _conv_rows(cfg["bh"], cfg["g"], [cfg["cmid"]], cfg["s"], True)
        per_step = {k: r1[k] + r2[k] for k in r1}
    else:
        per_step = _conv_rows(cfg["bh"], cfg["g"], cfg["cins"], cfg["s"],
                              cfg["per_part_halo"])
    total = grid * (per_step["main"] + per_step["halo"])
    return {"rows": total, "main": grid * per_step["main"],
            "halo": grid * per_step["halo"],
            "roofline_ms": total / MXU_ROWS_PER_SEC * 1e3}


_SHAPE_RE = re.compile(r"(?:bf16|f32|f16|s32|u8|pred)\[([0-9,]*)\]")


def _shapes_from_long_name(long_name: str):
    """HLO op text → (output shape, operand shape list).  The op reads
    ``%name = TYPE[SHAPE]{layout} custom-call(TYPE[SHAPE]{...} %op, ...),
    custom_call_target=..., operand_layout_constraints={...}``; the first
    shape is the output, the rest up to ``custom_call_target`` are the
    operands (the layout-constraint clause repeats every operand shape and
    must not be parsed)."""
    head = long_name.split("custom_call_target")[0]
    shapes = [tuple(int(x) for x in m.split(",") if x)
              for m in _SHAPE_RE.findall(head)]
    return (shapes[0], shapes[1:]) if shapes else (None, [])


def _expected_signature(cfg: dict):
    """(output shape, multiset of the config's distinctive operand shapes):
    weight matrices + the x parts (each passed 3× as halo/main/halo blocks).
    Bias/add operands are ignored — matching is by containment, so extra
    operands in the HLO op never block a match."""
    s, cout, b, h, g = cfg["s"], cfg["cout"], cfg["b"], cfg["h"], cfg["g"]
    cins = list(cfg["cins"])
    if cfg["kind"] == "pair":
        cmid = cfg["cmid"]
        out = (b, h, g, s * cout)
        wm = [(3, s * c, s * cmid) for c in cins] + [(3, s * cmid, s * cout)]
        wh = ([(3, s * c, s * cmid) for c in cins] if cfg["per_part_halo"]
              else [(3, 2 * sum(cins), s * cmid)]) + [(3, s * cmid, s * cout)]
    else:
        out = (b, h, g, s * cout)
        wm = [(3, s * c, s * cout) for c in cins]
        wh = ([(3, s * c, s * cout) for c in cins] if cfg["per_part_halo"]
              else [(3, 2 * sum(cins), s * cout)])
    parts = [(b, h, g, s * c) for c in cins for _ in range(3)]
    return out, Counter(wm + wh + parts)


def match_config(long_name: str, call_configs: dict[str, dict]) -> str | None:
    """Attribute one trace row to a recorded call config by shape signature.

    Output shape must agree, weight shapes must be present (containment —
    bias/add/layout noise ignored), and the op's (b, h, g, ·)-shaped
    operands must EQUAL the config's part multiset exactly — containment
    alone would let a multi-part decoder node match a single-part config
    whose operands are a subset of its own."""
    out, ops = _shapes_from_long_name(long_name)
    if out is None:
        return None
    have = Counter(ops)
    for name, cfg in call_configs.items():
        exp_out, exp_ops = _expected_signature(cfg)
        if exp_out != out:
            continue
        b, h, g = cfg["b"], cfg["h"], cfg["g"]
        op_parts = Counter(sh for sh in ops
                           if len(sh) == 4 and sh[:3] == (b, h, g))
        exp_parts = Counter(sh for sh in exp_ops.elements()
                            if len(sh) == 4 and sh[:3] == (b, h, g))
        # The output shape also matches (b, h, g, ·) but is not an operand;
        # the ``add`` operand is (b, 3, g, ·) so it never collides with a
        # part (h >= 8).
        if op_parts != exp_parts:
            continue
        if all(have[shape] >= n for shape, n in exp_ops.items()):
            return name
    return None


def build_ledger(trace_kernels: list[dict], n_steps: int,
                 call_configs: dict[str, dict]) -> list[dict]:
    """Join XPlane kernel rows against the recorded call configs.

    ``trace_kernels``: trace_report.parse_xplane()['kernels'].  Rows whose
    HLO op is a pallas custom-call are attributed to a config via their
    operand-shape signature (the executable name XLA assigns is opaque);
    a kernel name appearing ``count`` times over ``n_steps`` dispatches
    runs ``count/n_steps`` instances per step."""
    ledger = []
    for k in trace_kernels:
        if not k.get("long_name") or "custom-call" not in k["long_name"]:
            continue
        match = match_config(k["long_name"], call_configs)
        if match is None:
            continue
        cfg = call_configs[match]
        instances = k["count"] / n_steps
        acct = kernel_rows(cfg)
        roof = acct["roofline_ms"] * instances
        ledger.append({
            "trace_name": k["name"],
            "kernel": match,
            "instances_per_step": instances,
            "measured_ms": k["per_step_ms"],
            "roofline_ms": round(roof, 4),
            "pct_of_roofline": round(100 * roof / k["per_step_ms"], 1)
            if k["per_step_ms"] else None,
            "rows_per_instance": acct["rows"],
            "halo_row_share": round(acct["halo"] / acct["rows"], 3),
            "config": {key: (list(v) if isinstance(v, tuple) else v)
                       for key, v in cfg.items()},
        })
    ledger.sort(key=lambda r: -r["measured_ms"])
    return ledger


def print_ledger(ledger: list[dict], other_ms: float | None = None) -> None:
    print(f"{'measured':>9} {'roofline':>9} {'% roof':>7} {'inst':>5} "
          f"{'halo%':>6}  kernel")
    tot_m = tot_r = 0.0
    for r in ledger:
        tot_m += r["measured_ms"]
        tot_r += r["roofline_ms"]
        print(f"{r['measured_ms']:9.3f} {r['roofline_ms']:9.3f} "
              f"{r['pct_of_roofline']:7.1f} {r['instances_per_step']:5.1f} "
              f"{100*r['halo_row_share']:6.1f}  {r['kernel']}")
    if ledger:
        print(f"{tot_m:9.3f} {tot_r:9.3f} {100*tot_r/tot_m:7.1f}"
              f"{'':13}  TOTAL fused rows")
    if other_ms is not None:
        print(f"{other_ms:9.3f} {'':>9} {'':>7}{'':13}  all other kernels")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="unet++")
    p.add_argument("--hw", type=int, default=256)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--base-filters", type=int, default=None)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--json", default=None)
    p.add_argument("--logdir", default=None)
    args = p.parse_args(argv)

    from maunet_tpu.ops.pallas import packed_vgg
    from maunet_tpu.utils.trace_report import trace_inference

    logdir = args.logdir or (
        f"/tmp/prof/ledger_{args.model.replace('+', 'p')}")
    packed_vgg.CALL_CONFIGS.clear()
    report = trace_inference(args.model, args.hw, args.batch, logdir,
                             args.base_filters, args.steps)
    ledger = build_ledger(report["kernels"], args.steps,
                          dict(packed_vgg.CALL_CONFIGS))
    fused_ms = sum(r["measured_ms"] for r in ledger)
    print_ledger(ledger, other_ms=report["per_step_ms"] - fused_ms)
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"ledger": ledger, "wall_ms": report.get("wall_ms"),
                       "busy_ms": report["per_step_ms"]}, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
