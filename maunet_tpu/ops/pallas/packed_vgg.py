"""Lane-packed 3x3 conv with fused affine+ReLU epilogue (Pallas).

The packed-resident U-Net++ decoder row (models/unetpp.py) chains
``packed_conv`` ops in XLA.  XLA's conv emitter prefers H-minor layouts
for the 3x1 packed convs and materializes the one-column halo tensors as
separate HBM arrays, so every node pays relayout copies (~0.1 ms each at
256²/B8) plus halo materialization.  This kernel computes the same
contraction with the halos sliced out of VMEM (never materialized), the
partial sums accumulated in f32 registers (never round-tripped through
HBM), and the inference BatchNorm affine + ReLU folded into the epilogue —
with canonical C-minor layouts pinned on both sides, composing copy-free
with ``ops/pallas/resize_pack.py`` outputs and with itself across nodes.

Math identical to ``ops.packed_conv.packed_conv`` (reference
src/model.py:9-21 VGGBlock convs): per output group ``g``, three channel
blocks — the previous group's last column, the group itself, the next
group's first column — contract against ``pack_weights`` slices, with
SAME zero-padding reproduced by zeroed halo rows/columns at the image
edges.  Multiple input parts (the decoder's virtual concat) accumulate
into one f32 sum, i.e. one rounding instead of one per part.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HW = 8  # row-block quantum (bh candidates are multiples of this)

# Test hook: run the kernel in interpret mode on CPU (monkeypatched by the
# pack-equivalence tests; production gates on jax.default_backend()=='tpu').
INTERPRET = False

# Ledger side-table: kernel name -> static call config, filled at trace time
# (utils/mxu_ledger.py reads it to compute per-kernel MXU-pass rooflines and
# match them against XPlane trace rows by name).
CALL_CONFIGS: dict[str, dict] = {}


def _kernel_name(kind: str, cins, s: int, cout: int, bh: int, *,
                 cmid: int | None = None) -> str:
    """Config-derived kernel name: shows up verbatim in the XPlane 'XLA Ops'
    lane, so every fused row in a trace is attributable to its exact
    (cins, s, cout, bh) without shape detective work."""
    cstr = "_".join(str(c) for c in cins)
    mid = f"_m{cmid}" if cmid is not None else ""
    return f"pvgg_{kind}_c{cstr}_s{s}{mid}_o{cout}_bh{bh}"


def supported(parts_shapes, cins, s: int, cout: int) -> bool:
    """parts_shapes: [(B, H, G, s*cin_p)] of the packed inputs."""
    if s < 2 or s * cout > 128:
        return False
    b, h, g, _ = parts_shapes[0]
    if h % _HW or g % 8:
        return False
    for (pb, ph, pg, psc), cin in zip(parts_shapes, cins):
        if (pb, ph, pg) != (b, h, g) or psc != s * cin or cin % 8:
            return False
    return _pick_bh(h, g, cins, s, cout) is not None


def _pick_bh(h, g, cins, s, cout):
    """Row-block size fitting double-buffered blocks PLUS the kernel's
    f32 scratch (three accumulators + roll/mask temps, ~6 output blocks in
    f32) into a 14 MB budget against the 16 MB VMEM scoped limit.  The
    ±1-row H halos ride two single-row blocks (2 extra input rows per
    step — an 8-row halo block at bh=8 was fetching 2× the useful data,
    the difference between conv0_1's 0.95 ms and its ~0.4 ms floor)."""
    in_row = sum(g * s * cin * 2 for cin in cins)
    out_row = g * s * cout * 2                 # bf16; ×2 for the add term
    for bh in (64, 32, 16, 8):
        if h % bh:
            continue
        blocks = (bh + 2) * in_row + 2 * bh * out_row
        stack = 6 * bh * g * s * cout * 4
        if 2 * blocks + stack <= (14 << 20):
            return bh
    return None


def _per_part_halo(cins, s: int) -> bool:
    """Per-part extended-weight halo dots vs ONE combined lane-concat dot.

    Per part, both halo sides scatter into a (s*cin, s*cout) matrix dotted
    against the already-built xh rows (no lane-slice/concat build — the
    single-part trick of TRACE.md §7.9).  The combined form instead builds
    an xlr lane-concat of every part's edge sub-columns (a full VPU copy of
    the block) but contracts in ceil(2*sum(cin)/128) MXU passes.  Take the
    build-free form whenever it needs no MORE passes: true for the classic
    U-Net decoder (s*cin of 128/256: 3 = 3), false for U-Net++'s many 32-ch
    parts (4x1+2 = 6 > 3), where the measured 834 -> 955 tiles/s win of the
    combined dot stands.

    The tie-break ``<=`` compares MXU *pass counts only*: a per-part
    (s*cin, s*cout) halo matrix can carry mostly-zero K rows (e.g. s=4 /
    cin=32 dots K=128 where K=64 would suffice), but the MXU zero-pads K to
    128 per pass anyway, so those rows cost nothing beyond the pass count on
    current 128-wide hardware — an assumption to revisit if a future MXU
    bills partial-K passes differently (ADVICE r3)."""
    per_part = sum(-(-s * c // 128) for c in cins)
    combined = -(-2 * sum(cins) // 128)
    return per_part <= combined


def _conv_from_xh(xhs, wm_refs, wh_refs, per_part_halo, n_out: int, g: int,
                  s: int, cout: int, cins):
    """Shared conv body: 3-tap main dots + column-halo dots + accumulator
    rolls over pre-built halo-extended row windows.

    ``xhs[p]``: (n_out + 2, G, s*cin_p) — the part's rows with one halo row
    each side (zeroed at image edges by the caller).  Returns the f32
    (n_out, G, s*cout) conv accumulation, halo contributions applied.
    """
    n_parts = len(cins)
    acc = None
    for p in range(n_parts):
        xh, wm = xhs[p], wm_refs[p]
        for dy in range(3):
            m = jax.lax.dot_general(
                xh[dy:dy + n_out].reshape(n_out * xh.shape[1], -1),
                wm[dy], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = m if acc is None else acc + m
    sh = (n_out, g, s * cout)
    gidx = jax.lax.broadcasted_iota(jnp.int32, sh, 1)
    # Both halo sides ride ONE dot per dy against a combined matrix — the
    # sides touch disjoint output lanes (left -> [:cout], right ->
    # [(s-1)*cout:], a pack_weights invariant), so their contributions
    # separate by lane masks after the dot.  The contributions computed at
    # group g belong to its neighbours, so the f32 result is rolled one
    # group each way under those masks.
    if per_part_halo:
        # Per-part extended-weight halo: each part's wl/wr scatter into a
        # (s*cin, s*cout) matrix at the rows of that part's edge
        # sub-columns, dotted against its xh IN PLACE (no lane-slice /
        # concat builds); gated on needing no more MXU passes than the
        # combined dot (_per_part_halo).
        acch = None
        for p in range(n_parts):
            for dy in range(3):
                hh = jax.lax.dot_general(
                    xhs[p][dy:dy + n_out].reshape(n_out * xhs[p].shape[1], -1),
                    wh_refs[p][dy], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acch = hh if acch is None else acch + hh
    else:
        # Multi part: lane-concat every part's LAST sub-column, then every
        # part's FIRST — one K=2*sum(cin) dot replaces two per-side
        # K=sum(cin) dots.
        xlr = jnp.concatenate(
            [xh[:, :, (s - 1) * c:s * c] for xh, c in zip(xhs, cins)]
            + [xh[:, :, :c] for xh, c in zip(xhs, cins)], axis=-1)
        acch = None
        for dy in range(3):
            hh = jax.lax.dot_general(
                xlr[dy:dy + n_out].reshape(n_out * xlr.shape[1], -1),
                wh_refs[0][dy], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acch = hh if acch is None else acch + hh
    acch = acch.reshape(sh)
    lidx = jax.lax.broadcasted_iota(jnp.int32, sh, 2)
    rl = pltpu.roll(acch, 1, 1)        # from group g-1
    rr = pltpu.roll(acch, g - 1, 1)    # from group g+1
    return (acc.reshape(sh)
            + jnp.where((lidx < cout) & (gidx > 0), rl, 0.0)
            + jnp.where((lidx >= (s - 1) * cout) & (gidx < g - 1), rr, 0.0))


def _split_weights(wps, cins, s: int, cout: int):
    """Split each packed-weight tensor into its main band plus halo
    matrices (both sides touch disjoint output lanes — a pack_weights
    invariant — so they share a dot).  Two halo forms, picked by MXU
    pass count (_per_part_halo): per-part, both sides scatter into a
    (s*cin, s*cout) matrix dotted against that part's xh directly (no
    lane-slice builds); otherwise row-stack every part's left slice then
    every part's right slice into ONE (2*Σcin, s*cout) matrix, dotted
    against the matching lane-concat of edge sub-columns — ceil(2Σ/128)
    passes instead of the per-part sum."""
    wms = [w[:, cin:(s + 1) * cin] for w, cin in zip(wps, cins)]
    if _per_part_halo(cins, s):
        whs = []
        for w, cin in zip(wps, cins):
            wh = jnp.zeros((3, s * cin, s * cout), w.dtype)
            wh = wh.at[:, (s - 1) * cin:, :cout].set(w[:, :cin, :cout])
            wh = wh.at[:, :cin, (s - 1) * cout:].set(
                w[:, (s + 1) * cin:, (s - 1) * cout:])
            whs.append(wh)
    else:
        whs = [jnp.concatenate(
            [w[:, :cin] for w, cin in zip(wps, cins)]
            + [w[:, (s + 1) * cin:] for w, cin in zip(wps, cins)], axis=1)]
    return wms, whs


def _make_kernel(bh: int, cins, s: int, cout: int, relu: bool,
                 has_affine: bool, has_add: bool, out_dtype):
    n_parts = len(cins)
    per_part_halo = _per_part_halo(cins, s)
    n_halo = n_parts if per_part_halo else 1

    def kernel(*refs):
        wm_refs = refs[:n_parts]
        wh_refs = refs[n_parts:n_parts + n_halo]  # halo matrices
        k = n_parts + n_halo
        if has_affine:
            b_ref = refs[k]
            k += 1
        add_ref = None
        if has_add:
            add_ref = refs[k]
            k += 1
        parts = refs[k:k + 3 * n_parts]
        out_ref = refs[k + 3 * n_parts]
        pid = pl.program_id(1)
        last = pl.num_programs(1) - 1

        # Column-halo terms are computed IN PLACE (the halo columns dotted
        # with the halo weight slices) and the result — not the input — is
        # shifted one group along the sublane axis (pltpu.roll + edge mask).
        # Shifting inputs would need concats of sublane-offset slices, which
        # Mosaic does not lower; shifting the f32 accumulator is one aligned
        # roll, and being linear it happens ONCE after summing all parts.
        # (Body shared with the pair kernel — _conv_from_xh.)
        xhs = []
        for p in range(n_parts):
            top, main, bot = parts[3 * p], parts[3 * p + 1], parts[3 * p + 2]
            x = main[0]                                   # (bh, G, s*cin)
            zrow = jnp.zeros_like(top[0, :1])
            above = jnp.where(pid == 0, zrow, top[0, -1:])
            below = jnp.where(pid == last, zrow, bot[0, :1])
            xhs.append(jnp.concatenate([above, x, below], axis=0))
        g = out_ref.shape[2]
        sh = (bh, g, s * cout)
        acc = _conv_from_xh(xhs, wm_refs, wh_refs, per_part_halo, bh, g, s,
                            cout, cins)
        if has_add:
            # Pre-affine additive term (the decoder's closed-form broadcast
            # embedding contribution): spatially constant except at the
            # H borders, so it arrives as 3 rows {top, interior, bottom}
            # (B, 3, G, s*cout).  The interior plane adds in ONE
            # row-broadcast pass; the image's first/last rows differ only
            # in the pid==0 / pid==last blocks, so they are patched as
            # 1-row deltas instead of a full-tensor 3-way select (the
            # select chain was ~5 VPU passes over the whole block — a
            # third of the kernel's non-MXU time).
            mid = add_ref[0, 1].astype(jnp.float32)
            dtop = (add_ref[0, 0].astype(jnp.float32) - mid)[None]
            dbot = (add_ref[0, 2].astype(jnp.float32) - mid)[None]
            rid = jax.lax.broadcasted_iota(jnp.int32, sh, 0)
            acc = (acc + mid[None]
                   + jnp.where((rid == 0) & (pid == 0), dtop, 0.0)
                   + jnp.where((rid == bh - 1) & (pid == last), dbot, 0.0))
        if has_affine:
            # Scale is pre-folded into the weights (see caller); only the
            # bias survives to the epilogue — one add instead of mul+add.
            acc = acc + b_ref[0]
        if relu:
            acc = jnp.maximum(acc, 0.0)
        out_ref[0] = acc.astype(out_dtype)

    kernel.__name__ = _kernel_name("conv", cins, s, cout, bh)
    return kernel


def pair_supported(parts_shapes, cins, s: int, cmid: int, cout: int) -> bool:
    """Whole-VGGBlock fusion (conv1→BN→ReLU→conv2→BN→ReLU in ONE kernel):
    both convs must individually qualify and a row block must fit with the
    f32 intermediate resident in VMEM."""
    if not supported(parts_shapes, cins, s, cmid) or s * cout > 128:
        return False
    b, h, g, _ = parts_shapes[0]
    return _pick_bh_pair(h, g, cins, s, cmid, cout) is not None


def _pick_bh_pair(h, g, cins, s, cmid, cout):
    """Row-block size for the pair kernel: double-buffered input/output
    blocks (each part carries two 2-row halo blocks) plus the kernel's f32
    working set — conv1 accumulators + the (bh+2)-row mid activation in f32
    and bf16 + conv2 accumulators — inside the 14 MB budget."""
    in_row = sum(g * s * cin * 2 for cin in cins)
    out_row = g * s * cout * 2
    mid_row = g * s * cmid
    for bh in (32, 16, 8):
        if h % bh:
            continue
        blocks = (bh + 4) * in_row + 2 * bh * out_row
        # The 4× accumulator multiplier is calibrated on-chip: bh=32 compiles
        # and runs for every VGGBlock shape of both model families at 256²
        # (a 6× estimate rejected bh=32, forcing bh=16 and a 12.5% conv1
        # overlap recompute; Mosaic's real allocation fits at 32).
        stack = (4 * (bh + 2) * mid_row * 4   # conv1 acc/temps + f32 mid
                 + (bh + 2) * mid_row * 2     # bf16 mid
                 + 4 * bh * g * s * cout * 4)  # conv2 acc/temps
        if 2 * blocks + stack <= (14 << 20):
            return bh
    return None


def _make_pair_kernel(bh: int, cins, s: int, cmid: int, cout: int,
                      has_add: bool, out_dtype):
    n_parts = len(cins)
    per_part1 = _per_part_halo(cins, s)
    n_halo1 = n_parts if per_part1 else 1

    def kernel(*refs):
        wm1 = refs[:n_parts]
        wh1 = refs[n_parts:n_parts + n_halo1]
        k = n_parts + n_halo1
        wm2, wh2 = refs[k], refs[k + 1]
        b1_ref, b2_ref = refs[k + 2], refs[k + 3]
        k += 4
        add_ref = None
        if has_add:
            add_ref = refs[k]
            k += 1
        parts = refs[k:k + 3 * n_parts]
        out_ref = refs[k + 3 * n_parts]
        pid = pl.program_id(1)
        last = pl.num_programs(1) - 1
        g = out_ref.shape[2]

        # conv1 computes bh+2 output rows (global i*bh-1 .. i*bh+bh): the
        # block's own bh rows plus one overlap row each side so conv2's
        # 3-tap H window never leaves VMEM.  Inputs extend two rows each
        # side (2-row halo blocks), zeroed where they fall outside the
        # image; the 2/bh recompute of overlap rows is the price of never
        # materializing the VGGBlock's mid activation in HBM.
        xhs = []
        for p in range(n_parts):
            top, main, bot = parts[3 * p], parts[3 * p + 1], parts[3 * p + 2]
            z2 = jnp.zeros_like(top[0])
            above = jnp.where(pid == 0, z2, top[0])     # rows i*bh-2, -1
            below = jnp.where(pid == last, z2, bot[0])  # rows i*bh+bh, +1
            xhs.append(jnp.concatenate([above, main[0], below], axis=0))
        mid = _conv_from_xh(xhs, wm1, wh1, per_part1, bh + 2, g, s, cmid,
                            cins)
        msh = (bh + 2, g, s * cmid)
        if has_add:
            # Compact 3-row embedding add over the mid rows: interior plane
            # broadcast + 1-row deltas at the image's first/last rows, which
            # sit at local rows 1 / bh of the overlap window.
            interior = add_ref[0, 1].astype(jnp.float32)
            dtop = (add_ref[0, 0].astype(jnp.float32) - interior)[None]
            dbot = (add_ref[0, 2].astype(jnp.float32) - interior)[None]
            rid = jax.lax.broadcasted_iota(jnp.int32, msh, 0)
            mid = (mid + interior[None]
                   + jnp.where((rid == 1) & (pid == 0), dtop, 0.0)
                   + jnp.where((rid == bh) & (pid == last), dbot, 0.0))
        mid = jnp.maximum(mid + b1_ref[0], 0.0)
        # Overlap rows outside the image are conv2 zero-padding, not data:
        # zero them post-ReLU (1-row selects, not full-block masks).
        row0 = jnp.where(pid == 0, jnp.zeros_like(mid[0:1]), mid[0:1])
        rowN = jnp.where(pid == last, jnp.zeros_like(mid[-1:]), mid[-1:])
        mid_x = jnp.concatenate([row0, mid[1:-1], rowN],
                                axis=0).astype(out_dtype)

        acc = _conv_from_xh([mid_x], [wm2], [wh2], True, bh, g, s, cout,
                            [cmid])
        acc = jnp.maximum(acc + b2_ref[0], 0.0)
        out_ref[0] = acc.astype(out_dtype)

    kernel.__name__ = _kernel_name("pair", cins, s, cout, bh, cmid=cmid)
    return kernel


@functools.partial(jax.jit, static_argnames=("cins", "s", "cmid", "cout",
                                             "interpret"))
def packed_pair_fused(parts: tuple[jnp.ndarray, ...],
                      wps1: tuple[jnp.ndarray, ...],
                      cins: tuple[int, ...], s: int, cmid: int,
                      wp2: jnp.ndarray, cout: int,
                      affine1: tuple[jnp.ndarray, jnp.ndarray],
                      affine2: tuple[jnp.ndarray, jnp.ndarray],
                      add: jnp.ndarray | None = None,
                      interpret: bool = False) -> jnp.ndarray:
    """A whole VGGBlock — (virtual-concat conv1 → BN → ReLU → conv2 → BN →
    ReLU) — as ONE Pallas kernel (round-4 node fusion, VERDICT r3 next #3).

    The mid activation lives only in VMEM: vs two chained
    ``packed_conv3x3_fused`` calls this removes one full HBM write+read of
    the (B, H, G, s*cmid) tensor per VGGBlock plus one kernel launch, at the
    cost of recomputing 2 overlap rows of conv1 per row block.  Arguments
    mirror the single-conv call; ``affine1``/``affine2`` are the two BN
    folded (scale, bias) vectors tiled to s*cmid / s*cout; ``add`` is
    conv1's compact 3-row broadcast-embedding term.
    """
    b, h, g, _ = parts[0].shape
    bh = _pick_bh_pair(h, g, cins, s, cmid, cout)
    assert bh is not None, (parts[0].shape, cins, s, cmid, cout)
    dtype = parts[0].dtype
    CALL_CONFIGS[_kernel_name("pair", cins, s, cout, bh, cmid=cmid)] = {
        "kind": "pair", "b": b, "h": h, "g": g, "bh": bh, "cins": cins,
        "s": s, "cmid": cmid, "cout": cout,
        "per_part_halo": _per_part_halo(cins, s)}

    a1, b1 = affine1
    a2, b2 = affine2
    wps1 = [w * a1.astype(w.dtype)[None, None, :] for w in wps1]
    if add is not None:
        add = add * a1.astype(add.dtype)[None, None, None, :]
    wp2 = wp2 * a2.astype(wp2.dtype)[None, None, :]
    wms1, whs1 = _split_weights(wps1, cins, s, cmid)
    wms2, whs2 = _split_weights([wp2], [cmid], s, cout)
    weights = [*wms1, *whs1, wms2[0], whs2[0]]
    w_specs = [pl.BlockSpec(w.shape, lambda bi, i: (0, 0, 0))
               for w in weights]
    bias_args = [b1.reshape(1, -1).astype(jnp.float32),
                 b2.reshape(1, -1).astype(jnp.float32)]
    bias_specs = [pl.BlockSpec((1, s * cmid), lambda bi, i: (0, 0)),
                  pl.BlockSpec((1, s * cout), lambda bi, i: (0, 0))]
    add_specs, add_args = [], []
    if add is not None:
        assert add.shape == (b, 3, g, s * cmid), (add.shape, parts[0].shape)
        add_specs = [pl.BlockSpec((1, 3, g, s * cmid),
                                  lambda bi, i: (bi, 0, 0, 0))]
        add_args = [add]
    part_specs, part_args = [], []
    hb = bh // 2  # 2-row halo blocks, index maps in 2-row units
    for p in parts:
        sc = p.shape[-1]
        part_specs += [
            pl.BlockSpec((1, 2, g, sc),
                         lambda bi, i: (bi, jnp.maximum(i * hb - 1, 0),
                                        0, 0)),
            pl.BlockSpec((1, bh, g, sc), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec((1, 2, g, sc),
                         lambda bi, i: (bi, jnp.minimum(i * hb + hb,
                                                        h // 2 - 1), 0, 0)),
        ]
        part_args += [p, p, p]

    out = pl.pallas_call(
        _make_pair_kernel(bh, cins, s, cmid, cout, add is not None, dtype),
        grid=(b, h // bh),
        in_specs=w_specs + bias_specs + add_specs + part_specs,
        out_specs=pl.BlockSpec((1, bh, g, s * cout),
                               lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, g, s * cout), dtype),
        interpret=interpret,
    )(*weights, *bias_args, *add_args, *part_args)
    return out


@functools.partial(jax.jit, static_argnames=("cins", "s", "cout", "relu",
                                             "interpret"))
def packed_conv3x3_fused(parts: tuple[jnp.ndarray, ...],
                         wps: tuple[jnp.ndarray, ...],
                         cins: tuple[int, ...], s: int, cout: int,
                         affine: tuple[jnp.ndarray, jnp.ndarray] | None,
                         add: jnp.ndarray | None = None,
                         relu: bool = False,
                         interpret: bool = False) -> jnp.ndarray:
    """3x3 SAME conv over a virtual concat of lane-packed parts.

    parts[p]: (B, H, G, s*cin_p); wps[p]: the ``pack_weights`` tensor
    reshaped to (3, (s+2)*cin_p, s*cout) — it MUST come from
    ``pack_weights`` (the halo rows touching only the edge sub-columns'
    output lanes is load-bearing for the combined halo dot); ``add``:
    optional compact
    (B, 3, G, s*cout) term — rows {y=0, interior, y=H-1} — summed into the
    conv result *before* the affine (the decoder's broadcast-embedding
    contribution, H-broadcast in VMEM); ``affine``: optional (scale, bias)
    vectors of length s*cout applied as ``y*scale + bias`` before the
    optional ReLU (inference BN / folded conv bias).
    Returns (B, H, G, s*cout).
    """
    b, h, g, _ = parts[0].shape
    bh = _pick_bh(h, g, cins, s, cout)
    assert bh is not None, (parts[0].shape, cins, s, cout)
    dtype = parts[0].dtype
    CALL_CONFIGS[_kernel_name("conv", cins, s, cout, bh)] = {
        "kind": "conv", "b": b, "h": h, "g": g, "bh": bh, "cins": cins,
        "s": s, "cout": cout, "per_part_halo": _per_part_halo(cins, s)}

    # Fold the affine SCALE into the weights (y = conv(w·a) + (add·a) + b):
    # the epilogue then pays one bias add instead of mul+add, and the halo
    # terms inherit the scaling through their weight slices for free.
    if affine is not None:
        a, bvec = affine
        wps = [w * a.astype(w.dtype)[None, None, :] for w in wps]
        if add is not None:
            add = add * a.astype(add.dtype)[None, None, None, :]
    wms, whs = _split_weights(wps, cins, s, cout)
    wps = [*wms, *whs]
    wp_specs = [pl.BlockSpec(w.shape, lambda bi, i: (0, 0, 0)) for w in wps]
    affine_specs, affine_args = [], []
    if affine is not None:
        affine_args = [bvec.reshape(1, -1).astype(jnp.float32)]
        affine_specs = [pl.BlockSpec((1, s * cout), lambda bi, i: (0, 0))]
    add_specs, add_args = [], []
    if add is not None:
        assert add.shape == (b, 3, g, s * cout), (add.shape, parts[0].shape)
        add_specs = [pl.BlockSpec((1, 3, g, s * cout),
                                  lambda bi, i: (bi, 0, 0, 0))]
        add_args = [add]
    part_specs, part_args = [], []
    for p in parts:
        sc = p.shape[-1]
        # Single-row halo blocks (the kernel reads exactly one row from
        # each): index maps are in 1-row units for the halos, bh-row units
        # for the main block.
        part_specs += [
            pl.BlockSpec((1, 1, g, sc),
                         lambda bi, i: (bi, jnp.maximum(i * bh - 1, 0),
                                        0, 0)),
            pl.BlockSpec((1, bh, g, sc), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec((1, 1, g, sc),
                         lambda bi, i: (bi, jnp.minimum(i * bh + bh,
                                                        h - 1), 0, 0)),
        ]
        part_args += [p, p, p]

    out = pl.pallas_call(
        _make_kernel(bh, cins, s, cout, relu, affine is not None,
                     add is not None, dtype),
        grid=(b, h // bh),
        in_specs=wp_specs + affine_specs + add_specs + part_specs,
        out_specs=pl.BlockSpec((1, bh, g, s * cout),
                               lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, g, s * cout), dtype),
        interpret=interpret,
    )(*wps, *affine_args, *add_args, *part_args)
    return out
