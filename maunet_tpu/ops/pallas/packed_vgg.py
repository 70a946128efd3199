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
        #
        # The halo dots contract K = cin (32/64) but an MXU pass zero-pads
        # K to 128, so per-part halo dots cost as much as the K=128 main
        # dots while doing a fraction of the work (the measured per-node
        # times match the pad-to-128 pass count exactly — TRACE.md §7).
        # All parts' halo columns are therefore lane-concatenated and
        # contracted in ONE dot per side against the row-stacked weight
        # slices: ceil(Σcin/128) passes instead of n_parts.
        acc = None
        xhs = []
        for p in range(n_parts):
            top, main, bot = parts[3 * p], parts[3 * p + 1], parts[3 * p + 2]
            x = main[0]                                   # (bh, G, s*cin)
            cin = cins[p]
            zrow = jnp.zeros_like(top[0, :1])
            above = jnp.where(pid == 0, zrow, top[0, -1:])
            below = jnp.where(pid == last, zrow, bot[0, :1])
            xh = jnp.concatenate([above, x, below], axis=0)  # (bh+2, G, sc)
            xhs.append(xh)
            wm = wm_refs[p]        # (3, s*cin, s*cout)
            for dy in range(3):
                m = jax.lax.dot_general(
                    xh[dy:dy + bh].reshape(bh * xh.shape[1], -1),
                    wm[dy], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = m if acc is None else acc + m
        g = out_ref.shape[2]
        sh = (bh, g, s * cout)
        gidx = jax.lax.broadcasted_iota(jnp.int32, sh, 1)
        # Both halo sides ride ONE dot per dy against a combined matrix —
        # the sides touch disjoint output lanes (left -> [:cout], right ->
        # [(s-1)*cout:], a pack_weights invariant), so their contributions
        # separate by lane masks after the dot.  The contributions computed
        # at group g belong to its neighbours, so the f32 result is rolled
        # one group each way under those masks.
        if per_part_halo:
            # Per-part extended-weight halo: each part's wl/wr scatter into
            # a (s*cin, s*cout) matrix at the rows of that part's edge
            # sub-columns, dotted against its xh IN PLACE.  No lane-slice /
            # concat builds (the xlr assembly below copies the whole block
            # through the VPU); gated on needing no more MXU passes than
            # the combined dot (_per_part_halo) — measured 574 -> 442 us on
            # the single-part 64-ch s=2 row, extended here to multi-part
            # rows like the classic U-Net's conv0_1 (s*cin 128+256).
            acch = None
            for p in range(n_parts):
                for dy in range(3):
                    hh = jax.lax.dot_general(
                        xhs[p][dy:dy + bh].reshape(bh * xhs[p].shape[1], -1),
                        wh_refs[p][dy], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acch = hh if acch is None else acch + hh
        else:
            # Multi part: lane-concat every part's LAST sub-column, then
            # every part's FIRST — one K=2*sum(cin) dot replaces the two
            # per-side K=sum(cin) dots (each padded up to an MXU multiple:
            # ceil(2S/128) <= 2*ceil(S/128) passes, strictly fewer whenever
            # sum(cin) mod 128 lands in [8, 64]).
            xlr = jnp.concatenate(
                [xh[:, :, (s - 1) * c:s * c] for xh, c in zip(xhs, cins)]
                + [xh[:, :, :c] for xh, c in zip(xhs, cins)], axis=-1)
            acch = None
            for dy in range(3):
                hh = jax.lax.dot_general(
                    xlr[dy:dy + bh].reshape(bh * xlr.shape[1], -1),
                    wh_refs[0][dy], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acch = hh if acch is None else acch + hh
        acch = acch.reshape(sh)
        lidx = jax.lax.broadcasted_iota(jnp.int32, sh, 2)
        rl = pltpu.roll(acch, 1, 1)        # from group g-1
        rr = pltpu.roll(acch, g - 1, 1)    # from group g+1
        acc = (acc.reshape(sh)
               + jnp.where((lidx < cout) & (gidx > 0), rl, 0.0)
               + jnp.where((lidx >= (s - 1) * cout) & (gidx < g - 1),
                           rr, 0.0))
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

    return kernel


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

    # Fold the affine SCALE into the weights (y = conv(w·a) + (add·a) + b):
    # the epilogue then pays one bias add instead of mul+add, and the halo
    # terms inherit the scaling through their weight slices for free.
    if affine is not None:
        a, bvec = affine
        wps = [w * a.astype(w.dtype)[None, None, :] for w in wps]
        if add is not None:
            add = add * a.astype(add.dtype)[None, None, None, :]
    # Split each packed-weight tensor into its main band plus halo
    # matrices (both sides touch disjoint output lanes — a pack_weights
    # invariant — so they share a dot).  Two halo forms, picked by MXU
    # pass count (_per_part_halo): per-part, both sides scatter into a
    # (s*cin, s*cout) matrix dotted against that part's xh directly (no
    # lane-slice builds); otherwise row-stack every part's left slice then
    # every part's right slice into ONE (2*Σcin, s*cout) matrix, dotted
    # against the matching lane-concat of edge sub-columns — ceil(2Σ/128)
    # passes instead of the per-part sum.
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
