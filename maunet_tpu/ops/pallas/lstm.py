"""Pallas TPU kernel: full-sequence LSTM, returning the last hidden state.

The CRU temporal encoder runs an LSTM over 828 months
(models/encoders.TemporalEncoder).  A ``lax.scan`` lowering launches 828
tiny sequential ops; this kernel instead keeps the recurrent weights and the
(h, c) state resident in VMEM for the whole sequence and pipelines the
pre-projected inputs through VMEM in CHUNK-step blocks (the TPU grid is
sequential, so scratch carries state across grid steps and Pallas
double-buffers the block DMAs automatically).

Per step: one (B, H)·(H, 4H) MXU matmul + VPU gate math, torch gate order
(i, f, g, o).  Length masking is per-sample: state freezes at t ≥ length
(callers emulate ``batch_max``/``none`` modes by passing adjusted lengths).

Matches the lax.scan reference implementation to float tolerance
(tests/test_pallas.py); the scan path remains as the non-TPU fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_CHUNK = 128
MAX_B_BLOCK = 64
# VMEM budget for the two pipelined input blocks (of ~16 MB total; leaves
# room for h/c scratch, weights, and Mosaic's own stack).
_VMEM_INPUT_BUDGET = 8 * 1024 * 1024


def _pick_blocks(b: int, four_h: int) -> tuple[int, int]:
    """(batch_block, time_chunk) whose double-buffered input blocks fit the
    VMEM budget.  Large sweep batches (50-variant sensitivity curves,
    400-variant heatmap grids) overflow a fixed full-batch 128-step block;
    the grid blocks over batch first, then shrinks the time chunk."""
    b_block = min(-(-b // 8) * 8, MAX_B_BLOCK)
    chunk = _VMEM_INPUT_BUDGET // (2 * b_block * four_h * 4)
    chunk = min(MAX_CHUNK, max(8, chunk // 8 * 8))
    while 2 * b_block * chunk * four_h * 4 > _VMEM_INPUT_BUDGET and b_block > 8:
        b_block //= 2
        chunk = min(MAX_CHUNK,
                    max(8, (_VMEM_INPUT_BUDGET // (2 * b_block * four_h * 4))
                        // 8 * 8))
    return b_block, chunk


def _make_kernel(chunk: int):
    def _kernel(lengths_ref, xproj_ref, whh_ref, out_ref, h_ref, c_ref):
        """Grid = (batch blocks, time chunks); time iterates fastest, so the
        (h, c) scratch carries state across the t-chunks of one batch block.

        lengths_ref: (Bb, 1) i32 in VMEM
        xproj_ref:   (Bb, chunk, 4H) f32 — x@W_ih + b_ih + b_hh, this block
        whh_ref:     (H, 4H) f32
        out_ref:     (Bb, H) f32
        h_ref/c_ref: (Bb, H) f32 VMEM scratch
        """
        t_step = pl.program_id(1)
        num_t = pl.num_programs(1)

        @pl.when(t_step == 0)
        def _():
            h_ref[:] = jnp.zeros_like(h_ref)
            c_ref[:] = jnp.zeros_like(c_ref)

        hidden = h_ref.shape[1]
        lengths = lengths_ref[:]  # (Bb, 1)

        def body(i, carry):
            h, c = carry
            t = t_step * chunk + i
            gates = xproj_ref[:, i, :] + jnp.dot(
                h, whh_ref[:], preferred_element_type=jnp.float32)
            i_g = jax.nn.sigmoid(gates[:, :hidden])
            f_g = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
            g_g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
            o_g = jax.nn.sigmoid(gates[:, 3 * hidden:])
            c_new = f_g * c + i_g * g_g
            h_new = o_g * jnp.tanh(c_new)
            active = t < lengths  # (Bb, 1), broadcasts over H
            return jnp.where(active, h_new, h), jnp.where(active, c_new, c)

        # Mosaic supports only unroll=1 or full unroll; full unroll removes
        # the loop-carried register spills and halves B=1 latency vs scan.
        h, c = jax.lax.fori_loop(0, chunk, body, (h_ref[:], c_ref[:]),
                                 unroll=chunk)
        h_ref[:] = h
        c_ref[:] = c

        @pl.when(t_step == num_t - 1)
        def _():
            out_ref[:] = h_ref[:]

    return _kernel


def lstm_last_hidden_scan(x_proj: jnp.ndarray, w_hh: jnp.ndarray,
                          lengths: jnp.ndarray) -> jnp.ndarray:
    """lax.scan reference implementation — the non-TPU fallback, the numerics
    oracle for the kernel, and the backward pass of the custom VJP."""
    b, t, four_h = x_proj.shape
    hidden = four_h // 4
    h = jnp.zeros((b, hidden), jnp.float32)
    c = jnp.zeros((b, hidden), jnp.float32)
    active = jnp.arange(t)[:, None] < lengths[None, :]

    def step(carry, inp):
        h, c = carry
        xp, act = inp
        gates = xp + h @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        m = act[:, None]
        return (jnp.where(m, h_new, h), jnp.where(m, c_new, c)), None

    # unroll: the loop body is a (B, H)x(H, 4H) matmul + pointwise — far
    # below the TPU's per-iteration while-loop overhead (~2 us), so at
    # T=828 the loop spends more time turning around than computing.
    # Unrolling amortizes it in fwd-replay AND the transposed backward
    # scan jax.vjp derives from this function (measured: U-Net train step
    # 34.7 -> 33.9 ms/step; the remaining reverse scan is compute-bound).
    (h, _), _ = jax.lax.scan(
        step, (h, c),
        (jnp.swapaxes(x_proj.astype(jnp.float32), 0, 1), active),
        unroll=8)
    return h


@jax.custom_vjp
def lstm_last_hidden(x_proj: jnp.ndarray, w_hh: jnp.ndarray,
                     lengths: jnp.ndarray) -> jnp.ndarray:
    """(B, T, 4H) pre-projected inputs → (B, H) last hidden state.

    ``x_proj`` must already include x·W_ih + b_ih + b_hh.  ``lengths`` are
    per-sample true sequence lengths (state freezes beyond them).

    Inference runs the plain Pallas kernel.  Under differentiation, the
    forward stashes the per-step (h, c) states to HBM (~5 MB at B=8/T=828)
    and the backward runs a second Pallas kernel — a time-reversed scan with
    the gates recomputed from the stashed states (one extra (B,H)·(H,4H)
    matmul per step) — replacing the XLA reverse ``lax.scan`` + forward
    replay that cost ~2 ms/step of the round-2 train step (docs/TRACE.md).
    """
    return _pallas_forward(x_proj, w_hh, lengths)


def _vjp_fwd(x_proj, w_hh, lengths):
    h_last, h_all, c_all = _pallas_forward_stash(x_proj, w_hh, lengths)
    return h_last, (x_proj, w_hh, lengths, h_all, c_all)


def _vjp_bwd(residuals, g):
    x_proj, w_hh, lengths, h_all, c_all = residuals
    dx, dw = _pallas_backward(x_proj, w_hh, lengths, h_all, c_all, g)
    return dx, dw, None


lstm_last_hidden.defvjp(_vjp_fwd, _vjp_bwd)


def _make_stash_kernel(chunk: int, unroll: int | bool = True):
    """Forward kernel that additionally writes every step's (h, c) to HBM —
    the residuals the Pallas backward consumes.  ``unroll`` is full for
    Mosaic (which supports only 1 or full) and 1 under the interpreter,
    where a fully unrolled 128-step body is ~100× slower to execute."""

    def _kernel(lengths_ref, xproj_ref, whh_ref, out_ref, h_all_ref,
                c_all_ref, h_ref, c_ref):
        t_step = pl.program_id(1)
        num_t = pl.num_programs(1)

        @pl.when(t_step == 0)
        def _():
            h_ref[:] = jnp.zeros_like(h_ref)
            c_ref[:] = jnp.zeros_like(c_ref)

        hidden = h_ref.shape[1]
        lengths = lengths_ref[:]

        def body(i, carry):
            h, c = carry
            t = t_step * chunk + i
            gates = xproj_ref[:, i, :] + jnp.dot(
                h, whh_ref[:], preferred_element_type=jnp.float32)
            i_g = jax.nn.sigmoid(gates[:, :hidden])
            f_g = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
            g_g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
            o_g = jax.nn.sigmoid(gates[:, 3 * hidden:])
            c_new = f_g * c + i_g * g_g
            h_new = o_g * jnp.tanh(c_new)
            active = t < lengths
            h = jnp.where(active, h_new, h)
            c = jnp.where(active, c_new, c)
            h_all_ref[:, i, :] = h
            c_all_ref[:, i, :] = c
            return h, c

        h, c = jax.lax.fori_loop(0, chunk, body, (h_ref[:], c_ref[:]),
                                 unroll=chunk if unroll else 1)
        h_ref[:] = h
        c_ref[:] = c

        @pl.when(t_step == num_t - 1)
        def _():
            out_ref[:] = h_ref[:]

    return _kernel


def _make_bwd_kernel(chunk: int, num_t: int, num_b: int,
                     unroll: int | bool = True):
    """Time-reversed backward scan.  Grid = (batch blocks, time chunks) with
    the time index map reversed; the (dh, dc) scratch carries the reverse
    state across a batch block's chunks, and ``dw_ref`` (constant index map →
    VMEM-resident) accumulates h_{t-1}ᵀ·dgates over the whole grid."""

    def _kernel(lengths_ref, xproj_ref, hprev_ref, cprev_ref, call_ref,
                whh_ref, g_ref, dx_ref, dw_ref, dh_ref, dc_ref):
        b_step = pl.program_id(0)
        t_step = pl.program_id(1)

        @pl.when(t_step == 0)
        def _():
            dh_ref[:] = g_ref[:]
            dc_ref[:] = jnp.zeros_like(dc_ref)

        @pl.when((t_step == 0) & (b_step == 0))
        def _():
            dw_ref[:] = jnp.zeros_like(dw_ref)

        hidden = dh_ref.shape[1]
        lengths = lengths_ref[:]
        t0 = (num_t - 1 - t_step) * chunk

        def body(k, carry):
            dh, dc = carry
            i = chunk - 1 - k
            t = t0 + i
            h_prev = hprev_ref[:, i, :]
            c_prev = cprev_ref[:, i, :]
            c_t = call_ref[:, i, :]
            gates = xproj_ref[:, i, :] + jnp.dot(
                h_prev, whh_ref[:], preferred_element_type=jnp.float32)
            i_g = jax.nn.sigmoid(gates[:, :hidden])
            f_g = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
            g_g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
            o_g = jax.nn.sigmoid(gates[:, 3 * hidden:])
            tc = jnp.tanh(c_t)
            do = dh * tc * o_g * (1.0 - o_g)
            dct = dc + dh * o_g * (1.0 - tc * tc)
            di = dct * g_g * i_g * (1.0 - i_g)
            df = dct * c_prev * f_g * (1.0 - f_g)
            dg = dct * i_g * (1.0 - g_g * g_g)
            dgates = jnp.concatenate([di, df, dg, do], axis=1)
            active = t < lengths  # (Bb, 1)
            dgates = jnp.where(active, dgates, 0.0)
            dx_ref[:, i, :] = dgates
            # dW += h_{t-1}ᵀ · dgates  (contract the batch dim).  Mask
            # h_prev too: time/batch pad lanes hold undefined VMEM data, and
            # garbage · 0 would NaN if the garbage were inf.
            dw_ref[:] = dw_ref[:] + jax.lax.dot_general(
                jnp.where(active, h_prev, 0.0), dgates,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # inactive steps pass the adjoints straight through (the forward
            # froze the state there)
            dh_new = jnp.where(
                active,
                jax.lax.dot_general(dgates, whh_ref[:],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32),
                dh)
            dc_new = jnp.where(active, dct * f_g, dc)
            return dh_new, dc_new

        dh, dc = jax.lax.fori_loop(0, chunk, body, (dh_ref[:], dc_ref[:]),
                                   unroll=chunk if unroll else 1)
        dh_ref[:] = dh
        dc_ref[:] = dc

    return _kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_forward_stash(x_proj: jnp.ndarray, w_hh: jnp.ndarray,
                          lengths: jnp.ndarray, interpret: bool = False):
    b, t, four_h = x_proj.shape
    hidden = four_h // 4
    b_block, chunk = _pick_blocks(b, four_h)
    grid = (pl.cdiv(b, b_block), pl.cdiv(t, chunk))

    grid_spec = pl.GridSpec(
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_block, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, chunk, four_h), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, four_h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b_block, hidden), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, chunk, hidden), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, chunk, hidden), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_block, hidden), jnp.float32),
            pltpu.VMEM((b_block, hidden), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _make_stash_kernel(chunk, unroll=not interpret),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hidden), jnp.float32),
            jax.ShapeDtypeStruct((b, t, hidden), jnp.float32),
            jax.ShapeDtypeStruct((b, t, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(lengths.astype(jnp.int32).reshape(b, 1), x_proj.astype(jnp.float32),
      w_hh.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_backward(x_proj: jnp.ndarray, w_hh: jnp.ndarray,
                     lengths: jnp.ndarray, h_all: jnp.ndarray,
                     c_all: jnp.ndarray, g: jnp.ndarray,
                     interpret: bool = False):
    b, t, four_h = x_proj.shape
    hidden = four_h // 4
    # The backward streams ~11 (B,chunk,H)-equivalents vs the forward's 8;
    # shrink the time chunk accordingly so the double-buffers still fit.
    b_block, chunk = _pick_blocks(b, four_h * 3 // 2)
    grid = (pl.cdiv(b, b_block), pl.cdiv(t, chunk))
    num_b, num_t = grid

    zeros = jnp.zeros((b, 1, hidden), jnp.float32)
    h_prev = jnp.concatenate([zeros, h_all[:, :-1]], axis=1)
    c_prev = jnp.concatenate([zeros, c_all[:, :-1]], axis=1)

    # Batch-pad lanes would otherwise read undefined lengths and pollute the
    # dW reduction: pad lengths with 0 so every pad lane is always inactive.
    lengths = lengths.astype(jnp.int32)
    bp = num_b * b_block
    if bp != b:
        lengths = jnp.pad(lengths, (0, bp - b))

    rev_t = lambda i, j: (i, num_t - 1 - j, 0)
    grid_spec = pl.GridSpec(
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_block, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, chunk, four_h), rev_t,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, chunk, hidden), rev_t,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, chunk, hidden), rev_t,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, chunk, hidden), rev_t,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, four_h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, hidden), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b_block, chunk, four_h), rev_t,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, four_h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_block, hidden), jnp.float32),
            pltpu.VMEM((b_block, hidden), jnp.float32),
        ],
    )
    dx, dw = pl.pallas_call(
        _make_bwd_kernel(chunk, num_t, num_b, unroll=not interpret),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, t, four_h), jnp.float32),
            jax.ShapeDtypeStruct((hidden, four_h), jnp.float32),
        ],
        interpret=interpret,
    )(lengths.reshape(-1, 1), x_proj.astype(jnp.float32),
      h_prev, c_prev, c_all, w_hh.astype(jnp.float32),
      g.astype(jnp.float32))
    return dx.astype(x_proj.dtype), dw.astype(w_hh.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_forward(x_proj: jnp.ndarray, w_hh: jnp.ndarray,
                    lengths: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    b, t, four_h = x_proj.shape
    hidden = four_h // 4
    b_block, chunk = _pick_blocks(b, four_h)
    grid = (pl.cdiv(b, b_block), pl.cdiv(t, chunk))

    grid_spec = pl.GridSpec(
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_block, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, chunk, four_h), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, four_h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_block, hidden), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((b_block, hidden), jnp.float32),
            pltpu.VMEM((b_block, hidden), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _make_kernel(chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hidden), jnp.float32),
        interpret=interpret,
    )(lengths.astype(jnp.int32).reshape(b, 1), x_proj.astype(jnp.float32),
      w_hh.astype(jnp.float32))
