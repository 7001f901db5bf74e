"""LSTM layers, TPU-native.

The reference's encoder/decoder recurrence is TF1 ``dynamic_rnn`` /
``BasicLSTMCell`` graphs executed by the TF C++ runtime (SURVEY.md §4.1
hot loop 1). Here the computation is split the TPU way:

  * the input projection ``x @ Wx + b`` for *all* timesteps is one large
    MXU matmul (batched over B·T — this is where most LSTM FLOPs live);
  * the sequential recurrence ``gates = xp[t] + h @ Wh`` runs either as
    ``lax.scan`` (differentiable path used in training) or as a fused
    Pallas kernel (inference): weights and (h, c) stay VMEM-resident
    across timesteps, timestep blocks of the projected input stream
    through the Pallas grid pipeline, and per-step masking reproduces
    ``dynamic_rnn(sequence_length=...)`` semantics — state freezes and
    outputs are zero past each row's length.

Cell semantics (matching TF1 ``BasicLSTMCell``): gate order (i, g, f, o)
is internal — we use (i, f, g, o); ``forget_bias`` (default 1.0) is added
to the forget preactivation at runtime, not folded into the stored bias;
activations sigmoid/tanh; no peepholes, no projection.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from phones_las_tpu.ops.masking import length_mask

_HI = jax.lax.Precision.HIGHEST


class LSTMParams(NamedTuple):
    """One direction's parameters. wx: [D, 4U], wh: [U, 4U], b: [4U]."""

    wx: jnp.ndarray
    wh: jnp.ndarray
    b: jnp.ndarray

    @property
    def units(self) -> int:
        return self.wh.shape[0]


def init_lstm_params(key, input_dim: int, units: int, dtype=jnp.float32) -> LSTMParams:
    """Glorot-uniform kernels (TF1 default initializer), zero bias.

    TF1's LSTMCell holds ONE concatenated kernel [D+U, 4U], so glorot's
    fan-in is D+U for both halves — wx and wh share the same limit
    sqrt(6/(D+U+4U)) rather than being initialized per-matrix."""
    k1, k2 = jax.random.split(key)
    scale = jnp.sqrt(6.0 / (input_dim + units + 4 * units))
    return LSTMParams(
        wx=jax.random.uniform(k1, (input_dim, 4 * units), dtype, -scale, scale),
        wh=jax.random.uniform(k2, (units, 4 * units), dtype, -scale, scale),
        b=jnp.zeros((4 * units,), dtype),
    )


def _cell_math(gates, c, forget_bias):
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f + forget_bias) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


# Recurrent-dot precision: 'highest' = 6-pass f32 MXU (parity mode);
# 'bf16' = single-pass bf16×bf16→f32 MXU dot with f32 cell state, gate
# math, and accumulation (the production-mode counterpart of XLA's
# DEFAULT matmul precision, which the surrounding input-projection
# einsums already get from the ambient jax.default_matmul_precision).
def _rec_dot(h, wh_ref, prec: str):
    if prec == "bf16":
        return jnp.dot(
            h.astype(jnp.bfloat16), wh_ref[:],
            preferred_element_type=jnp.float32,
        )
    return jnp.dot(h, wh_ref[:], preferred_element_type=jnp.float32, precision=_HI)


def _rec_wh(wh, prec: str):
    return wh.astype(jnp.bfloat16) if prec == "bf16" else wh


def resolve_rnn_precision(precision: Optional[str] = None) -> str:
    """None → follow the ambient ``jax.default_matmul_precision`` scope:
    'default'/'fastest'/'bfloat16' map to the bf16 recurrent dot, anything
    else (including no scope at all) keeps the 6-pass f32 parity dot. The
    ambient value is part of jit's trace context, so parity and production
    callers get separately compiled kernels."""
    if precision is not None:
        return precision
    amb = jax.config.jax_default_matmul_precision
    return "bf16" if amb in ("default", "fastest", "bfloat16") else "highest"


def _recurrence_xla(
    xp_tm: jnp.ndarray,  # [T, B, 4U] time-major projected input (bias included)
    mask_tm: jnp.ndarray,  # [T, B] 1.0 for valid steps
    wh: jnp.ndarray,
    forget_bias: float,
    reverse: bool,
    prec: str = "highest",
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    t, b, four_u = xp_tm.shape
    u = four_u // 4
    h0 = jnp.zeros((b, u), xp_tm.dtype)
    c0 = jnp.zeros((b, u), xp_tm.dtype)
    wh_d = _rec_wh(wh, prec)

    def step(carry, inp):
        h, c = carry
        xp_t, m = inp
        # same dot-precision semantics as the Pallas kernels (_rec_dot):
        # bf16 single-pass in production mode, 6-pass f32 in parity mode
        if prec == "bf16":
            gates = xp_t + jnp.dot(
                h.astype(jnp.bfloat16), wh_d,
                preferred_element_type=jnp.float32,
            )
        else:
            gates = xp_t + jnp.matmul(h, wh_d, precision=_HI)
        h_new, c_new = _cell_math(gates, c, forget_bias)
        m = m[:, None]
        h = m * h_new + (1.0 - m) * h
        c = m * c_new + (1.0 - m) * c
        return (h, c), m * h_new

    (h, c), out = jax.lax.scan(step, (h0, c0), (xp_tm, mask_tm), reverse=reverse)
    return out, (h, c)


def _make_lstm_kernel(tc: int, reverse: bool, forget_bias: float, prec: str):
    def kernel(xp_ref, mask_ref, wh_ref, out_ref, hfin_ref, cfin_ref, h_scr, c_scr):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            h_scr[:] = jnp.zeros_like(h_scr)
            c_scr[:] = jnp.zeros_like(c_scr)

        steps = range(tc - 1, -1, -1) if reverse else range(tc)
        for tt in steps:
            gates = xp_ref[tt].astype(jnp.float32) + _rec_dot(h_scr[:], wh_ref, prec)
            h_new, c_new = _cell_math(gates, c_scr[:], forget_bias)
            m = mask_ref[tt][:, None]
            h_scr[:] = m * h_new + (1.0 - m) * h_scr[:]
            c_scr[:] = m * c_new + (1.0 - m) * c_scr[:]
            out_ref[tt] = (m * h_new).astype(out_ref.dtype)
        hfin_ref[:] = h_scr[:].astype(hfin_ref.dtype)
        cfin_ref[:] = c_scr[:].astype(cfin_ref.dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("reverse", "forget_bias", "interpret", "prec")
)
def _recurrence_pallas(
    xp_tm: jnp.ndarray,  # [T, B, 4U]
    mask_tm: jnp.ndarray,  # [T, B]
    wh: jnp.ndarray,
    reverse: bool = False,
    forget_bias: float = 1.0,
    interpret: bool = False,
    prec: str = "highest",
):
    """Fused recurrence: grid streams TC-step blocks (auto double-buffered
    by the Pallas pipeline); h/c persist in VMEM scratch across the
    sequential TPU grid. ``reverse`` streams blocks back-to-front and
    unrolls steps within a block in reverse, so outputs land at their
    original time indices (matching ``lax.scan(reverse=True)``)."""
    t, b, four_u = xp_tm.shape
    u = four_u // 4
    # time-chunk sized to a ~12 MB VMEM budget: the Pallas pipeline
    # double-buffers the [tc, B, 4U] input and [tc, B, U] output blocks,
    # and Wh + (h, c) scratch are resident.
    resident = u * four_u * 4 + 2 * b * u * 4
    per_tc = 2 * 4 * b * (four_u + u + 1)
    budget_tc = max(8, min(32, (12 * 2**20 - resident) // per_tc) // 8 * 8)
    # Mosaic block rule: sublane dim (tc) must be a multiple of 8 or equal
    # the (padded) array dim — single-block when the sequence is short.
    tc = t if t <= budget_tc else budget_tc
    n_blocks = pl.cdiv(t, tc)
    t_pad = n_blocks * tc
    if t_pad != t:
        xp_tm = jnp.pad(xp_tm, ((0, t_pad - t), (0, 0), (0, 0)))
        mask_tm = jnp.pad(mask_tm, ((0, t_pad - t), (0, 0)))

    blk = lambda i: ((n_blocks - 1 - i) if reverse else i, 0, 0)
    blk2 = lambda i: ((n_blocks - 1 - i) if reverse else i, 0)

    out, hfin, cfin = pl.pallas_call(
        _make_lstm_kernel(tc, reverse, forget_bias, prec),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((tc, b, four_u), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, b), blk2, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, four_u), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tc, b, u), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, u), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, u), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            # in bf16 mode the streamed output block follows xp's dtype
            # (half the HBM↔VMEM traffic); the tiny final states stay f32
            jax.ShapeDtypeStruct((t_pad, b, u), xp_tm.dtype),
            jax.ShapeDtypeStruct((b, u), jnp.float32),
            jax.ShapeDtypeStruct((b, u), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, u), jnp.float32),
            pltpu.VMEM((b, u), jnp.float32),
        ],
        interpret=interpret,
    )(xp_tm, mask_tm, _rec_wh(wh, prec))
    return out[:t], (hfin, cfin)


def _make_bilstm_kernel(tc: int, forget_bias: float, prec: str):
    """Both directions in one grid pass: at grid step i the forward
    direction consumes time-block i while the backward direction consumes
    block n-1-i (each input stream has its own index map). The two
    recurrences are independent, so their per-step [B,U]×[U,4U] MXU ops
    interleave and hide each other's serial latency."""

    def kernel(xpf_ref, xpb_ref, maskf_ref, maskb_ref, whf_ref, whb_ref,
               outf_ref, outb_ref, hff, cff, hfb, cfb,
               hf_scr, cf_scr, hb_scr, cb_scr):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            for s in (hf_scr, cf_scr, hb_scr, cb_scr):
                s[:] = jnp.zeros_like(s)

        for tt in range(tc):
            tb = tc - 1 - tt  # backward direction's step within its block
            gates_f = xpf_ref[tt].astype(jnp.float32) + _rec_dot(hf_scr[:], whf_ref, prec)
            gates_b = xpb_ref[tb].astype(jnp.float32) + _rec_dot(hb_scr[:], whb_ref, prec)
            hf_new, cf_new = _cell_math(gates_f, cf_scr[:], forget_bias)
            hb_new, cb_new = _cell_math(gates_b, cb_scr[:], forget_bias)
            mf = maskf_ref[tt][:, None]
            mb = maskb_ref[tb][:, None]
            hf_scr[:] = mf * hf_new + (1.0 - mf) * hf_scr[:]
            cf_scr[:] = mf * cf_new + (1.0 - mf) * cf_scr[:]
            hb_scr[:] = mb * hb_new + (1.0 - mb) * hb_scr[:]
            cb_scr[:] = mb * cb_new + (1.0 - mb) * cb_scr[:]
            outf_ref[tt] = (mf * hf_new).astype(outf_ref.dtype)
            outb_ref[tb] = (mb * hb_new).astype(outb_ref.dtype)
        hff[:] = hf_scr[:].astype(hff.dtype)
        cff[:] = cf_scr[:].astype(cff.dtype)
        hfb[:] = hb_scr[:].astype(hfb.dtype)
        cfb[:] = cb_scr[:].astype(cfb.dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("forget_bias", "interpret", "prec")
)
def _recurrence_pallas_bidir(
    xpf_tm, xpb_tm, mask_tm, whf, whb, forget_bias=1.0, interpret=False,
    prec: str = "highest",
):
    """Fused bidirectional recurrence (forward-only; used at inference).
    → (out_f, out_b, (hf, cf), (hb, cb)) with lax.scan-equivalent
    semantics for each direction."""
    t, b, four_u = xpf_tm.shape
    u = four_u // 4
    # two directions double the streamed blocks and resident weights
    resident = 2 * u * four_u * 4 + 4 * b * u * 4
    per_tc = 2 * 2 * 4 * b * (four_u + u + 1)
    budget_tc = max(8, min(32, (12 * 2**20 - resident) // per_tc) // 8 * 8)
    tc = t if t <= budget_tc else budget_tc
    n_blocks = pl.cdiv(t, tc)
    t_pad = n_blocks * tc
    if t_pad != t:
        pad3 = ((0, t_pad - t), (0, 0), (0, 0))
        xpf_tm = jnp.pad(xpf_tm, pad3)
        xpb_tm = jnp.pad(xpb_tm, pad3)
        mask_tm = jnp.pad(mask_tm, ((0, t_pad - t), (0, 0)))

    fwd3 = lambda i: (i, 0, 0)
    bwd3 = lambda i: (n_blocks - 1 - i, 0, 0)
    fwd2 = lambda i: (i, 0)
    bwd2 = lambda i: (n_blocks - 1 - i, 0)
    fix = lambda i: (0, 0)

    outs = pl.pallas_call(
        _make_bilstm_kernel(tc, forget_bias, prec),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((tc, b, four_u), fwd3, memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, b, four_u), bwd3, memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, b), fwd2, memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, b), bwd2, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, four_u), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, four_u), fix, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tc, b, u), fwd3, memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, b, u), bwd3, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, u), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, u), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, u), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, u), fix, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, b, u), xpf_tm.dtype),
            jax.ShapeDtypeStruct((t_pad, b, u), xpf_tm.dtype),
            jax.ShapeDtypeStruct((b, u), jnp.float32),
            jax.ShapeDtypeStruct((b, u), jnp.float32),
            jax.ShapeDtypeStruct((b, u), jnp.float32),
            jax.ShapeDtypeStruct((b, u), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b, u), jnp.float32) for _ in range(4)],
        interpret=interpret,
    )(xpf_tm, xpb_tm, mask_tm, mask_tm, _rec_wh(whf, prec), _rec_wh(whb, prec))
    out_f, out_b, hf, cf, hb, cb = outs
    return out_f[:t], out_b[:t], (hf, cf), (hb, cb)


def _block_budget(b: int, u: int, four_u: int, t: int, streams: int) -> int:
    """Time-chunk for a ~12MB VMEM budget given `streams` U-sized streamed
    arrays per step (input+output, double-buffered) plus the 4U input."""
    resident = u * four_u * 4 * 2 + 4 * b * u * 4  # Wh (+dWh) + state scratch
    per_tc = 2 * 4 * b * (four_u + streams * u + 1)
    budget_tc = max(8, min(32, (12 * 2**20 - resident) // per_tc) // 8 * 8)
    return t if t <= budget_tc else budget_tc


def _make_lstm_fwd_res_kernel(tc: int, reverse: bool, forget_bias: float,
                              prec: str):
    """Forward kernel that also saves the residuals the backward pass
    needs: the *carried state before each step* (h_{t-1}, c_{t-1} in the
    forward iteration order). Saving the pre-step state directly — rather
    than the raw post-states — lets the backward kernel consume it with no
    XLA shift/mask reconstruction pass (a full T·B·2U HBM read+write). In
    bf16 mode the residuals are stored bf16: the backward's gate-recompute
    dot casts h_prev to bf16 anyway, so only c_prev loses precision (used
    in df and dc_prev), bounded by the smoke/VJP test tolerances."""

    def kernel(xp_ref, mask_ref, wh_ref, out_ref, hprev_ref, cprev_ref,
               hfin_ref, cfin_ref, h_scr, c_scr):
        i = pl.program_id(0)
        res_dtype = hprev_ref.dtype

        @pl.when(i == 0)
        def _():
            h_scr[:] = jnp.zeros_like(h_scr)
            c_scr[:] = jnp.zeros_like(c_scr)

        steps = range(tc - 1, -1, -1) if reverse else range(tc)
        for tt in steps:
            hprev_ref[tt] = h_scr[:].astype(res_dtype)
            cprev_ref[tt] = c_scr[:].astype(res_dtype)
            gates = xp_ref[tt].astype(jnp.float32) + _rec_dot(h_scr[:], wh_ref, prec)
            h_new, c_new = _cell_math(gates, c_scr[:], forget_bias)
            m = mask_ref[tt][:, None]
            h_scr[:] = m * h_new + (1.0 - m) * h_scr[:]
            c_scr[:] = m * c_new + (1.0 - m) * c_scr[:]
            out_ref[tt] = (m * h_new).astype(out_ref.dtype)
        hfin_ref[:] = h_scr[:].astype(hfin_ref.dtype)
        cfin_ref[:] = c_scr[:].astype(cfin_ref.dtype)

    return kernel


def _make_lstm_bwd_kernel(tc: int, reverse: bool, forget_bias: float,
                          prec: str):
    """Backward-pass kernel: iterates time in the opposite direction of
    the forward pass, recomputes the gate activations from (xp, h_prev)
    — one extra MXU matmul instead of 4U of saved activations — and
    accumulates dWh in VMEM across the whole grid.

    Only the dh chain is genuinely sequential, so the two dots whose
    operands don't depend on it are hoisted out of the step loop into
    block-level matmuls (round 4, the roadmap's "deeper MFU on the VJP
    recompute kernels" item):

      * the gate recompute `xp + h_prev @ Wh` runs once per block as a
        [tc·B, U] × [U, 4U] MXU pass into a VMEM scratch (row-identical
        to the per-step dots — matmul rows are independent);
      * dWh accumulates once per block as a [U, tc·B] × [tc·B, 4U]
        contraction over the dgates the loop already wrote to `dxp_ref`
        (masked steps contribute zeros by construction, so summing the
        whole block is exact; only the f32 summation order changes).

    Per valid step (mask m=1; masked steps pass gradients through):
      dh'_t   = m·(dout_t + dh)
      dc'_t   = m·dc + dh'_t·σ(o)·(1−tanh²c')
      dgates  = [di, df, dg, do]   (zero at masked steps by construction)
      dxp_t   = dgates
      dh_prev = (1−m)·dh + dgates @ Whᵀ      ← the one dot still serial
      dc_prev = (1−m)·dc + dc'_t·σ(f+fb)
    """

    def kernel(xp_ref, hprev_ref, cprev_ref, dout_ref, mask_ref, wh_ref,
               dhfin_ref, dcfin_ref, dxp_ref, dwh_ref, dh_scr, dc_scr,
               dwh_scr, gates_scr):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        b = dh_scr.shape[0]
        u = dh_scr.shape[1]

        @pl.when(i == 0)
        def _():
            dh_scr[:] = dhfin_ref[:]
            dc_scr[:] = dcfin_ref[:]
            dwh_scr[:] = jnp.zeros_like(dwh_scr)

        # hoisted gate recompute for the whole block, with the SAME dot
        # mode as the forward pass so the VJP differentiates the function
        # that actually ran
        hp_all = hprev_ref[:].reshape(tc * b, u)
        gates_scr[:] = (
            xp_ref[:].astype(jnp.float32).reshape(tc * b, 4 * u)
            + _rec_dot(hp_all, wh_ref, prec)
        ).reshape(tc, b, 4 * u)

        if prec == "bf16":  # f32 accumulation either way
            kw = dict(preferred_element_type=jnp.float32)
        else:
            kw = dict(preferred_element_type=jnp.float32, precision=_HI)

        # opposite order vs forward
        steps = range(tc) if reverse else range(tc - 1, -1, -1)
        for tt in steps:
            m = mask_ref[tt][:, None]
            cprev = cprev_ref[tt].astype(jnp.float32)
            gi, gf, gg, go = jnp.split(gates_scr[tt], 4, axis=-1)
            si = jax.nn.sigmoid(gi)
            sf = jax.nn.sigmoid(gf + forget_bias)
            sg = jnp.tanh(gg)
            so = jax.nn.sigmoid(go)
            c_new = sf * cprev + si * sg
            tch = jnp.tanh(c_new)

            dh_tot = m * (dout_ref[tt].astype(jnp.float32) + dh_scr[:])
            dc_new = m * dc_scr[:] + dh_tot * so * (1.0 - tch * tch)
            do = dh_tot * tch * so * (1.0 - so)
            df = dc_new * cprev * sf * (1.0 - sf)
            di = dc_new * sg * si * (1.0 - si)
            dg = dc_new * si * (1.0 - sg * sg)
            dgates = jnp.concatenate([di, df, dg, do], axis=-1)
            dxp_ref[tt] = dgates.astype(dxp_ref.dtype)
            dgates_d = dgates.astype(jnp.bfloat16) if prec == "bf16" else dgates
            dh_scr[:] = (1.0 - m) * dh_scr[:] + jax.lax.dot_general(
                dgates_d, wh_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
                **kw,
            )
            dc_scr[:] = (1.0 - m) * dc_scr[:] + dc_new * sf

        # hoisted dWh for the whole block, reading back the dgates the
        # loop wrote (bf16 when dxp streams bf16 — the loop cast them for
        # its per-step dots anyway)
        dg_all = dxp_ref[:].reshape(tc * b, 4 * u)
        if prec == "bf16":
            hp_d = hp_all.astype(jnp.bfloat16)
            dg_all = dg_all.astype(jnp.bfloat16)
        else:
            hp_d = hp_all
        dwh_scr[:] += jax.lax.dot_general(
            hp_d, dg_all, dimension_numbers=(((0,), (0,)), ((), ())), **kw
        )

        @pl.when(i == n - 1)
        def _():
            dwh_ref[:] = dwh_scr[:]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("reverse", "forget_bias", "interpret", "prec")
)
def _recurrence_pallas_residual(
    xp_tm, mask_tm, wh, reverse=False, forget_bias=1.0, interpret=False,
    prec: str = "highest",
):
    t, b, four_u = xp_tm.shape
    u = four_u // 4
    res_dtype = jnp.bfloat16 if prec == "bf16" else xp_tm.dtype
    tc = _block_budget(b, u, four_u, t, streams=3)
    n_blocks = pl.cdiv(t, tc)
    t_pad = n_blocks * tc
    if t_pad != t:
        xp_tm = jnp.pad(xp_tm, ((0, t_pad - t), (0, 0), (0, 0)))
        mask_tm = jnp.pad(mask_tm, ((0, t_pad - t), (0, 0)))
    blk = lambda i: ((n_blocks - 1 - i) if reverse else i, 0, 0)
    blk2 = lambda i: ((n_blocks - 1 - i) if reverse else i, 0)
    fix = lambda i: (0, 0)

    out, hprev, cprev, hfin, cfin = pl.pallas_call(
        _make_lstm_fwd_res_kernel(tc, reverse, forget_bias, prec),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((tc, b, four_u), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, b), blk2, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, four_u), fix, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tc, b, u), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, b, u), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, b, u), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, u), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, u), fix, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, b, u), xp_tm.dtype),
            jax.ShapeDtypeStruct((t_pad, b, u), res_dtype),
            jax.ShapeDtypeStruct((t_pad, b, u), res_dtype),
            jax.ShapeDtypeStruct((b, u), jnp.float32),
            jax.ShapeDtypeStruct((b, u), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, u), jnp.float32),
            pltpu.VMEM((b, u), jnp.float32),
        ],
        interpret=interpret,
    )(xp_tm, mask_tm, _rec_wh(wh, prec))
    return out[:t], hprev[:t], cprev[:t], hfin, cfin


@functools.partial(
    jax.jit, static_argnames=("reverse", "forget_bias", "interpret", "prec")
)
def _recurrence_pallas_bwd(
    xp_tm, mask_tm, wh, hprev, cprev, dout, dhfin, dcfin,
    reverse=False, forget_bias=1.0, interpret=False, prec: str = "highest",
):
    """hprev/cprev are the carried-state residuals the forward residual
    kernel saved *before* each step (so no shift/mask reconstruction is
    needed here); they may be bf16 in bf16 mode."""
    t, b, four_u = xp_tm.shape
    u = four_u // 4
    # streams=9: the 7 streamed u-sized arrays plus the single-buffered
    # [tc, B, 4U] f32 gates scratch (= 2 double-buffered u-stream units)
    tc = _block_budget(b, u, four_u, t, streams=9)
    n_blocks = pl.cdiv(t, tc)
    t_pad = n_blocks * tc
    if t_pad != t:
        pad3 = ((0, t_pad - t), (0, 0), (0, 0))
        xp_tm = jnp.pad(xp_tm, pad3)
        hprev = jnp.pad(hprev, pad3)
        cprev = jnp.pad(cprev, pad3)
        dout = jnp.pad(dout, pad3)
        mask_tm = jnp.pad(mask_tm, ((0, t_pad - t), (0, 0)))

    # backward iterates blocks in the OPPOSITE direction of forward
    blk = lambda i: (i if reverse else (n_blocks - 1 - i), 0, 0)
    blk2 = lambda i: (i if reverse else (n_blocks - 1 - i), 0)
    fix = lambda i: (0, 0)

    dxp, dwh = pl.pallas_call(
        _make_lstm_bwd_kernel(tc, reverse, forget_bias, prec),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((tc, b, four_u), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, b, u), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, b, u), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, b, u), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, b), blk2, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, four_u), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, u), fix, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, u), fix, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tc, b, four_u), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((u, four_u), fix, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            # dxp follows xp's (possibly bf16) dtype; dWh accumulates and
            # lands f32 regardless
            jax.ShapeDtypeStruct((t_pad, b, four_u), xp_tm.dtype),
            jax.ShapeDtypeStruct((u, four_u), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, u), jnp.float32),
            pltpu.VMEM((b, u), jnp.float32),
            pltpu.VMEM((u, four_u), jnp.float32),
            pltpu.VMEM((tc, b, four_u), jnp.float32),
        ],
        interpret=interpret,
    )(xp_tm, hprev, cprev, dout, mask_tm, _rec_wh(wh, prec), dhfin, dcfin)
    return dxp[:t], dwh


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def pallas_recurrence(xp_tm, mask_tm, wh, reverse, forget_bias, interpret,
                      prec="highest"):
    """Differentiable fused recurrence (custom VJP: Pallas fwd + bwd)."""
    return _recurrence_pallas(
        xp_tm, mask_tm, wh, reverse=reverse, forget_bias=forget_bias,
        interpret=interpret, prec=prec,
    )


def _pallas_rec_fwd(xp_tm, mask_tm, wh, reverse, forget_bias, interpret, prec):
    out, hprev, cprev, hfin, cfin = _recurrence_pallas_residual(
        xp_tm, mask_tm, wh, reverse=reverse, forget_bias=forget_bias,
        interpret=interpret, prec=prec,
    )
    return (out, (hfin, cfin)), (xp_tm, mask_tm, wh, hprev, cprev)


def _pallas_rec_bwd(reverse, forget_bias, interpret, prec, res, ct):
    xp_tm, mask_tm, wh, hprev, cprev = res
    dout, (dhfin, dcfin) = ct
    dxp, dwh = _recurrence_pallas_bwd(
        xp_tm, mask_tm, wh, hprev, cprev, dout, dhfin, dcfin,
        reverse=reverse, forget_bias=forget_bias, interpret=interpret,
        prec=prec,
    )
    return dxp, jnp.zeros_like(mask_tm), dwh


pallas_recurrence.defvjp(_pallas_rec_fwd, _pallas_rec_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def pallas_bidir_recurrence(xpf, xpb, mask_tm, whf, whb, forget_bias,
                            interpret, prec="highest"):
    """Differentiable fused bidirectional recurrence: the primal runs both
    directions interleaved in ONE kernel (independent chains hide each
    other's serial matmul latency — measured 1.42× over two sequential
    kernels); the backward pass reuses the per-direction residual/VJP
    kernels."""
    out_f, out_b, st_f, st_b = _recurrence_pallas_bidir(
        xpf, xpb, mask_tm, whf, whb, forget_bias=forget_bias,
        interpret=interpret, prec=prec,
    )
    return out_f, out_b, st_f, st_b


def _bidir_fwd(xpf, xpb, mask_tm, whf, whb, forget_bias, interpret, prec):
    out_f, hprev_f, cprev_f, hf, cf = _recurrence_pallas_residual(
        xpf, mask_tm, whf, reverse=False, forget_bias=forget_bias,
        interpret=interpret, prec=prec,
    )
    out_b, hprev_b, cprev_b, hb, cb = _recurrence_pallas_residual(
        xpb, mask_tm, whb, reverse=True, forget_bias=forget_bias,
        interpret=interpret, prec=prec,
    )
    res = (xpf, xpb, mask_tm, whf, whb, hprev_f, cprev_f, hprev_b, cprev_b)
    return (out_f, out_b, (hf, cf), (hb, cb)), res


def _bidir_bwd(forget_bias, interpret, prec, res, ct):
    # NB: a fused two-direction backward kernel (mirroring the fused
    # forward's 1.42x interleave win) measured EXACTLY the same as these
    # two sequential calls (10.93 vs 10.95 ms encoder fwd+bwd, B=32 x 8 s
    # v5e): the VJP streams 7 U-sized arrays per direction per step, so it
    # is VMEM-bandwidth-bound, not serial-latency-bound like the forward.
    # Negative result recorded in docs/PERF.md; kept sequential for
    # simplicity.
    xpf, xpb, mask_tm, whf, whb, hprev_f, cprev_f, hprev_b, cprev_b = res
    dout_f, dout_b, (dhf, dcf), (dhb, dcb) = ct
    dxpf, dwhf = _recurrence_pallas_bwd(
        xpf, mask_tm, whf, hprev_f, cprev_f, dout_f, dhf, dcf,
        reverse=False, forget_bias=forget_bias, interpret=interpret, prec=prec,
    )
    dxpb, dwhb = _recurrence_pallas_bwd(
        xpb, mask_tm, whb, hprev_b, cprev_b, dout_b, dhb, dcb,
        reverse=True, forget_bias=forget_bias, interpret=interpret, prec=prec,
    )
    return dxpf, dxpb, jnp.zeros_like(mask_tm), dwhf, dwhb


pallas_bidir_recurrence.defvjp(_bidir_fwd, _bidir_bwd)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def lstm_layer(
    params: LSTMParams,
    x: jnp.ndarray,  # [B, T, D]
    lengths: jnp.ndarray,  # [B]
    *,
    reverse: bool = False,
    forget_bias: float = 1.0,
    implementation: str = "xla",  # 'xla' | 'pallas' (both differentiable)
    precision: Optional[str] = None,  # None → ambient; 'highest' | 'bf16'
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Unidirectional LSTM over a padded batch.

    Returns (outputs [B, T, U] with zeros past each length, (h, c) final
    state at each row's true boundary).
    """
    b, t, _ = x.shape
    xp = jnp.einsum("btd,dh->bth", x, params.wx) + params.b
    xp_tm = jnp.transpose(xp, (1, 0, 2))
    # mask stays f32 even over bf16 inputs (kernel gate math is f32, and
    # Mosaic can't minor-dim-broadcast 16-bit vectors)
    mask_tm = jnp.transpose(length_mask(lengths, t, jnp.float32), (1, 0))
    if implementation == "pallas":
        prec = resolve_rnn_precision(precision)
        if prec == "bf16":
            # production mode streams the 4U input block bf16: gate math
            # still runs f32 in-kernel, but the dominant HBM↔VMEM stream
            # (and the dxp/out streams, which follow xp's dtype) halve
            xp_tm = xp_tm.astype(jnp.bfloat16)
        # large batches can't fit a >=8-step time chunk in VMEM; process
        # independent batch slices sequentially (identical results).
        max_b = 128
        if b > max_b:
            outs, hs, cs = [], [], []
            for ofs in range(0, b, max_b):
                o, (h_, c_) = pallas_recurrence(
                    xp_tm[:, ofs : ofs + max_b],
                    mask_tm[:, ofs : ofs + max_b],
                    params.wh, reverse, forget_bias, _use_interpret(), prec,
                )
                outs.append(o)
                hs.append(h_)
                cs.append(c_)
            out_tm = jnp.concatenate(outs, axis=1)
            state = (jnp.concatenate(hs, axis=0), jnp.concatenate(cs, axis=0))
            return jnp.transpose(out_tm, (1, 0, 2)), state
        out_tm, state = pallas_recurrence(
            xp_tm, mask_tm, params.wh, reverse, forget_bias, _use_interpret(),
            prec,
        )
    else:
        out_tm, state = _recurrence_xla(
            xp_tm, mask_tm, params.wh, forget_bias, reverse,
            prec=resolve_rnn_precision(precision),
        )
    return jnp.transpose(out_tm, (1, 0, 2)), state


def bilstm_layer(
    fwd: LSTMParams,
    bwd: LSTMParams,
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    forget_bias: float = 1.0,
    implementation: str = "xla",
    precision: Optional[str] = None,  # None → ambient; 'highest' | 'bf16'
) -> Tuple[jnp.ndarray, Tuple]:
    """Bidirectional LSTM: concat(fwd, bwd) over the feature axis,
    matching ``tf.nn.bidirectional_dynamic_rnn`` output layout. The
    pallas path computes both directions' input projections as ONE
    batched matmul and runs both recurrences interleaved in one fused
    kernel."""
    if implementation != "pallas":
        out_f, st_f = lstm_layer(
            fwd, x, lengths, reverse=False, forget_bias=forget_bias,
            implementation=implementation, precision=precision,
        )
        out_b, st_b = lstm_layer(
            bwd, x, lengths, reverse=True, forget_bias=forget_bias,
            implementation=implementation, precision=precision,
        )
        return jnp.concatenate([out_f, out_b], axis=-1), (st_f, st_b)

    b, t, _ = x.shape
    # separate projections: a fused [D, 8U] matmul + lane split costs two
    # full-tensor HBM copies that outweigh the single-matmul win
    xpf_tm = jnp.transpose(
        jnp.einsum("btd,dh->bth", x, fwd.wx) + fwd.b, (1, 0, 2)
    )
    xpb_tm = jnp.transpose(
        jnp.einsum("btd,dh->bth", x, bwd.wx) + bwd.b, (1, 0, 2)
    )
    mask_tm = jnp.transpose(length_mask(lengths, t, jnp.float32), (1, 0))

    interp = _use_interpret()
    prec = resolve_rnn_precision(precision)
    if prec == "bf16":  # see lstm_layer: halve the streamed blocks
        xpf_tm = xpf_tm.astype(jnp.bfloat16)
        xpb_tm = xpb_tm.astype(jnp.bfloat16)
    max_b = 64  # bidir streams double per-row VMEM; halve the chunk bound
    if b > max_b:
        outs, sts_f, sts_b = [], [], []
        for ofs in range(0, b, max_b):
            of, ob, st_f, st_b = pallas_bidir_recurrence(
                xpf_tm[:, ofs : ofs + max_b], xpb_tm[:, ofs : ofs + max_b],
                mask_tm[:, ofs : ofs + max_b], fwd.wh, bwd.wh,
                forget_bias, interp, prec,
            )
            outs.append(jnp.concatenate([of, ob], axis=-1))
            sts_f.append(st_f)
            sts_b.append(st_b)
        out = jnp.concatenate(outs, axis=1)
        cat = lambda sts: tuple(
            jnp.concatenate([s[i] for s in sts], axis=0) for i in range(2)
        )
        return jnp.transpose(out, (1, 0, 2)), (cat(sts_f), cat(sts_b))

    out_f, out_b, st_f, st_b = pallas_bidir_recurrence(
        xpf_tm, xpb_tm, mask_tm, fwd.wh, bwd.wh, forget_bias, interp, prec
    )
    out = jnp.concatenate([out_f, out_b], axis=-1)
    return jnp.transpose(out, (1, 0, 2)), (st_f, st_b)
