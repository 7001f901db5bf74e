"""On-hardware Pallas parity smoke (r1 VERDICT item 6).

CI runs every Pallas kernel in interpret mode on CPU, which catches logic
bugs but not Mosaic-compile regressions (block rules, VMEM budgets at real
shapes). This script runs each kernel ONCE on the current backend at a
realistic shape and asserts it matches the XLA reference path:

  * fused feature front-end            vs pure-jax front-end
  * unidirectional LSTM recurrence     vs lax.scan
  * recurrence VJP (dxp, dWh)          vs jax.grad through lax.scan
  * fused bidirectional recurrence     vs two lax.scans
  * fused greedy decoder (B<=8 niche)  vs the XLA greedy scan

Usage:  python tools/tpu_smoke.py        (~2 min warm, on the TPU)
        JAX_PLATFORMS=cpu python tools/tpu_smoke.py   (interpret-mode check)

Exit code 0 + one "SMOKE OK" line on success.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")  # repo root


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fetch(x):
    # on the tunneled backend only a host fetch reliably synchronizes
    return np.asarray(x)


def main():
    import jax
    import jax.numpy as jnp

    from phones_las_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    backend = jax.default_backend()
    interpret = backend != "tpu"
    log(f"backend={backend} interpret={interpret}")
    t_start = time.time()
    failures = []

    def check(name, got, want, tol):
        got, want = fetch(got), fetch(want)
        dev = float(np.max(np.abs(got - want)))
        scale = max(float(np.max(np.abs(want))), 1e-6)
        rel = dev / scale
        ok = rel <= tol
        log(f"  {name}: max|Δ|={dev:.3e} rel={rel:.3e} {'ok' if ok else 'FAIL'}")
        if not ok:
            failures.append(name)

    # ------------------------------------------------------------------
    # 1. front-end kernel vs pure-jax (B=16, 10 s @ 16 kHz)
    from phones_las_tpu.frontend.features import FrontendConfig, extract_features
    from phones_las_tpu.frontend.pallas_frontend import extract_features_pallas

    log("frontend...")
    fcfg = FrontendConfig()
    rs = np.random.RandomState(0)
    audio = jnp.asarray((rs.randn(16, 160000) * 2000).astype(np.float32))
    alens = jnp.full((16,), 160000, jnp.int32)
    ref = jax.jit(lambda a, l: extract_features(a, fcfg, sample_lengths=l))(audio, alens)
    got = jax.jit(lambda a, l: extract_features_pallas(a, fcfg, sample_lengths=l))(audio, alens)
    check("frontend", got, ref, tol=2e-4)

    # ------------------------------------------------------------------
    # 2./3. unidirectional recurrence + VJP vs lax.scan (B=64, T=256, U=256)
    from phones_las_tpu.ops.lstm import (
        _recurrence_xla,
        init_lstm_params,
        pallas_recurrence,
    )

    log("recurrence + vjp...")
    b, t, u = 64, 256, 256
    p = init_lstm_params(jax.random.PRNGKey(1), u, u)
    xp = jnp.asarray(rs.randn(t, b, 4 * u).astype(np.float32)) * 0.1
    lens = rs.randint(t // 2, t + 1, b)
    mask = jnp.asarray((np.arange(t)[:, None] < lens[None, :]).astype(np.float32))

    def xla_loss(xp, wh):
        out, (h, c) = _recurrence_xla(xp, mask, wh, 1.0, False)
        return jnp.sum(out * out) + jnp.sum(h) + jnp.sum(c), out

    def pl_loss(xp, wh):
        out, (h, c) = pallas_recurrence(xp, mask, wh, False, 1.0, interpret)
        return jnp.sum(out * out) + jnp.sum(h) + jnp.sum(c), out

    def pl_loss_prec(xp, wh, prec):
        out, (h, c) = pallas_recurrence(xp, mask, wh, False, 1.0, interpret, prec)
        return jnp.sum(out * out) + jnp.sum(h) + jnp.sum(c), out

    (ref_l, ref_out), (ref_dxp, ref_dwh) = jax.jit(
        jax.value_and_grad(xla_loss, argnums=(0, 1), has_aux=True)
    )(xp, p.wh)
    (got_l, got_out), (got_dxp, got_dwh) = jax.jit(
        jax.value_and_grad(pl_loss, argnums=(0, 1), has_aux=True)
    )(xp, p.wh)
    check("recurrence/out", got_out, ref_out, tol=1e-5)
    check("recurrence/dxp", got_dxp, ref_dxp, tol=1e-4)
    check("recurrence/dwh", got_dwh, ref_dwh, tol=1e-4)

    # ------------------------------------------------------------------
    # 3b. bf16 recurrent-dot mode (production precision): close to the
    # f32 kernel, grads finite — loose tolerance, it IS lower precision
    log("recurrence bf16 mode...")
    (bf_l, bf_out), (bf_dxp, bf_dwh) = jax.jit(
        jax.value_and_grad(
            lambda a, w: pl_loss_prec(a, w, "bf16"), argnums=(0, 1),
            has_aux=True,
        )
    )(xp, p.wh)
    check("recurrence/bf16_out", bf_out, ref_out, tol=2e-2)
    if not bool(np.isfinite(fetch(bf_dxp)).all() & np.isfinite(fetch(bf_dwh)).all()):
        failures.append("recurrence/bf16_grads")

    # ------------------------------------------------------------------
    # 4. fused bidirectional kernel vs two scans
    from phones_las_tpu.ops.lstm import pallas_bidir_recurrence

    log("bidir...")
    pb = init_lstm_params(jax.random.PRNGKey(2), u, u)
    xpb = jnp.asarray(rs.randn(t, b, 4 * u).astype(np.float32)) * 0.1

    of, ob, (hf, cf), (hb, cb) = jax.jit(
        lambda a, bb: pallas_bidir_recurrence(a, bb, mask, p.wh, pb.wh, 1.0, interpret)
    )(xp, xpb)
    rf, (rhf, rcf) = jax.jit(
        lambda a: _recurrence_xla(a, mask, p.wh, 1.0, False)
    )(xp)
    rb, (rhb, rcb) = jax.jit(
        lambda a: _recurrence_xla(a, mask, pb.wh, 1.0, True)
    )(xpb)
    check("bidir/fwd", of, rf, tol=1e-5)
    check("bidir/bwd", ob, rb, tol=1e-5)
    check("bidir/state", jnp.stack([hf, cf, hb, cb]),
          jnp.stack([rhf, rcf, rhb, rcb]), tol=1e-5)

    # ------------------------------------------------------------------
    # 5. fused greedy decoder (its B<=8 low-latency niche) vs XLA scan
    from phones_las_tpu.decode import greedy_decode
    from phones_las_tpu.decode import pallas_greedy
    from phones_las_tpu.models.speller import SpellerConfig, init_speller
    from phones_las_tpu.ops.masking import length_mask

    log("fused greedy...")
    scfg = SpellerConfig(
        vocab_size=34, embedding_dim=128, num_layers=2, units=256,
        memory_dim=512, attention_units=256, attention_layer_size=256,
    )
    if pallas_greedy.supports(scfg):
        sp = init_speller(jax.random.PRNGKey(3), scfg)
        mem = jnp.asarray(rs.randn(4, 128, 512).astype(np.float32)) * 0.3
        emask = length_mask(jnp.asarray([128, 100, 64, 90]), 128, jnp.float32)
        # both paths at fp32 parity precision (the CLI default) — the XLA
        # scan's einsums are bf16 at default precision on TPU, which is a
        # precision difference, not a kernel bug
        with jax.default_matmul_precision("highest"):
            ft, fl = jax.jit(
                lambda m, k: pallas_greedy.greedy_decode_fused(sp, scfg, m, k, 40)
            )(mem, emask)
            gt, gl, _ = jax.jit(
                lambda m, k: greedy_decode(sp, scfg, m, k, 40)
            )(mem, emask)
        same = np.array_equal(fetch(ft), fetch(gt)) and np.array_equal(
            fetch(fl), fetch(gl)
        )
        log(f"  fused-greedy tokens identical: {same}")
        if not same:
            failures.append("fused_greedy")
    else:
        log("  fused greedy: config unsupported, skipped")

    dt = time.time() - t_start
    if failures:
        print(f"SMOKE FAIL ({dt:.0f}s): {failures}")
        return 1
    print(f"SMOKE OK ({dt:.0f}s, backend={backend})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
