"""Benchmark: offline inference throughput (utterances/sec/chip) on the
flagship LibriSpeech-class char LAS (BASELINE.json configs[4] shape), and
RTF, vs a reference-equivalent CPU pipeline.

The reference is a TF1 CPU/GPU Estimator app whose inference path is
numpy feature extraction + dynamic_rnn encoder + per-step attention
decoding (SURVEY.md §4.3). Since the reference itself is not runnable
here (empty mount, no TF1), the baseline is a faithful same-shape
re-implementation: vectorized numpy psf-style front-end + torch
(CPU) bidirectional pyramidal LSTM encoder + per-step greedy attention
decoder. vs_baseline = our utt/sec/chip ÷ baseline CPU utt/sec.

Fault tolerance (round-3 lesson: one backend hiccup lost the round's
entire perf evidence): the CPU baseline runs FIRST in-process; every
TPU row runs in a **worker subprocess** (`--tpu-worker`) that prints one
``ROW {json}`` line per completed measurement, so results survive a
mid-run crash; the parent retries the worker with backoff (a failed
backend init poisons a process — a fresh one is the only clean retry),
skips already-captured rows, and ALWAYS prints the final single JSON
line with whatever was captured (plus an ``errors`` field), exiting 0.

Prints exactly ONE JSON line on stdout; progress goes to stderr.

Self-test of the failure path (proves partial output works):
    PLU_BENCH_FORCE_FAIL=beam8_parity PLU_BENCH_TINY=1 \
        JAX_PLATFORMS=cpu python bench.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

SECONDS = 10.0
SAMPLE_RATE = 16000
N_SAMPLES = int(SECONDS * SAMPLE_RATE)
DECODE_STEPS = 200
VOCAB = 34

TINY = bool(os.environ.get("PLU_BENCH_TINY"))
if TINY:  # fast smoke (CPU-runnable): tiny shapes, same code paths
    SECONDS = 1.0
    N_SAMPLES = int(SECONDS * SAMPLE_RATE)
    DECODE_STEPS = 10

# `bench.py --prewarm`: compile every row's programs once (iters=1) so
# the persistent XLA cache (utils/jax_cache.py) is hot before the driver
# bench runs — the parity rows paid an 18-minute cold compile in the
# round-4 driver run. Run it after any change to compiled code paths;
# it is the last act of the round-end checklist (docs/PERF.md).
PREWARM = bool(os.environ.get("PLU_BENCH_PREWARM"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_audio(b, seed=0):
    rs = np.random.RandomState(seed)
    return (rs.randn(b, N_SAMPLES) * 2000).astype(np.float32)


# ---------------------------------------------------------------------------
# Ours: TPU JAX pipeline
# ---------------------------------------------------------------------------


def bench_tpu(batch_size=64, iters=20, precision="parity", wave=None):
    """precision='parity' reproduces the train/infer CLI default
    (matmul_precision='highest', fp32 numerics — the north star's
    fp32-parity mode); 'production' uses bf16 einsums where parity is
    not required (the fast path). ``wave`` dispatches each logical batch
    as back-to-back device programs of that size (the Transcriber's
    large-batch strategy — docs/PERF.md B=256 row)."""
    import jax

    from phones_las_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    from phones_las_tpu.decode import greedy_decode
    from phones_las_tpu.models.las import encode, init_las
    from __graft_entry__ import _flagship_cfg

    if TINY:
        batch_size, iters = 4, 2
    if PREWARM:
        iters = 1
    cfg = _flagship_cfg(tiny=TINY)
    if precision == "production":
        # production numerics: bf16 einsums + bf16 recurrent dots (via the
        # ambient scope below) and the 3-pass split-float front-end
        # (rel err 9e-4 vs the f64 oracle — tighter than the bf16 einsums)
        import dataclasses

        cfg = dataclasses.replace(
            cfg, frontend=dataclasses.replace(cfg.frontend, precision="high")
        )
    params = init_las(jax.random.PRNGKey(0), cfg)
    prec = "highest" if precision == "parity" else "default"

    @jax.jit
    def infer(params, audio, lengths):
        # fused Pallas path: front-end kernel + VMEM-resident LSTM recurrence
        with jax.default_matmul_precision(prec):
            memory, _, enc_mask = encode(
                params, cfg, audio, lengths, implementation="pallas"
            )
            tokens, lens, _ = greedy_decode(
                params.speller, cfg.speller, memory, enc_mask,
                max_steps=DECODE_STEPS,
            )
        return tokens, lens

    w = wave or batch_size
    assert batch_size % w == 0
    calls = batch_size // w
    audio = jax.numpy.asarray(make_audio(w))
    lengths = jax.numpy.full((w,), N_SAMPLES, jax.numpy.int32)

    # NB: on the tunneled backend block_until_ready can return before the
    # work is done; only a host fetch reliably synchronizes. The tunnel
    # adds ~30 ms per fetch, so we queue `iters` executions (the device
    # runs programs in order) and fetch once at the end.
    t0 = time.time()
    np.asarray(infer(params, audio, lengths)[0])
    log(f"tpu[{precision}]: compile+warmup {time.time()-t0:.1f}s")

    t0 = time.time()
    outs = [infer(params, audio, lengths) for _ in range(iters * calls)]
    np.asarray(outs[-1][0])
    dt = time.time() - t0
    utts = batch_size * iters
    rate = utts / dt
    rtf = (utts * SECONDS) / dt  # seconds of audio per wall second
    log(f"tpu[{precision}]: {rate:.1f} utt/s, RTFx {rtf:.0f}, "
        f"{dt:.2f}s for {utts} utts")
    return rate, rtf


def bench_tpu_beam(batch_size=32, iters=5, precision="parity",
                   beam_width=8, ctc_joint=False, attention=None):
    """The flagship decode as shipped (BASELINE configs[2]: beam width 8),
    so a beam-path regression shows up in the driver-captured JSON, not
    only in docs/PERF.md prose (round-2 verdict weak #1). ``ctc_joint``
    adds the one-pass Watanabe prefix-score path with a CTC head;
    ``attention`` overrides the family (both compiled paths regress:
    bahdanau is VPU-tanh-bound, luong is a pure MXU dot)."""
    import dataclasses

    import jax

    from phones_las_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    from phones_las_tpu.decode import beam_decode
    from phones_las_tpu.models.las import encode, init_las
    from __graft_entry__ import _flagship_cfg

    if TINY:
        batch_size, iters, beam_width = 2, 1, 2
    if PREWARM:
        iters = 1
    cfg = _flagship_cfg(tiny=TINY)
    if attention:
        cfg = dataclasses.replace(
            cfg, speller=dataclasses.replace(cfg.speller, attention_type=attention)
        )
    if ctc_joint:
        cfg = dataclasses.replace(cfg, ctc_weight=0.3)  # adds the CTC head
    if precision == "production":
        cfg = dataclasses.replace(
            cfg, frontend=dataclasses.replace(cfg.frontend, precision="high")
        )
    params = init_las(jax.random.PRNGKey(0), cfg)
    prec = "highest" if precision == "parity" else "default"

    @jax.jit
    def infer(params, audio, lengths):
        with jax.default_matmul_precision(prec):
            memory, _, enc_mask = encode(
                params, cfg, audio, lengths, implementation="pallas"
            )
            ctc_logp = None
            if ctc_joint:
                ctc_logp = jax.nn.log_softmax(
                    memory @ params.ctc_w + params.ctc_b, axis=-1
                )
            res = beam_decode(
                params.speller, cfg.speller, memory, enc_mask,
                max_steps=DECODE_STEPS, beam_width=beam_width,
                ctc_logp=ctc_logp,
            )
        return res.tokens, res.lengths

    audio = jax.numpy.asarray(make_audio(batch_size))
    lengths = jax.numpy.full((batch_size,), N_SAMPLES, jax.numpy.int32)

    tag = f"beam{beam_width}{'+ctc' if ctc_joint else ''}" + (
        f"[{attention}]" if attention else "")
    t0 = time.time()
    np.asarray(infer(params, audio, lengths)[0])
    log(f"tpu[{precision}][{tag}]: compile+warmup {time.time()-t0:.1f}s")

    t0 = time.time()
    outs = [infer(params, audio, lengths) for _ in range(iters)]
    np.asarray(outs[-1][0])
    dt = time.time() - t0
    rate = batch_size * iters / dt
    log(f"tpu[{precision}][{tag}]: {rate:.1f} utt/s")
    return rate


def bench_train(batch_size=32, iters=30, precision="production"):
    """Flagship TRAIN step (loss+grads+Adam, the Trainer's jitted step on
    BASELINE configs[2] shape) so train-side regressions and train MFU are
    driver-captured, not only docs/PERF.md prose (round-3 verdict weak #4).
    Returns milliseconds per optimizer step at ``batch_size`` 10 s
    utterances with DECODE_STEPS-token targets."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from phones_las_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    from phones_las_tpu.models.las import compute_loss, init_las
    from phones_las_tpu.train.state import (
        TrainConfig, TrainState, create_train_state, make_optimizer,
        mask_grads,
    )
    from __graft_entry__ import _flagship_cfg

    if TINY:
        batch_size, iters = 4, 2
    if PREWARM:
        iters = 1
    cfg = _flagship_cfg(tiny=TINY)
    if precision == "production":
        cfg = dataclasses.replace(
            cfg, frontend=dataclasses.replace(cfg.frontend, precision="high")
        )
    prec = "highest" if precision == "parity" else "default"
    tcfg = TrainConfig()
    tx = make_optimizer(tcfg)
    state = create_train_state(jax.random.PRNGKey(0), cfg, tcfg, None)
    impl = "xla" if jax.default_backend() != "tpu" else "pallas"

    @jax.jit
    def step(state, batch):
        rng, step_rng = jax.random.split(state.rng)

        def loss_fn(params):
            with jax.default_matmul_precision(prec):
                return compute_loss(params, cfg, batch, train=True,
                                    rng=step_rng, implementation=impl)

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        grads = mask_grads(grads, state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state, rng), loss

    rs = np.random.RandomState(0)
    batch = {
        "audio": jnp.asarray(rs.randn(batch_size, N_SAMPLES) * 2000,
                             jnp.float32),
        "audio_lengths": jnp.full((batch_size,), N_SAMPLES, jnp.int32),
        "targets": jnp.asarray(
            rs.randint(4, VOCAB, (batch_size, DECODE_STEPS)), jnp.int32),
        "target_lengths": jnp.full((batch_size,), DECODE_STEPS, jnp.int32),
    }

    t0 = time.time()
    state, loss = step(state, batch)
    float(loss)
    log(f"train[{precision}]: compile+warmup {time.time()-t0:.1f}s")

    t0 = time.time()
    for _ in range(iters):
        state, loss = step(state, batch)
    float(loss)  # host fetch = reliable sync through the tunnel
    ms = (time.time() - t0) / iters * 1000
    log(f"train[{precision}]: {ms:.2f} ms/step @B={batch_size}")
    return ms


def train_mfu(step_ms: float, batch_size: int = 32) -> float:
    """Fraction of the v5e bf16 peak achieved by the measured train step
    (algorithmic fwd+bwd FLOPs; see train_flops_per_utt)."""
    return (batch_size * train_flops_per_utt()
            / (step_ms / 1000.0) / V5E_PEAK_FLOPS)


def bench_accuracy():
    """Correctness-bearing bench row (round-3 verdict weak #5): decode the
    committed fixed speechlike eval set with the committed trained
    checkpoint and score PER, so a silent numerics regression changes the
    driver-captured JSON rather than only docs. Returns a dict of fields
    or None when the assets are absent."""
    adir = os.environ.get("PLU_BENCH_ASSETS_DIR")
    if TINY and not adir:
        log("accuracy row: skipped in PLU_BENCH_TINY mode (full-size "
            "checkpoint decode is not a smoke-scale computation)")
        return None
    if not adir:
        import phones_las_tpu

        adir = os.path.join(os.path.dirname(phones_las_tpu.__file__),
                            "assets", "bench")
    ckpt = os.path.join(adir, "ckpt.npz")
    evalset = os.path.join(adir, "eval_set.npz")
    if not (os.path.exists(ckpt) and os.path.exists(evalset)):
        log("accuracy row: assets/bench/{ckpt,eval_set}.npz absent; skipped")
        return None

    import jax

    from phones_las_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    from phones_las_tpu.decode import beam_decode, greedy_decode
    from phones_las_tpu.models.las import encode
    from phones_las_tpu.train.metrics import edit_distance_stats
    from phones_las_tpu.utils.param_io import load_params_npz

    impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    params, cfg = load_params_npz(ckpt)
    data = np.load(evalset, allow_pickle=False)
    audio = data["audio"].astype(np.float32)  # [B, S] int16-scaled PCM
    lengths = data["lengths"].astype(np.int32)
    refs = data["refs"]          # [B, L] padded with -1
    cap = int(data["decode_cap"][0]) if "decode_cap" in data else DECODE_STEPS

    @jax.jit
    def run(params, audio, lengths):
        memory, _, enc_mask = encode(
            params, cfg, audio, lengths, implementation=impl
        )
        g_tokens, g_lens, _ = greedy_decode(
            params.speller, cfg.speller, memory, enc_mask, max_steps=cap
        )
        res = beam_decode(params.speller, cfg.speller, memory, enc_mask,
                          max_steps=cap, beam_width=8)
        return g_tokens, g_lens, res.tokens, res.lengths

    g_tok, g_len, b_tok, b_len = (np.asarray(x)
                                  for x in run(params, audio, lengths))
    ref_lens = (refs >= 0).sum(axis=1).astype(np.int32)
    ref_ids = np.where(refs >= 0, refs, 0).astype(np.int32)

    def per(tok, tlen):
        errs, total = edit_distance_stats(tok, tlen, ref_ids, ref_lens)
        return errs / max(total, 1)

    g, b = per(g_tok, g_len), per(b_tok, b_len)
    log(f"accuracy row: greedy PER {g:.4f}, beam-8 PER {b:.4f} "
        f"({len(refs)} utts)")
    return {"bench_per_greedy": round(g, 4), "bench_per_beam8": round(b, 4)}


# ---------------------------------------------------------------------------
# Analytic FLOPs model → MFU (round-2 verdict weak #5)
# ---------------------------------------------------------------------------

# public peak for one TPU v5e chip (bf16 matmul)
V5E_PEAK_FLOPS = 197e12


def flagship_flops_per_utt(beam_width: int = 1) -> dict:
    """Algorithmic (fp32-equivalent) FLOPs to transcribe one 10 s
    utterance with the flagship config — matmul/elementwise terms only,
    2 FLOPs per MAC. The parity mode ('highest') issues ~6x this much
    MXU work (3-pass split-float per operand); production (bf16) issues
    ~1x, so MFU is reported against the bf16 peak for both.

    Dims come from the live flagship config (not literals), so a config
    change cannot silently report a stale MFU (ADVICE r3)."""
    from __graft_entry__ import _flagship_cfg

    cfg = _flagship_cfg()
    sp, li, fe_cfg = cfg.speller, cfg.listener, cfg.frontend
    u, emb, attn = sp.units, sp.embedding_dim, sp.attention_units
    mem, vocab = sp.memory_dim, sp.vocab_size
    nmel, win, nfft = (fe_cfg.num_mel,
                       int(fe_cfg.win_ms * fe_cfg.sample_rate / 1000),
                       fe_cfg.nfft)
    t0 = int(10.0 * 1000 / fe_cfg.hop_ms)  # 10 s at the config's hop

    # front-end: framed DFT as two real matmuls + mel projection + deltas
    fe = t0 * (2 * win * (nfft // 2 + 1) * 2 + 2 * (nfft // 2 + 1) * nmel)

    # pyramidal BiLSTM: per step per direction 2*4u*(d+u) FLOPs
    eu = li.units
    enc = 0
    t, d = t0, li.input_dim
    for layer in range(li.num_layers):
        if layer > 0:
            t, d = t // 2, 4 * eu  # reshape-concat pyramid
        enc += t * 2 * (2 * 4 * eu * (d + eu) + 20 * eu)  # gates + pointwise

    # decoder: LSTM cells + additive attention per step, x beam width
    t_enc = t0 // (2 ** (li.num_layers - 1))
    step = (
        2 * 4 * u * ((emb + attn) + u)  # cell 1
        + (sp.num_layers - 1) * 2 * 4 * u * (u + u)  # further cells
        + 2 * u * attn                  # query projection
        + t_enc * (2 * attn + 2)        # tanh(keys+q) @ v
        + 2 * t_enc * mem               # context reduction
        + 2 * (u + mem) * attn          # attention layer
        + 2 * attn * vocab              # output projection
    )
    dec = DECODE_STEPS * beam_width * step
    return {"frontend": fe, "encoder": enc, "decoder": dec,
            "total": fe + enc + dec}


def train_flops_per_utt(target_steps: int = DECODE_STEPS) -> float:
    """Algorithmic FLOPs for one utterance of a flagship TRAIN step:
    forward + backward ≈ 3× the forward matmul work (standard fwd:1,
    bwd:2 accounting — dgrad + wgrad), over front-end + encoder +
    teacher-forced decoder (same per-step work as greedy decode)."""
    f = flagship_flops_per_utt(beam_width=1)
    fwd = f["frontend"] + f["encoder"] + f["decoder"] * (
        target_steps / DECODE_STEPS)
    # front-end has no trainable params → backward skips it
    return f["frontend"] + 3.0 * (fwd - f["frontend"])


def mfu(rate_utt_per_s: float, beam_width: int = 1) -> float:
    return rate_utt_per_s * flagship_flops_per_utt(beam_width)["total"] / V5E_PEAK_FLOPS


# ---------------------------------------------------------------------------
# Baseline: reference-equivalent CPU pipeline (numpy frontend + torch LAS)
# ---------------------------------------------------------------------------


def _np_frontend(sig):
    """Vectorized psf-semantics log-mel + deltas (as the reference's
    offline python_speech_features pass)."""
    win, hop, nfft, nmel = 400, 160, 512, 40
    sig = np.append(sig[0], sig[1:] - 0.97 * sig[:-1])
    n = 1 + int(np.ceil((len(sig) - win) / hop)) if len(sig) > win else 1
    pad = (n - 1) * hop + win - len(sig)
    sig = np.pad(sig, (0, max(pad, 0)))
    idx = np.arange(n)[:, None] * hop + np.arange(win)[None, :]
    frames = sig[idx]
    ps = (np.abs(np.fft.rfft(frames, nfft)) ** 2) / nfft
    # HTK mel filterbank with integer bin edges
    hz2mel = lambda h: 2595 * np.log10(1 + h / 700.0)
    mel2hz = lambda m: 700 * (10 ** (m / 2595.0) - 1)
    pts = np.linspace(hz2mel(0), hz2mel(SAMPLE_RATE / 2), nmel + 2)
    bins = np.floor((nfft + 1) * mel2hz(pts) / SAMPLE_RATE).astype(int)
    fb = np.zeros((nmel, nfft // 2 + 1))
    for j in range(nmel):
        for i in range(bins[j], bins[j + 1]):
            fb[j, i] = (i - bins[j]) / max(bins[j + 1] - bins[j], 1)
        for i in range(bins[j + 1], bins[j + 2]):
            fb[j, i] = (bins[j + 2] - i) / max(bins[j + 2] - bins[j + 1], 1)
    feat = np.log(np.maximum(ps @ fb.T, np.finfo(float).eps))

    def delta(f):
        p = np.pad(f, ((2, 2), (0, 0)), mode="edge")
        return (p[3:-1] - p[1:-3] + 2 * (p[4:] - p[:-4])) / 10.0

    d1 = delta(feat)
    return np.concatenate([feat, d1, delta(d1)], axis=1).astype(np.float32)


def bench_cpu_baseline(batch_size=8):
    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    units, dec_units, emb, attn = 256, 256, 128, 256
    if TINY:
        batch_size = 2

    enc_layers = [
        torch.nn.LSTM(120, units, bidirectional=True, batch_first=True),
        torch.nn.LSTM(4 * units, units, bidirectional=True, batch_first=True),
        torch.nn.LSTM(4 * units, units, bidirectional=True, batch_first=True),
    ]
    embedding = torch.nn.Embedding(VOCAB, emb)
    dec_cells = [
        torch.nn.LSTMCell(emb + attn, dec_units),
        torch.nn.LSTMCell(dec_units, dec_units),
    ]
    wq = torch.nn.Linear(dec_units, attn, bias=False)
    wk = torch.nn.Linear(2 * units, attn, bias=False)
    v = torch.nn.Parameter(torch.randn(attn))
    attn_layer = torch.nn.Linear(dec_units + 2 * units, attn, bias=False)
    out_proj = torch.nn.Linear(attn, VOCAB)

    audio = make_audio(batch_size)
    t0 = time.time()
    with torch.no_grad():
        feats = np.stack([_np_frontend(a) for a in audio])
        x = torch.from_numpy(feats)
        for li, lstm in enumerate(enc_layers):
            if li > 0:  # pyramid reshape-concat
                b, t, u = x.shape
                t2 = t // 2 * 2
                x = x[:, :t2].reshape(b, t2 // 2, 2 * u)
            x, _ = lstm(x)
        memory = x  # [B, T', 512]
        keys = wk(memory)
        b = memory.shape[0]
        states = [
            (torch.zeros(b, dec_units), torch.zeros(b, dec_units))
            for _ in dec_cells
        ]
        att = torch.zeros(b, attn)
        tok = torch.ones(b, dtype=torch.long)
        for _ in range(DECODE_STEPS):
            inp = torch.cat([embedding(tok), att], dim=-1)
            for i, cell in enumerate(dec_cells):
                states[i] = cell(inp, states[i])
                inp = states[i][0]
            q = wq(inp)
            scores = torch.tanh(keys + q[:, None, :]) @ v
            al = torch.softmax(scores, dim=-1)
            ctx = (al[:, :, None] * memory).sum(1)
            att = attn_layer(torch.cat([inp, ctx], dim=-1))
            tok = out_proj(att).argmax(-1)
    dt = time.time() - t0
    rate = batch_size / dt
    log(f"cpu baseline: {rate:.2f} utt/s ({dt:.1f}s for {batch_size} utts, "
        f"{os.cpu_count()} host cores)")
    return rate


# ---------------------------------------------------------------------------
# Fault-tolerant orchestration (parent + --tpu-worker subprocess)
# ---------------------------------------------------------------------------

# row name → zero-arg callable returning {field: value}
def _row_fns():
    return {
        "parity": lambda: dict(zip(
            ("value_parity", "rtf_x_parity"),
            (lambda r: (round(r[0], 2), round(r[1])))(
                bench_tpu(precision="parity")),
        )),
        "production": lambda: dict(zip(
            ("value_production", "rtf_x_production"),
            (lambda r: (round(r[0], 2), round(r[1])))(
                bench_tpu(precision="production")),
        )),
        "beam8_parity": lambda: {
            "value_beam8_parity": round(bench_tpu_beam(precision="parity"), 2)},
        "beam8_production": lambda: {
            "value_beam8_production": round(
                bench_tpu_beam(precision="production"), 2)},
        "beam8_ctcjoint_production": lambda: {
            "value_beam8_ctcjoint_production": round(
                bench_tpu_beam(precision="production", ctc_joint=True), 2)},
        "beam8_luong_production": lambda: {
            "value_beam8_luong_production": round(
                bench_tpu_beam(precision="production", attention="luong"), 2)},
        "train_parity": lambda: {
            "value_train_step_ms_parity": round(
                bench_train(precision="parity"), 2)},
        "train_production": lambda: {
            "value_train_step_ms_production": round(
                bench_train(precision="production"), 2)},
        "accuracy": lambda: bench_accuracy() or {},
    }


# production rows first: they warm up in ~6 s while the parity rows can
# pay a multi-minute cold compile (f32 kernels; 18 min observed in the
# round-4 driver run) — if a driver-side wall clock cuts the run short,
# the headline production metrics are already captured. The final JSON
# line still reports every captured row regardless of order.
ROW_ORDER = ["production", "beam8_production", "beam8_ctcjoint_production",
             "beam8_luong_production", "train_production", "accuracy",
             "parity", "beam8_parity", "train_parity"]


def tpu_worker(skip):
    """Run the TPU rows in order; print ``BEGIN <row>`` / ``ROW <json>``
    protocol lines on stdout (the parent captures them — they never reach
    the driver's stdout). A backend-death exception aborts the process
    (retry must be a fresh process); any other per-row error is reported
    and the remaining rows still run."""
    if TINY:
        # make JAX_PLATFORMS=cpu effective for the smoke path (the axon
        # plugin ignores the env var unless re-asserted via jax.config)
        from phones_las_tpu.cli.common import honor_jax_platforms_env

        honor_jax_platforms_env()
    force_fail = os.environ.get("PLU_BENCH_FORCE_FAIL", "")
    fns = _row_fns()
    for name in ROW_ORDER:
        if name in skip:
            continue
        print(f"BEGIN {name}", flush=True)
        try:
            if name == force_fail:
                raise RuntimeError("forced failure (PLU_BENCH_FORCE_FAIL)")
            fields = fns[name]()
        except Exception as e:  # noqa: BLE001
            msg = f"{type(e).__name__}: {e}"[:400]
            print("ROWERR " + json.dumps({"row": name, "error": msg}),
                  flush=True)
            log(f"row {name} failed: {msg}")
            if "backend" in msg.lower() or "UNAVAILABLE" in msg:
                sys.exit(3)  # dead backend: only a fresh process can retry
            continue
        print("ROW " + json.dumps({"row": name, "fields": fields}),
              flush=True)
    sys.exit(0)


def run_worker_with_retries(results, errors):
    """Spawn --tpu-worker subprocesses until every row is captured or the
    attempt/failure budget is spent. Mutates ``results`` (row → fields)
    and ``errors`` (list of strings)."""
    attempts = int(os.environ.get("PLU_BENCH_ATTEMPTS", "5"))
    backoff = float(os.environ.get("PLU_BENCH_BACKOFF", "60"))
    timeout = float(os.environ.get("PLU_BENCH_ROW_TIMEOUT", "2400"))
    failcount = {}

    for attempt in range(attempts):
        skip = [r for r in ROW_ORDER
                if r in results or failcount.get(r, 0) >= 2]
        todo = [r for r in ROW_ORDER if r not in skip]
        if not todo:
            return
        if attempt:
            log(f"bench: retry {attempt + 1}/{attempts} for rows {todo} "
                f"after {backoff:.0f}s backoff")
            time.sleep(backoff)
        cmd = [sys.executable, os.path.abspath(__file__), "--tpu-worker",
               "--skip", ",".join(skip)]
        current = None
        timed_out = []
        try:
            proc = subprocess.Popen(
                cmd, stdout=subprocess.PIPE, stderr=sys.stderr,
                text=True, cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            # the readline loop below blocks while the worker is silently
            # compiling/running; a watchdog is the only hang-proof timeout
            import threading

            def _watchdog():
                timed_out.append(True)
                proc.kill()

            timer = threading.Timer(timeout, _watchdog)
            timer.start()
            try:
                for line in proc.stdout:
                    line = line.strip()
                    if line.startswith("BEGIN "):
                        current = line[6:]
                    elif line.startswith("ROW "):
                        rec = json.loads(line[4:])
                        results[rec["row"]] = rec["fields"]
                        current = None
                    elif line.startswith("ROWERR "):
                        rec = json.loads(line[7:])
                        failcount[rec["row"]] = (
                            failcount.get(rec["row"], 0) + 1)
                        errors.append(f"{rec['row']}: {rec['error']}")
                        current = None
            finally:
                timer.cancel()
            rc = proc.wait(timeout=60)
            if timed_out:
                errors.append(f"worker timeout after {timeout:.0f}s "
                              f"(row {current})")
                if current:
                    failcount[current] = failcount.get(current, 0) + 1
            elif rc not in (0, 3) and current:
                failcount[current] = failcount.get(current, 0) + 1
                errors.append(f"worker died rc={rc} in row {current}")
        except Exception as e:  # noqa: BLE001
            errors.append(f"worker spawn/IO failure: {e}")
            try:
                proc.kill()
            except Exception:
                pass


def main():
    results, errors = {}, []
    # CPU baseline FIRST: it cannot be lost to a TPU outage. Single-core
    # timing is noisy → take the faster of two runs (conservative ratio).
    try:
        cpu_rate = max(bench_cpu_baseline(), bench_cpu_baseline())
    except Exception as e:  # noqa: BLE001
        errors.append(f"cpu baseline: {type(e).__name__}: {e}")
        cpu_rate = None

    run_worker_with_retries(results, errors)

    flat = {}
    for fields in results.values():
        flat.update(fields)
    parity = flat.get("value_parity")
    prod = flat.get("value_production")
    beam8_prod = flat.get("value_beam8_production")

    # headline = parity mode; if the parity rows were lost (they run
    # last and pay the longest cold compiles), fall back to production
    # so the driver always gets a number, with the unit saying which
    head, head_mode = (parity, "fp32-parity") if parity else (
        prod, "bf16-production")
    out = {
        "metric": "offline_inference_throughput",
        "value": head,
        "unit": f"utterances/sec/chip ({SECONDS:.0f}s utts, "
                f"LibriSpeech-class char LAS, {head_mode} mode)",
        "vs_baseline": (round(head / cpu_rate, 2)
                        if head and cpu_rate else None),
    }
    out.update(flat)
    if cpu_rate:
        out["cpu_baseline_utt_per_s"] = round(cpu_rate, 2)
        if prod:
            out["vs_baseline_production"] = round(prod / cpu_rate, 2)
    # achieved fraction of the v5e bf16 matmul peak (197 TF/s) for the
    # algorithmic FLOPs; parity mode additionally issues ~6x the MXU
    # work for the same algorithmic count (docs/PERF.md MFU section)
    if prod:
        out["mfu_production"] = round(mfu(prod), 4)
    if parity:
        out["mfu_parity"] = round(mfu(parity), 4)
    if beam8_prod:
        out["mfu_beam8_production"] = round(mfu(beam8_prod, beam_width=8), 4)
    for suffix in ("production", "parity"):
        t_ms = flat.get(f"value_train_step_ms_{suffix}")
        if t_ms and not TINY:  # tiny smoke shapes don't match the model
            out[f"mfu_train_{suffix}"] = round(train_mfu(t_ms), 4)
    if errors:
        out["errors"] = errors[:8]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    if "--tpu-worker" in sys.argv:
        skip = ""
        if "--skip" in sys.argv:
            skip = sys.argv[sys.argv.index("--skip") + 1]
        tpu_worker(set(filter(None, skip.split(","))))
    elif "--prewarm" in sys.argv:
        # compile every TPU row's programs once into the persistent XLA
        # cache (utils/jax_cache.py) so the next driver bench starts warm.
        # In-process (no subprocess retry machinery): if the backend dies,
        # just rerun. Per-row compile+warmup seconds go to stderr.
        PREWARM = True
        os.environ["PLU_BENCH_PREWARM"] = "1"
        t0 = time.time()
        try:
            tpu_worker(set())  # exits 0 when done
        finally:
            log(f"prewarm: all rows compiled in {time.time()-t0:.0f}s")
    else:
        main()
