"""Joint CTC-attention training: loss wiring, decode collapse, sharding."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from phones_las_tpu.decode.ctc import collapse, ctc_frame_ids
from phones_las_tpu.models import LASConfig, ListenerConfig, SpellerConfig
from phones_las_tpu.models.las import compute_loss, init_las, trainable_filter

V = 12


def _cfg(ctc=0.3):
    return LASConfig(
        listener=ListenerConfig(input_dim=120, num_layers=2, units=8),
        speller=SpellerConfig(
            vocab_size=V, embedding_dim=4, num_layers=1, units=8,
            memory_dim=16, attention_units=8, attention_layer_size=8,
        ),
        ctc_weight=ctc,
    )


def _batch(b=2):
    rs = np.random.RandomState(0)
    return {
        "audio": jnp.asarray((rs.randn(b, 16000) * 1000).astype(np.float32)),
        "audio_lengths": jnp.asarray([16000, 12000], jnp.int32),
        "targets": jnp.asarray(rs.randint(4, V, (b, 5)), jnp.int32),
        "target_lengths": jnp.asarray([5, 3], jnp.int32),
    }


def test_collapse():
    ids = np.asarray([[0, 4, 4, 0, 5, 5, 5, 0, 4, 0],
                      [6, 6, 6, 0, 0, 6, 7, 7, 0, 0]])
    assert collapse(ids, [10, 10]) == [[4, 5, 4], [6, 6, 7]]
    assert collapse(ids, [3, 4]) == [[4], [6]]


@pytest.mark.slow
def test_joint_loss_and_grads():
    cfg = _cfg()
    params = init_las(jax.random.PRNGKey(0), cfg)
    assert params.ctc_w is not None and params.ctc_w.shape == (16, V)
    batch = _batch()
    loss, aux = compute_loss(params, cfg, batch)
    assert np.isfinite(float(loss)) and np.isfinite(float(aux["ctc_loss"]))
    # joint mixing: loss = (1-w)·phone + w·ctc
    np.testing.assert_allclose(
        float(loss),
        0.7 * float(aux["phone_loss"]) + 0.3 * float(aux["ctc_loss"]),
        rtol=1e-5,
    )
    grads = jax.grad(lambda p: compute_loss(p, cfg, batch)[0])(params)
    assert float(jnp.abs(grads.ctc_w).max()) > 0
    # trainable filter marks the head trainable
    assert trainable_filter(params).ctc_w is True

    # ctc_weight=0 → no head, loss is the pure attention loss
    cfg0 = _cfg(ctc=0.0)
    p0 = init_las(jax.random.PRNGKey(0), cfg0)
    assert p0.ctc_w is None
    loss0, aux0 = compute_loss(p0, cfg0, batch)
    assert "ctc_loss" not in aux0
    np.testing.assert_allclose(float(loss0), float(aux0["phone_loss"]), rtol=1e-6)


def test_ctc_head_learns_one_batch():
    cfg = _cfg(ctc=0.5)
    params = init_las(jax.random.PRNGKey(1), cfg)
    batch = _batch()
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        from phones_las_tpu.train.state import mask_grads

        (loss, aux), g = jax.value_and_grad(
            lambda p: compute_loss(p, cfg, batch), has_aux=True
        )(params)
        up, opt = tx.update(mask_grads(g, params), opt, params)
        return optax.apply_updates(params, up), opt, aux["ctc_loss"]

    first = last = None
    for i in range(25):
        params, opt, cl = step(params, opt)
        if i == 0:
            first = float(cl)
        last = float(cl)
    assert last < first, (first, last)

    # frame ids from the head are decodable
    from phones_las_tpu.models.las import encode

    memory, enc_lens, enc_mask = encode(
        params, cfg, batch["audio"], batch["audio_lengths"]
    )
    ids = np.asarray(ctc_frame_ids(params, memory, enc_mask))
    hyps = collapse(ids, np.asarray(enc_lens))
    assert len(hyps) == 2


def test_rescore_beams_repicks_by_ctc():
    from phones_las_tpu.decode.ctc import rescore_beams

    # CTC logits that spell "4" emphatically over 6 frames
    t, v = 6, 8
    logits = np.full((1, t, v), -10.0, np.float32)
    logits[0, :, 4] = 5.0
    enc_mask = jnp.ones((1, t), jnp.float32)
    # beam 0 says [5], beam 1 says [4]; attention prefers beam 0
    beam_tokens = jnp.asarray([[[5, 2, 2], [4, 2, 2]]], jnp.int32)
    beam_lengths = jnp.asarray([[1, 1]], jnp.int32)
    beam_scores = jnp.asarray([[-1.0, -2.0]], jnp.float32)

    best_attn, _ = rescore_beams(
        jnp.asarray(logits), enc_mask, beam_tokens, beam_lengths,
        beam_scores, alpha=1.0,
    )
    assert int(best_attn[0]) == 0  # pure attention keeps its pick
    best_joint, comb = rescore_beams(
        jnp.asarray(logits), enc_mask, beam_tokens, beam_lengths,
        beam_scores, alpha=0.3,
    )
    assert int(best_joint[0]) == 1  # CTC flips it
    assert np.isfinite(np.asarray(comb)).all()

    # prefer-finished rule: beam 1 never emitted <eos> (truncated at the
    # step cap) — the repick must not return it even though it wins on
    # combined score, mirroring beam_decode's own final pick
    finished = jnp.asarray([[True, False]])
    best_fin, _ = rescore_beams(
        jnp.asarray(logits), enc_mask, beam_tokens, beam_lengths,
        beam_scores, alpha=0.3, beam_finished=finished,
    )
    assert int(best_fin[0]) == 0

    # length penalty normalizes the COMBINED raw score (not just the
    # attention term): a longer hypothesis with the same per-token score
    # gains under alpha>0 exactly as in the in-loop pick
    from phones_las_tpu.decode.beam import _length_penalty

    lens2 = jnp.asarray([[1, 3]], jnp.int32)
    _, comb_lp = rescore_beams(
        jnp.asarray(logits), enc_mask, beam_tokens, lens2,
        beam_scores, alpha=1.0, length_penalty=1.0,
    )
    expect = np.asarray(beam_scores) / np.asarray(_length_penalty(lens2, 1.0))
    # alpha=1 leaves only the attention term -> exact normalization
    np.testing.assert_allclose(np.asarray(comb_lp), expect, rtol=1e-6)


def test_ctc_params_shard_over_mesh():
    from phones_las_tpu.parallel import make_mesh, shard_batch, shard_params

    devices = jax.devices("cpu")[:4]
    mesh = make_mesh(data=2, model=2, devices=devices)
    cfg = _cfg()
    params = init_las(jax.random.PRNGKey(0), cfg)
    sharded = shard_params(params, mesh)
    batch = _batch()
    ref = float(compute_loss(params, cfg, batch)[0])

    @jax.jit
    def loss_fn(p, b):
        return compute_loss(p, cfg, b)[0]

    got = float(loss_fn(sharded, shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh)))
    np.testing.assert_allclose(got, ref, rtol=2e-5)


# ---------------------------------------------------------------------------
# One-pass joint decoding: CTC prefix scores (decode/ctc.py ctc_prefix_*)
# ---------------------------------------------------------------------------


def _oracle_prefix(lp, n_valid, path, eos, bos):
    """Sequential Watanabe Alg-2 prefix scorer in linear probability space
    (tiny T, no underflow). lp: [T, V] log-softmax; path: token list.
    Returns the per-step psi row [V] before each extension."""
    p = np.exp(np.asarray(lp, np.float64))
    t_all, v = p.shape
    rn = np.zeros(t_all + 1)
    rb = np.zeros(t_all + 1)
    rb[0] = 1.0
    for t in range(1, t_all + 1):
        rb[t] = rb[t - 1] * (p[t - 1, 0] if t <= n_valid else 1.0)
    last = bos
    rows = []
    for c in list(path) + [eos]:
        row = np.full(v, -1e9)
        for cand in range(v):
            if cand in (0, bos):
                continue
            if cand == eos:
                row[cand] = np.log(max(rn[n_valid] + rb[n_valid], 1e-300))
                continue
            s = 0.0
            for t in range(1, n_valid + 1):
                phi = rb[t - 1] + (0.0 if cand == last else rn[t - 1])
                s += phi * p[t - 1, cand]
            row[cand] = np.log(max(s, 1e-300))
        rows.append(row)
        if c == eos:
            break
        rn2 = np.zeros(t_all + 1)
        rb2 = np.zeros(t_all + 1)
        for t in range(1, t_all + 1):
            if t <= n_valid:
                phi = rb[t - 1] + (0.0 if c == last else rn[t - 1])
                rn2[t] = (rn2[t - 1] + phi) * p[t - 1, c]
                rb2[t] = (rb2[t - 1] + rn2[t - 1]) * p[t - 1, 0]
            else:
                rn2[t], rb2[t] = rn2[t - 1], rb2[t - 1]
        rn, rb, last = rn2, rb2, c
    return rows


def test_ctc_prefix_scores_match_sequential_oracle():
    from phones_las_tpu.decode.ctc import (
        ctc_prefix_init, ctc_prefix_scores, ctc_prefix_update,
    )

    rs = np.random.RandomState(3)
    t_all, v, n_valid, eos, bos = 7, 9, 5, 2, 1
    lp = jax.nn.log_softmax(
        jnp.asarray(rs.randn(1, t_all, v) * 1.5, jnp.float32), axis=-1
    )
    valid = jnp.asarray([[1.0] * n_valid + [0.0] * (t_all - n_valid)])
    path = [4, 4, 7, 3]  # includes a repeated label (the rb-only branch)
    oracle = _oracle_prefix(lp[0], n_valid, path, eos, bos)

    state = ctc_prefix_init(lp, valid, beam_width=1)
    pexp = jnp.exp(lp)
    prev = jnp.asarray([[bos]], jnp.int32)
    for step, c in enumerate(list(path) + [eos]):
        psi = ctc_prefix_scores(state, lp, pexp, valid, prev, eos, bos)
        got, want = np.asarray(psi[0, 0], np.float64), oracle[step]
        real = want > -600  # CTC-reachable candidates (-690 = oracle's log(0))
        np.testing.assert_allclose(got[real], want[real], rtol=2e-4, atol=2e-4)
        assert (got[~real] < -600).all()  # agree on unreachable ones
        if c == eos:
            break
        state = ctc_prefix_update(
            state, psi.reshape(1, v), jnp.asarray([[c]], jnp.int32),
            jnp.asarray([[c]], jnp.int32), prev,
            jnp.asarray([[False]]), lp, valid,
        )
        prev = jnp.asarray([[c]], jnp.int32)


def test_ctc_prefix_full_sequence_matches_optax():
    """After consuming a full label sequence, psi(eos) must equal the
    complete-sequence CTC log prob, i.e. -optax.ctc_loss."""
    from phones_las_tpu.decode.ctc import (
        ctc_prefix_init, ctc_prefix_scores, ctc_prefix_update,
    )

    rs = np.random.RandomState(11)
    t_all, v, eos, bos = 8, 6, 2, 1
    labels = [3, 5, 5, 4]
    lp = jax.nn.log_softmax(
        jnp.asarray(rs.randn(1, t_all, v), jnp.float32), axis=-1
    )
    valid = jnp.ones((1, t_all), jnp.float32)
    state = ctc_prefix_init(lp, valid, 1)
    pexp = jnp.exp(lp)
    prev = jnp.asarray([[bos]], jnp.int32)
    for c in labels:
        psi = ctc_prefix_scores(state, lp, pexp, valid, prev, eos, bos)
        state = ctc_prefix_update(
            state, psi.reshape(1, v), jnp.asarray([[c]], jnp.int32),
            jnp.asarray([[c]], jnp.int32), prev,
            jnp.asarray([[False]]), lp, valid,
        )
        prev = jnp.asarray([[c]], jnp.int32)
    psi = ctc_prefix_scores(state, lp, pexp, valid, prev, eos, bos)
    loss = optax.ctc_loss(
        lp, jnp.zeros((1, t_all)), jnp.asarray([labels], jnp.int32),
        jnp.zeros((1, len(labels))), blank_id=0,
    )
    np.testing.assert_allclose(
        float(psi[0, 0, eos]), float(-loss[0]), rtol=1e-4, atol=1e-4
    )


def test_joint_beam_follows_ctc_preference():
    """With alpha near 0 the one-pass joint beam must follow the CTC head;
    with alpha=1.0 the joint path is disabled and output is bit-identical
    to the attention-only beam."""
    import tests.test_models_decode as td
    from phones_las_tpu.decode import beam_decode

    cfg, params = td._tiny_speller()
    mem, mask = td._memory()
    base = beam_decode(params, cfg, mem, mask, max_steps=6, beam_width=3)

    v = cfg.vocab_size
    logits = np.full((2, mem.shape[1], v), -8.0, np.float32)
    logits[:, :2, 4] = 8.0  # CTC insists on a single token 4
    logits[:, 2:, 0] = 8.0
    ctc_lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)

    same = beam_decode(
        params, cfg, mem, mask, max_steps=6, beam_width=3,
        ctc_logp=ctc_lp, ctc_alpha=1.0,
    )
    np.testing.assert_array_equal(np.asarray(base.tokens), np.asarray(same.tokens))

    joint = beam_decode(
        params, cfg, mem, mask, max_steps=6, beam_width=3,
        ctc_logp=ctc_lp, ctc_alpha=0.05,
    )
    toks = np.asarray(joint.tokens)
    lens = np.asarray(joint.lengths)
    assert lens[0] == 1 and toks[0, 0] == 4, (toks, lens)
    assert np.isfinite(np.asarray(joint.scores)).all()


@pytest.mark.slow
def test_transcriber_ctc_joint_end_to_end(tmp_path):
    """Library API: one-pass joint decoding on a CTC-trained checkpoint."""
    from phones_las_tpu.api import Transcriber
    from phones_las_tpu.cli import prepare as prepare_cli
    from phones_las_tpu.cli import train as train_cli

    data, wd = str(tmp_path / "d"), str(tmp_path / "w")
    prepare_cli.main(["synthetic", "--out", data, "--n-utts", "8", "--n-phones", "4"])
    train_cli.main([
        "--preset", "timit_phone_las", "--data", data, "--workdir", wd,
        "--num-steps", "2", "--batch-size", "4", "--ctc-weight", "0.3",
    ])
    t = Transcriber(wd, beam_width=2, ctc_joint=0.5)
    pcm = (np.random.RandomState(0).randn(9000) * 2000).astype(np.int16)
    toks = t.transcribe(pcm)
    assert isinstance(toks, list)


def test_ctc_empty_transcript_rows_weighted_out():
    """A row whose transcript is empty (only <eos>) carries no acoustic
    labels; it must contribute zero to the CTC head loss instead of
    training the head to emit <eos> as if it were a sound."""
    from phones_las_tpu.models.las import ctc_head_loss, encode

    cfg = _cfg(ctc=0.5)
    params = init_las(jax.random.PRNGKey(0), cfg)
    batch = _batch()
    mem, _, mask = encode(params, cfg, batch["audio"], batch["audio_lengths"])

    eos = 2  # any id — only the length matters to the masking
    targets = np.array(batch["targets"], copy=True)
    targets[1, 0] = eos
    targets = jnp.asarray(targets)

    full = ctc_head_loss(
        params, cfg, mem, mask, targets,
        jnp.asarray([5, 1], jnp.int32),  # row 1: empty transcript
    )
    row0_only = ctc_head_loss(
        params, cfg, mem[:1], mask[:1], targets[:1],
        jnp.asarray([5], jnp.int32),
    )
    np.testing.assert_allclose(float(full), float(row0_only), rtol=1e-5)

    g = jax.grad(
        lambda p: ctc_head_loss(p, cfg, mem, mask, targets,
                                jnp.asarray([5, 1], jnp.int32))
    )(params)
    assert np.isfinite(np.asarray(g.ctc_w)).all()
