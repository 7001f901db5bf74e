"""Model + decode tests: teacher forcing, greedy loop, beam-vs-oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from phones_las_tpu.models import (
    LASConfig,
    ListenerConfig,
    SpellerConfig,
    init_las,
    encode,
    compute_loss,
)
from phones_las_tpu.models.speller import (
    init_speller,
    init_speller_carry,
    embed_tokens,
    speller_step,
    teacher_forced_decode,
)
from phones_las_tpu.ops.attention import precompute_keys
from phones_las_tpu.decode import greedy_decode, beam_decode

V, EOS, BOS = 8, 2, 1


def _tiny_speller(binf_mode="none", num_binf=0, codes=None):
    cfg = SpellerConfig(
        vocab_size=V, embedding_dim=6, num_layers=2, units=8, memory_dim=10,
        attention_type="bahdanau", attention_units=7, attention_layer_size=9,
        bos_id=BOS, eos_id=EOS, binf_mode=binf_mode, num_binf=num_binf,
    )
    params = init_speller(jax.random.PRNGKey(0), cfg, binf_codes=codes)
    return cfg, params


def _memory(b=2, t=5):
    mem = jnp.asarray(np.random.RandomState(0).randn(b, t, 10), jnp.float32)
    mask = jnp.asarray(np.array([[1] * 5, [1, 1, 1, 0, 0]][:b]), jnp.float32)
    return mem, mask


def test_teacher_forced_shapes():
    cfg, params = _tiny_speller()
    mem, mask = _memory()
    dec_in = jnp.asarray([[BOS, 3, 4], [BOS, 5, 6]], jnp.int32)
    logits, probs, binf = teacher_forced_decode(params, cfg, dec_in, mem, mask)
    assert logits.shape == (2, 3, V)
    assert probs.shape == (2, 3, 5)
    assert binf is None
    # attention over masked positions must be ~0
    assert float(np.asarray(probs)[1, :, 3:].max()) < 1e-6


def test_greedy_matches_manual_loop():
    cfg, params = _tiny_speller()
    mem, mask = _memory()
    tokens, lengths, aligns = greedy_decode(
        params, cfg, mem, mask, max_steps=7, return_alignments=True
    )
    assert tokens.shape == (2, 7) and aligns.shape == (2, 7, 5)

    # manual eager loop
    keys = precompute_keys(params.attention, mem)
    carry = init_speller_carry(cfg, 2, mem.shape[1])
    tok = jnp.asarray([BOS, BOS], jnp.int32)
    fin = np.zeros(2, bool)
    for s in range(7):
        emb = embed_tokens(params, cfg, tok)
        carry, logits, _ = speller_step(params, cfg, carry, emb, keys, mem, mask)
        nxt = np.argmax(np.asarray(logits), axis=-1)
        nxt = np.where(fin, EOS, nxt)
        fin |= nxt == EOS
        np.testing.assert_array_equal(np.asarray(tokens[:, s]), nxt)
        tok = jnp.asarray(nxt, jnp.int32)


def _oracle_beam(params, cfg, mem, mask, max_steps, k):
    """Per-utterance eager beam search mirroring beam_decode semantics."""
    b = mem.shape[0]
    out_tokens, out_lens = [], []
    for n in range(b):
        mem_n, mask_n = mem[n : n + 1], mask[n : n + 1]
        keys = precompute_keys(params.attention, mem_n)
        beams = [
            {"carry": init_speller_carry(cfg, 1, mem.shape[1]), "toks": [], "logp": 0.0,
             "fin": False, "len": 0, "prev": BOS}
        ]
        beams += [dict(beams[0], logp=-1e9) for _ in range(k - 1)]
        for _ in range(max_steps):
            cands = []
            for bm in beams:
                if bm["fin"]:
                    step_lp = np.full(V, -1e9); step_lp[EOS] = 0.0
                    new_carry = bm["carry"]
                    # still run the step to mirror carry evolution (gathered
                    # carries of finished beams are never read again)
                else:
                    emb = embed_tokens(params, cfg, jnp.asarray([bm["prev"]]))
                    new_carry, logits, _ = speller_step(
                        params, cfg, bm["carry"], emb, keys, mem_n, mask_n
                    )
                    step_lp = np.asarray(jax.nn.log_softmax(logits[0]))
                for v in range(V):
                    cands.append((bm["logp"] + step_lp[v], bm, v, new_carry))
            cands.sort(key=lambda c: -c[0])
            new_beams = []
            for lp, bm, v, carry in cands[:k]:
                new_beams.append(
                    {"carry": carry, "toks": bm["toks"] + [v], "logp": lp,
                     "fin": bm["fin"] or v == EOS,
                     "len": bm["len"] + (0 if (bm["fin"] or v == EOS) else 1),
                     "prev": v}
                )
            beams = new_beams
        fin_beams = [bm for bm in beams if bm["fin"]] or beams
        best = max(fin_beams, key=lambda bm: bm["logp"])
        out_tokens.append(best["toks"])
        out_lens.append(best["len"])
    return out_tokens, out_lens


def test_beam_matches_oracle():
    cfg, params = _tiny_speller()
    mem, mask = _memory()
    res = beam_decode(params, cfg, mem, mask, max_steps=6, beam_width=3)
    ref_toks, ref_lens = _oracle_beam(params, cfg, mem, mask, 6, 3)
    for n in range(2):
        np.testing.assert_array_equal(np.asarray(res.tokens[n]), ref_toks[n])
    np.testing.assert_array_equal(np.asarray(res.lengths), ref_lens)


def test_beam_width1_equals_greedy():
    cfg, params = _tiny_speller()
    mem, mask = _memory()
    g_toks, g_lens, g_aligns = greedy_decode(
        params, cfg, mem, mask, max_steps=6, return_alignments=True
    )
    b_res = beam_decode(params, cfg, mem, mask, max_steps=6, beam_width=1)
    np.testing.assert_array_equal(np.asarray(g_toks), np.asarray(b_res.tokens))
    np.testing.assert_array_equal(np.asarray(g_lens), np.asarray(b_res.lengths))
    # backtraced beam attention peaks == greedy alignment argmax
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(g_aligns, axis=-1)), np.asarray(b_res.peaks)
    )


def _batch(b=2, s=1600, st=4):
    rs = np.random.RandomState(0)
    return {
        "audio": jnp.asarray(rs.randn(b, s) * 1000, jnp.float32),
        "audio_lengths": jnp.asarray([s, s - 300]),
        "targets": jnp.asarray(rs.randint(3, V, (b, st)), jnp.int32),
        "target_lengths": jnp.asarray([st, st - 1]),
        "grapheme_targets": jnp.asarray(rs.randint(3, V, (b, st)), jnp.int32),
        "grapheme_lengths": jnp.asarray([st, st - 2]),
    }


def test_compute_loss_full_model():
    codes = np.random.RandomState(1).randint(0, 2, (V, 5)).astype(np.float32)
    speller = SpellerConfig(
        vocab_size=V, embedding_dim=6, num_layers=1, units=8, memory_dim=12,
        attention_units=7, attention_layer_size=9, bos_id=BOS, eos_id=EOS,
        binf_mode="head", num_binf=5, sampling_probability=0.2,
    )
    cfg = LASConfig(
        listener=ListenerConfig(input_dim=120, num_layers=2, units=6, dropout=0.1),
        speller=speller,
        grapheme_speller=SpellerConfig(
            vocab_size=V, embedding_dim=6, num_layers=1, units=8, memory_dim=12,
            attention_units=7, attention_layer_size=9, bos_id=BOS, eos_id=EOS,
        ),
    )
    params = init_las(jax.random.PRNGKey(0), cfg, binf_codes=codes)
    batch = _batch()
    loss, aux = jax.jit(
        lambda p, b, r: compute_loss(p, cfg, b, train=True, rng=r)
    )(params, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    for k in ("phone_loss", "binf_loss", "grapheme_loss"):
        assert np.isfinite(float(aux[k])), k

    # gradable end to end
    g = jax.grad(lambda p: compute_loss(p, cfg, batch, train=False)[0])(params)
    flat = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)


def test_binf_logits_mode_decodes():
    codes = np.random.RandomState(1).randint(0, 2, (V, 5)).astype(np.float32)
    cfg, params = _tiny_speller(binf_mode="logits", num_binf=5, codes=codes)
    mem, mask = _memory()
    toks, lens, _ = greedy_decode(params, cfg, mem, mask, max_steps=5)
    assert toks.shape == (2, 5)


def test_binf_embedding_mode_trains_and_decodes():
    codes = np.random.RandomState(2).randint(0, 2, (V, 5)).astype(np.float32)
    cfg, params = _tiny_speller(binf_mode="embedding", num_binf=5, codes=codes)
    # embedding table is a projection of the static code matrix
    assert params.embedding.shape == (5, cfg.embedding_dim)
    mem, mask = _memory()
    dec_in = jnp.asarray([[BOS, 3, 4], [BOS, 5, 6]], jnp.int32)
    logits, _, _ = teacher_forced_decode(params, cfg, dec_in, mem, mask)
    assert logits.shape == (2, 3, V)

    def loss(p):
        lg, _, _ = teacher_forced_decode(p, cfg, dec_in, mem, mask)
        return jnp.sum(lg**2)

    g = jax.grad(loss)(params)
    assert np.isfinite(np.asarray(g.embedding)).all()
    toks, lens, _ = greedy_decode(params, cfg, mem, mask, max_steps=5)
    assert toks.shape == (2, 5)


def test_production_scope_decoder_dot_close_to_parity():
    """Under the production matmul scope the speller's recurrent dot runs
    as one bf16 MXU pass (models/speller.py _recurrent_dot); its logits
    must stay close to the parity-mode computation and greedy tokens must
    normally agree on a well-separated model."""
    cfg, params = _tiny_speller()
    mem, mask = _memory()
    dec_in = jnp.asarray([[BOS, 3, 4], [BOS, 5, 6]], jnp.int32)
    ref, _, _ = teacher_forced_decode(params, cfg, dec_in, mem, mask)
    with jax.default_matmul_precision("default"):
        prod = jax.jit(
            lambda p: teacher_forced_decode(p, cfg, dec_in, mem, mask)[0]
        )(params)
    dev = float(jnp.max(jnp.abs(ref - prod)))
    scale = float(jnp.max(jnp.abs(ref)))
    assert dev <= max(2e-2 * scale, 2e-2), (dev, scale)
