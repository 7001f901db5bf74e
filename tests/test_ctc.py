"""Joint CTC-attention training: loss wiring, decode collapse, sharding."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
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
