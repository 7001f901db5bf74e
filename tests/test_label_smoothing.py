"""Label smoothing on the masked sequence CE."""

import jax
import jax.numpy as jnp
import numpy as np

from phones_las_tpu.models.las import masked_ce_loss


def test_smoothing_matches_analytic_mix():
    rs = np.random.RandomState(0)
    logits = jnp.asarray(rs.randn(2, 4, 6), jnp.float32)
    targets = jnp.asarray(rs.randint(0, 6, (2, 4)), jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 0], [1, 1, 0, 0]], jnp.float32)

    base = masked_ce_loss(logits, targets, mask)
    eps = 0.1
    smoothed = masked_ce_loss(logits, targets, mask, label_smoothing=eps)

    logp = jax.nn.log_softmax(logits, axis=-1)
    uniform = -jnp.mean(logp, axis=-1)
    want = (1 - eps) * base + eps * float(
        jnp.sum(uniform * mask) / jnp.sum(mask)
    )
    np.testing.assert_allclose(float(smoothed), float(want), rtol=1e-6)
    # smoothing=0 is exactly the unsmoothed loss
    np.testing.assert_array_equal(
        np.asarray(masked_ce_loss(logits, targets, mask, label_smoothing=0.0)),
        np.asarray(base),
    )
    # uniform term is a lower bound: smoothing raises loss for a
    # better-than-uniform model
    assert float(smoothed) != float(base)


def test_eval_loss_is_unsmoothed():
    from phones_las_tpu.models import LASConfig, ListenerConfig, SpellerConfig
    from phones_las_tpu.models.las import compute_loss, init_las
    import dataclasses

    cfg = LASConfig(
        listener=ListenerConfig(input_dim=120, num_layers=2, units=8),
        speller=SpellerConfig(
            vocab_size=10, embedding_dim=4, num_layers=1, units=8,
            memory_dim=16, attention_units=8, attention_layer_size=8,
        ),
    )
    smooth = dataclasses.replace(cfg, label_smoothing=0.2)
    params = init_las(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(0)
    batch = {
        "audio": jnp.asarray((rs.randn(2, 16000) * 1000).astype(np.float32)),
        "audio_lengths": jnp.asarray([16000, 12000], jnp.int32),
        "targets": jnp.asarray(rs.randint(4, 10, (2, 5)), jnp.int32),
        "target_lengths": jnp.asarray([5, 3], jnp.int32),
    }
    # train loss differs, eval loss identical
    lt0, _ = compute_loss(params, cfg, batch, train=True)
    lt1, _ = compute_loss(params, smooth, batch, train=True)
    assert float(lt0) != float(lt1)
    le0, _ = compute_loss(params, cfg, batch, train=False)
    le1, _ = compute_loss(params, smooth, batch, train=False)
    assert float(le0) == float(le1)
