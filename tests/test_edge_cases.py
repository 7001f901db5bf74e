"""Edge-case robustness: degenerate utterances through the full stack."""

import numpy as np
import jax
import jax.numpy as jnp

from phones_las_tpu.data.pipeline import DataSource, PipelineConfig
from phones_las_tpu.data.records import RecordWriter, Utterance
from phones_las_tpu.models import LASConfig, ListenerConfig, SpellerConfig
from phones_las_tpu.models.las import compute_loss, init_las


def test_degenerate_utterances_through_pipeline_and_model(tmp_path):
    path = str(tmp_path / "edge.plu")
    with RecordWriter(path) as w:
        # 1-sample audio, empty target
        w.write(Utterance("tiny", np.zeros(1, np.int16), np.zeros(0, np.int32)))
        # shorter than one frontend window
        w.write(Utterance("short", np.ones(100, np.int16) * 500,
                          np.asarray([4], np.int32)))
        # target longer than max_target_len: DROPPED by the planner
        # (training on clipped labels is worse than skipping — r1 ADVICE)
        w.write(Utterance("longt", np.ones(3000, np.int16) * 500,
                          np.asarray([4] * 50, np.int32)))
        # audio longer than the largest bucket with drop_too_long=False
        w.write(Utterance("longa", np.ones(9000, np.int16) * 500,
                          np.asarray([5, 6], np.int32)))

    cfg = PipelineConfig(
        batch_size=4, buckets=(4000,), max_target_len=8,
        drop_remainder=False, drop_too_long=False, shuffle=False,
    )
    batches = list(DataSource([path], cfg, use_native="never").epoch(0))
    assert len(batches) == 1
    b = batches[0]
    assert b["num_real"] == 3  # longt dropped (over-long target)
    assert "longt" not in b["utt_ids"]
    assert b["audio_lengths"].tolist()[:3] == [1, 100, 4000]  # longa truncated
    assert b["target_lengths"].tolist()[:3] == [1, 2, 3]  # eos counted

    model_cfg = LASConfig(
        listener=ListenerConfig(input_dim=120, num_layers=2, units=8),
        speller=SpellerConfig(
            vocab_size=10, embedding_dim=4, num_layers=1, units=8,
            memory_dim=16, attention_units=8, attention_layer_size=8,
        ),
    )
    params = init_las(jax.random.PRNGKey(0), model_cfg)
    dev = {k: jnp.asarray(v) for k, v in b.items()
           if k in ("audio", "audio_lengths", "targets", "target_lengths")}
    loss, aux = compute_loss(params, model_cfg, dev)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: compute_loss(p, model_cfg, dev)[0])(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


def test_native_edge_parity(tmp_path):
    from phones_las_tpu.data.native_records import NativeRecordReader

    if not NativeRecordReader.available():
        import pytest

        pytest.skip("no C++ compiler")
    path = str(tmp_path / "edge2.plu")
    with RecordWriter(path) as w:
        w.write(Utterance("tiny", np.zeros(1, np.int16), np.zeros(0, np.int32)))
        w.write(Utterance("longt", np.ones(500, np.int16),
                          np.asarray([4] * 50, np.int32)))
    cfg = PipelineConfig(batch_size=2, buckets=(400,), max_target_len=8,
                         drop_remainder=False, drop_too_long=False, shuffle=False)
    nb = list(DataSource([path], cfg, use_native="auto").epoch(0))
    pb = list(DataSource([path], cfg, use_native="never").epoch(0))
    for a, b in zip(nb, pb):
        for k in ("audio", "audio_lengths", "targets", "target_lengths"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
