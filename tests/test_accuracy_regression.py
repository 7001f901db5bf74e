"""Accuracy regression gate (r1 VERDICT item 1).

The bundled tone corpus is spectrally separable, so a small LAS must
train to near-zero PER on held-out utterances; a change that breaks
learning dynamics (loss masking, attention, scheduled sampling, CMVN,
pyramid lengths) fails this gate even if every unit test still passes.

Measured reference point for this exact recipe: PER = 0.026 after 700
steps (CPU, ~90 s). The threshold leaves ~3x headroom for run-to-run
numerical drift; a real regression (PER >= 0.1) is far outside it.
"""

import numpy as np

from phones_las_tpu.data.pipeline import DataSource, PipelineConfig
from phones_las_tpu.data.synthetic import write_synth_corpus
from phones_las_tpu.models import LASConfig, ListenerConfig, SpellerConfig
from phones_las_tpu.train import TrainConfig, Trainer

import pytest

pytestmark = pytest.mark.slow


def test_trains_to_low_per_on_tone_corpus(tmp_path):
    path, vocab = write_synth_corpus(
        str(tmp_path / "train.plu"), n_utts=256, n_phones=6
    )
    tpath, _ = write_synth_corpus(
        str(tmp_path / "test.plu"), n_utts=24, n_phones=6, seed=1
    )
    model_cfg = LASConfig(
        listener=ListenerConfig(input_dim=120, num_layers=2, units=64),
        speller=SpellerConfig(
            vocab_size=len(vocab), embedding_dim=16, num_layers=1, units=64,
            memory_dim=128, attention_units=64, attention_layer_size=64,
            bos_id=vocab.sos_id, eos_id=vocab.eos_id,
        ),
    )
    pipe = PipelineConfig(
        batch_size=16, buckets=(24000,), max_target_len=12,
        eos_id=vocab.eos_id, pad_id=vocab.pad_id, drop_remainder=False,
    )
    eval_pipe = PipelineConfig(
        batch_size=24, buckets=(24000,), max_target_len=12,
        eos_id=vocab.eos_id, pad_id=vocab.pad_id, drop_remainder=False,
        shuffle=False,
    )
    train_cfg = TrainConfig(
        num_steps=700, log_every=10**9, eval_every=10**9,
        checkpoint_every=10**9, learning_rate=2e-3,
    )
    trainer = Trainer(model_cfg, train_cfg)
    trainer.fit(DataSource([path], pipe).repeat(), log_fn=lambda m: None)
    ev = trainer.evaluate(DataSource([tpath], eval_pipe).epoch(0))
    assert ev["ref_tokens"] > 100
    assert ev["per"] <= 0.08, f"tone-corpus PER regressed: {ev['per']:.4f}"
    assert np.isfinite(ev["loss"])
