"""End-to-end integration (SURVEY.md §5 item 3): synthetic corpus →
train a tiny model on CPU → loss decreases, eval runs, checkpoint
round-trips."""

import numpy as np
import pytest

import jax

from phones_las_tpu.data.pipeline import DataSource, PipelineConfig
from phones_las_tpu.data.synthetic import write_synth_corpus
from phones_las_tpu.models import LASConfig, ListenerConfig, SpellerConfig
from phones_las_tpu.train import TrainConfig, Trainer

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth")
    path, vocab = write_synth_corpus(str(d / "train.plu"), n_utts=24, n_phones=6)
    return path, vocab


def last_less_than_first(train_logs):
    return train_logs[-1]["loss"] < train_logs[0]["loss"]


def _cfgs(vocab):
    model_cfg = LASConfig(
        listener=ListenerConfig(input_dim=120, num_layers=2, units=16),
        speller=SpellerConfig(
            vocab_size=len(vocab), embedding_dim=8, num_layers=1, units=16,
            memory_dim=32, attention_units=16, attention_layer_size=16,
            bos_id=vocab.sos_id, eos_id=vocab.eos_id,
        ),
    )
    pipe_cfg = PipelineConfig(
        batch_size=8, buckets=(24000,), max_target_len=12,
        eos_id=vocab.eos_id, pad_id=vocab.pad_id, drop_remainder=False,
    )
    return model_cfg, pipe_cfg


def test_train_loss_decreases_and_eval_runs(corpus, tmp_path):
    path, vocab = corpus
    model_cfg, pipe_cfg = _cfgs(vocab)
    train_cfg = TrainConfig(
        num_steps=30, log_every=10, eval_every=1000, checkpoint_every=1000,
        learning_rate=3e-3,
    )
    source = DataSource([path], pipe_cfg)
    trainer = Trainer(model_cfg, train_cfg, workdir=str(tmp_path / "run"))

    losses = []
    trainer.fit(
        source.repeat(),
        log_fn=lambda m: losses.append(m),
    )
    assert int(trainer.state.step) == 30
    # training signal: the first logged window loss exceeds the last
    # (log_fn receives structured dicts tagged 'train'/'eval')
    train_logs = [m for m in losses if m.get("tag") == "train"]
    assert last_less_than_first(train_logs)

    ev = trainer.evaluate(source.epoch(0), max_steps=12)
    assert np.isfinite(ev["loss"])
    assert 0.0 <= ev["per"] <= 2.0
    assert ev["ref_tokens"] > 0
    # derailment telemetry: fraction of decodes that ran to the step cap
    # without <eos>; a 30-step model decoding with a tight 12-step cap
    # must flag (nearly) every utterance, and the rate is a valid ratio
    assert 0.0 <= ev["cap_hit_rate"] <= 1.0
    ev_wide = trainer.evaluate(source.epoch(0), max_steps=64)
    assert ev_wide["cap_hit_rate"] <= ev["cap_hit_rate"]


def test_checkpoint_resume(corpus, tmp_path):
    path, vocab = corpus
    model_cfg, pipe_cfg = _cfgs(vocab)
    train_cfg = TrainConfig(num_steps=6, log_every=3, checkpoint_every=3)
    source = DataSource([path], pipe_cfg)

    wd = str(tmp_path / "run2")
    t1 = Trainer(model_cfg, train_cfg, workdir=wd)
    t1.fit(source.repeat())
    p1 = t1.state.params
    assert int(t1.state.step) == 6

    # a fresh Trainer on the same workdir restores step and params
    t2 = Trainer(model_cfg, train_cfg, workdir=wd)
    assert int(t2.state.step) == 6
    a = jax.tree.leaves(p1)
    b = jax.tree.leaves(t2.state.params)
    assert all(np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(a, b))
