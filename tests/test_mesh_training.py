"""Mesh-parallel Trainer + multi-host helpers (fake-8 CPU mesh).

The reference has no distributed training (SURVEY.md §3); the rebuild's
Trainer accepts a mesh and trains DP(×TP) with GSPMD-inserted
collectives. These tests pin (a) numerical equivalence of the mesh
Trainer against the plain Trainer, (b) the per-process epoch-plan
sharding used for multi-host, (c) the CLI flag wiring.
"""

import numpy as np
import jax

from phones_las_tpu.data.pipeline import DataSource, PipelineConfig
from phones_las_tpu.data.synthetic import write_synth_corpus
from phones_las_tpu.models import LASConfig, ListenerConfig, SpellerConfig
from phones_las_tpu.parallel import make_mesh
from phones_las_tpu.parallel.multihost import shard_batch_global, shard_plan
from phones_las_tpu.train import TrainConfig, Trainer

import pytest

pytestmark = pytest.mark.slow


def _tiny_cfg(vocab_size):
    return LASConfig(
        listener=ListenerConfig(input_dim=120, num_layers=2, units=16),
        speller=SpellerConfig(
            vocab_size=vocab_size, embedding_dim=8, num_layers=1, units=16,
            memory_dim=32, attention_units=16, attention_layer_size=16,
        ),
    )


def _pipe(vocab):
    return PipelineConfig(
        batch_size=8, buckets=(24000,), max_target_len=12,
        eos_id=vocab.eos_id, pad_id=vocab.pad_id, shuffle=False,
        drop_remainder=False,
    )


def test_mesh_trainer_matches_plain_trainer(tmp_path):
    # n_phones=6 -> vocab 10: every 'model'-sharded axis (4U, vocab,
    # attention dims) must divide the model axis (2)
    path, vocab = write_synth_corpus(
        str(tmp_path / "train.plu"), n_utts=16, n_phones=6
    )
    cfg = _tiny_cfg(len(vocab))
    tc = TrainConfig(num_steps=4, log_every=10**9, eval_every=10**9,
                     checkpoint_every=10**9)

    def run(mesh):
        tr = Trainer(cfg, tc, implementation="xla", mesh=mesh)
        losses = []
        for batch in DataSource([path], _pipe(vocab)).repeat():
            if int(tr.state.step) >= tc.num_steps:
                break
            tr.state, out = tr._train_step(tr.state, tr._device_batch(batch))
            losses.append(float(out["loss"]))
        ev = tr.evaluate(DataSource([path], _pipe(vocab)).epoch(0))
        return losses, ev

    mesh = make_mesh(data=4, model=2)
    l_mesh, ev_mesh = run(mesh)
    l_ref, ev_ref = run(None)
    np.testing.assert_allclose(l_mesh, l_ref, rtol=1e-5, atol=1e-5)
    assert abs(ev_mesh["per"] - ev_ref["per"]) < 1e-9
    assert abs(ev_mesh["loss"] - ev_ref["loss"]) < 1e-4


def test_mesh_trainer_resume_preserves_adam_state(tmp_path):
    """shard_state_to_mesh must re-shard a restored opt_state, not
    re-initialize it — a resumed run's Adam moments survive."""
    path, vocab = write_synth_corpus(
        str(tmp_path / "train.plu"), n_utts=16, n_phones=5
    )
    cfg = _tiny_cfg(len(vocab))
    wd = str(tmp_path / "wd")
    tc = TrainConfig(num_steps=3, log_every=10**9, eval_every=10**9,
                     checkpoint_every=1, keep_checkpoints=1)
    tr = Trainer(cfg, tc, workdir=wd, implementation="xla")
    tr.fit(DataSource([path], _pipe(vocab)).repeat(), log_fn=lambda m: None)

    resumed = Trainer(cfg, tc, workdir=wd, implementation="xla",
                      mesh=make_mesh(data=8, model=1))
    assert int(resumed.state.step) == 3
    # Adam's nu (2nd moment) must be nonzero after real steps
    nus = [np.asarray(x) for x in jax.tree.leaves(resumed.state.opt_state[1].nu)]
    assert any(np.abs(v).max() > 0 for v in nus)


def test_shard_plan_partitions_evenly():
    plans = [(0, np.array([i])) for i in range(10)]
    a = shard_plan(plans, 0, 4)
    b = shard_plan(plans, 1, 4)
    c = shard_plan(plans, 2, 4)
    d = shard_plan(plans, 3, 4)
    assert len(a) == len(b) == len(c) == len(d) == 2
    seen = sorted(int(p[1][0]) for p in a + b + c + d)
    assert seen == list(range(8))  # last 2 dropped so counts agree


def test_datasource_shard_disjoint(tmp_path):
    path, vocab = write_synth_corpus(
        str(tmp_path / "train.plu"), n_utts=32, n_phones=5
    )
    pipe = PipelineConfig(
        batch_size=4, buckets=(24000,), max_target_len=12,
        eos_id=vocab.eos_id, pad_id=vocab.pad_id, shuffle=True,
    )
    ids0 = [
        tuple(b["utt_ids"]) for b in
        DataSource([path], pipe, shard=(0, 2)).epoch(0)
    ]
    ids1 = [
        tuple(b["utt_ids"]) for b in
        DataSource([path], pipe, shard=(1, 2)).epoch(0)
    ]
    assert len(ids0) == len(ids1) > 0
    assert not (set(ids0) & set(ids1))


def test_shard_batch_global_single_process(tmp_path):
    mesh = make_mesh(data=8, model=1)
    batch = {
        "audio": np.zeros((8, 1600), np.int16),
        "audio_lengths": np.full((8,), 1600, np.int32),
        "targets": np.zeros((8, 5), np.int32),
        "target_lengths": np.full((8,), 5, np.int32),
        "utt_ids": ["x"] * 8,
    }
    out = shard_batch_global(batch, mesh)
    assert out["audio"].shape == (8, 1600)
    assert "utt_ids" not in out
    assert len(out["audio"].sharding.device_set) == 8


def test_train_cli_mesh_flag(tmp_path, capsys):
    from phones_las_tpu.cli import prepare as prepare_cli
    from phones_las_tpu.cli import train as train_cli

    data, wd = str(tmp_path / "d"), str(tmp_path / "w")
    prepare_cli.main(["synthetic", "--out", data, "--n-utts", "16",
                      "--n-phones", "4"])
    train_cli.main([
        "--preset", "timit_phone_las", "--data", data, "--workdir", wd,
        "--num-steps", "2", "--batch-size", "8", "--mesh",
        "--encoder-layers", "2", "--encoder-units", "16",
        "--decoder-units", "16", "--embedding-dim", "8",
        "--attention-units", "16",
    ])
    out = capsys.readouterr().out
    assert "'tag': 'train'" in out and "final eval" in out

    # a mesh-trained checkpoint restores into the plain (unsharded) infer
    # path — the real user flow: train --mesh, infer anywhere
    import os

    from phones_las_tpu.cli import infer as infer_cli

    infer_cli.main(["--workdir", wd, "--data", os.path.join(data, "test.plu"),
                    "--batch-size", "8"])
    out = capsys.readouterr().out
    assert "PER=" in out


def test_mesh_trainer_multitask_binf(tmp_path):
    """Multitask + binf param trees shard correctly: grapheme speller and
    binf head leaves carry specs too (parallel/mesh.py) — one sharded
    step must match the unsharded one."""
    import jax.numpy as jnp

    from phones_las_tpu.data.synthetic import (
        synth_grapheme_inventory, write_synth_corpus,
    )
    from phones_las_tpu.data.vocab import Vocab
    import dataclasses

    path, vocab = write_synth_corpus(
        str(tmp_path / "train.plu"), n_utts=16, n_phones=6, graphemes=True
    )
    gvocab = Vocab(synth_grapheme_inventory())
    codes = np.random.RandomState(0).randint(0, 2, (len(vocab), 6)).astype(np.float32)
    base = _tiny_cfg(len(vocab))
    cfg = dataclasses.replace(
        base,
        speller=dataclasses.replace(base.speller, binf_mode="head", num_binf=6),
        grapheme_speller=dataclasses.replace(
            base.speller, vocab_size=len(gvocab),
        ),
        multitask_weight=0.5,
        binf_weight=1.0,
    )
    pipe = dataclasses.replace(_pipe(vocab), max_grapheme_len=24)
    tc = TrainConfig(num_steps=2, log_every=10**9, eval_every=10**9,
                     checkpoint_every=10**9)

    def run(mesh):
        tr = Trainer(cfg, tc, implementation="xla", mesh=mesh,
                     binf_codes=codes)
        losses = []
        for batch in DataSource([path], pipe).repeat():
            if int(tr.state.step) >= tc.num_steps:
                break
            tr.state, out = tr._train_step(tr.state, tr._device_batch(batch))
            losses.append(float(out["loss"]))
        return losses

    l_mesh = run(make_mesh(data=4, model=2))
    l_ref = run(None)
    np.testing.assert_allclose(l_mesh, l_ref, rtol=1e-5, atol=1e-5)


def test_shard_plan_preserves_mixed_bucket_order():
    """Steps come out in the canonical plan's completion order, NOT
    grouped by bucket — a bucket-sorted regroup would impose a
    shortest-first length curriculum every epoch that single-host
    training does not have. All ranks must still agree on the bucket at
    every step (same compiled SPMD program)."""
    import random

    rng = random.Random(0)
    plans = [(rng.choice([0, 1, 2]), np.array([i])) for i in range(60)]
    shards = [shard_plan(plans, i, 2) for i in range(2)]
    b0 = [p[0] for p in shards[0]]
    assert b0 == [p[0] for p in shards[1]]  # lockstep shapes
    assert b0 != sorted(b0)  # mixed order survives (no curriculum)
    # each step pairs two consecutive same-bucket batches of the plan
    seen = set()
    for r in shards:
        for p in r:
            key = int(p[1][0])
            assert key not in seen
            seen.add(key)
