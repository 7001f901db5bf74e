"""Child process for the multi-host simulation test (run via subprocess).

Each process: initialize the multi-controller runtime over localhost,
then drive the REAL Trainer — mesh spanning both processes' devices,
per-process slice of a MIXED-BUCKET epoch plan (the bucket-aligned
grouping in ``shard_plan`` is what keeps both processes in the same
compiled program at every step), and the multi-host eval leg (local
per-process decode, metrics summed across processes). Both processes
must print identical train losses and identical aggregated eval
metrics.

Usage: python multihost_child.py <coordinator> <num_procs> <pid> <data.plu>
"""

import sys


def main():
    coord, n_procs, pid, data_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    import jax

    jax.config.update("jax_platforms", "cpu")  # before distributed init

    from phones_las_tpu.parallel.multihost import initialize_distributed

    assert initialize_distributed(coord, n_procs, pid)
    assert jax.process_count() == n_procs, jax.process_count()

    import numpy as np

    from phones_las_tpu.data.pipeline import DataSource, PipelineConfig
    from phones_las_tpu.data.vocab import Vocab
    from phones_las_tpu.models import LASConfig, ListenerConfig, SpellerConfig
    from phones_las_tpu.parallel import make_mesh
    from phones_las_tpu.train import TrainConfig, Trainer

    vocab = Vocab([f"ph{i}" for i in range(5)])
    cfg = LASConfig(
        listener=ListenerConfig(input_dim=120, num_layers=2, units=16),
        speller=SpellerConfig(
            vocab_size=len(vocab), embedding_dim=8, num_layers=1, units=16,
            memory_dim=32, attention_units=16, attention_layer_size=16,
        ),
    )
    # two buckets: utterances span 0.2–3 s, so the epoch plan mixes
    # bucket shapes and exercises the bucket-aligned plan stride
    pipe = PipelineConfig(
        batch_size=4, buckets=(24000, 48000), max_target_len=24,
        eos_id=vocab.eos_id, pad_id=vocab.pad_id, shuffle=True,
    )
    shard = (jax.process_index(), jax.process_count())
    src = DataSource([data_path], pipe, shard=shard)
    eval_pipe = PipelineConfig(
        batch_size=4, buckets=(24000, 48000), max_target_len=24,
        eos_id=vocab.eos_id, pad_id=vocab.pad_id, shuffle=False,
        drop_remainder=False,
    )
    eval_src = DataSource([data_path], eval_pipe, shard=shard)

    tc = TrainConfig(num_steps=3, log_every=1, eval_every=10**9,
                     checkpoint_every=10**9)
    tr = Trainer(cfg, tc, implementation="xla", mesh=make_mesh())

    losses = []
    tr.fit(src.repeat(), log_fn=lambda m: losses.append(m.get("loss")))
    assert losses and all(np.isfinite(l) for l in losses), losses

    ev = tr.evaluate(eval_src.epoch(0))
    assert np.isfinite(ev["loss"]) and ev["ref_tokens"] > 0, ev
    print(
        "LOSSES", " ".join(f"{l:.6f}" for l in losses),
        "| EVAL", f"{ev['loss']:.6f}", f"{ev['per']:.6f}", ev["ref_tokens"],
        flush=True,
    )


if __name__ == "__main__":
    main()
