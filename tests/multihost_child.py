"""Child process for the multi-host simulation test (run via subprocess).

Each process: initialize the multi-controller runtime over localhost,
build the global mesh, feed its OWN slice of the epoch plan, run jitted
train steps on globally-sharded batches, and print per-step losses.
Both processes must print identical, finite losses — the global batch
is assembled from per-process halves and the gradient psum spans both
processes' devices.

Usage: python multihost_child.py <coordinator> <num_procs> <pid> <data.plu>
"""

import sys


def main():
    coord, n_procs, pid, data_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    import jax

    jax.config.update("jax_platforms", "cpu")  # before distributed init

    from phones_las_tpu.parallel.multihost import (
        initialize_distributed,
        shard_batch_global,
    )

    assert initialize_distributed(coord, n_procs, pid)
    assert jax.process_count() == n_procs, jax.process_count()

    import numpy as np

    from phones_las_tpu.data.pipeline import DataSource, PipelineConfig
    from phones_las_tpu.data.vocab import Vocab
    from phones_las_tpu.models import (
        LASConfig, ListenerConfig, SpellerConfig, compute_loss, init_las,
    )
    from phones_las_tpu.parallel import make_mesh, shard_params
    from phones_las_tpu.train.state import TrainConfig, make_optimizer, mask_grads

    vocab = Vocab([f"ph{i}" for i in range(5)])
    cfg = LASConfig(
        listener=ListenerConfig(input_dim=120, num_layers=2, units=16),
        speller=SpellerConfig(
            vocab_size=len(vocab), embedding_dim=8, num_layers=1, units=16,
            memory_dim=32, attention_units=16, attention_layer_size=16,
        ),
    )
    pipe = PipelineConfig(
        batch_size=4, buckets=(24000,), max_target_len=12,
        eos_id=vocab.eos_id, pad_id=vocab.pad_id, shuffle=True,
    )
    # per-process slice of the shared plan (what cli.train --multihost does)
    src = DataSource([data_path], pipe,
                     shard=(jax.process_index(), jax.process_count()))

    mesh = make_mesh()  # all global devices on the 'data' axis
    params = shard_params(init_las(jax.random.PRNGKey(0), cfg), mesh)
    tx = make_optimizer(TrainConfig())
    opt_state = jax.jit(tx.init)(params)

    import optax

    @jax.jit
    def step(params, opt_state, batch):
        (loss, _), grads = jax.value_and_grad(
            lambda p: compute_loss(p, cfg, batch, train=False), has_aux=True
        )(params)
        grads = mask_grads(grads, params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i, batch in enumerate(src.epoch(0)):
        if i >= 3:
            break
        gbatch = shard_batch_global(batch, mesh)
        # global batch = per-process rows × process_count
        assert gbatch["audio"].shape[0] == pipe.batch_size * n_procs
        params, opt_state, loss = step(params, opt_state, gbatch)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses), losses
    print("LOSSES", " ".join(f"{l:.6f}" for l in losses), flush=True)


if __name__ == "__main__":
    main()
