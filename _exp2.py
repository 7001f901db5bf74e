import time, numpy as np, jax, jax.numpy as jnp
from phones_las_tpu.models.las import compute_loss, init_las
from phones_las_tpu.train.state import TrainConfig, make_optimizer, mask_grads
from __graft_entry__ import _flagship_cfg
import optax

cfg = _flagship_cfg()
params = init_las(jax.random.PRNGKey(0), cfg)
tx = make_optimizer(TrainConfig())
opt0 = tx.init(params)
B, S, ST = 32, 128000, 200
rs = np.random.RandomState(0)
batch = {
    "audio": jnp.asarray(rs.randn(B,S)*2000, jnp.float32),
    "audio_lengths": jnp.full((B,), S, jnp.int32),
    "targets": jnp.asarray(rs.randint(4, 34, (B,ST)), jnp.int32),
    "target_lengths": jnp.full((B,), ST, jnp.int32),
}
for impl in ("xla", "pallas"):
    @jax.jit
    def step(params, opt_state, batch):
        (loss,_), g = jax.value_and_grad(lambda p: compute_loss(p, cfg, batch, train=False, implementation=impl), has_aux=True)(params)
        g = mask_grads(g, params)
        up, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, up), opt_state, loss
    t0=time.time()
    p2, o2, loss = step(params, opt0, batch)
    print(f"[{impl}] compile+first: {time.time()-t0:.0f}s loss={float(loss):.4f}", flush=True)
    t0=time.time()
    outs = [step(params, opt0, batch) for _ in range(5)]
    np.asarray(outs[-1][2])
    dt=(time.time()-t0)/5
    print(f"[{impl}] train step: {dt*1000:.0f} ms/batch ({B/dt:.1f} utt/s)", flush=True)
