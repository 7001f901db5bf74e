import time, numpy as np, jax, jax.numpy as jnp
from phones_las_tpu.models.las import encode, init_las
from phones_las_tpu.decode import greedy_decode
from __graft_entry__ import _flagship_cfg

cfg = _flagship_cfg()
params = init_las(jax.random.PRNGKey(0), cfg)
B, S = 64, 160000
x = jnp.asarray(np.random.RandomState(0).randn(B,S)*2000, jnp.float32)
sl = jnp.full((B,), S, jnp.int32)

for prec in ("default", "highest"):
    @jax.jit
    def infer(params, audio, lengths):
        with jax.default_matmul_precision(prec):
            memory, _, enc_mask = encode(params, cfg, audio, lengths, implementation="pallas")
            toks, lens, _ = greedy_decode(params.speller, cfg.speller, memory, enc_mask, max_steps=200)
            return toks, lens
    np.asarray(infer(params, x, sl)[0])
    t0=time.time()
    outs=[infer(params,x,sl) for _ in range(20)]
    np.asarray(outs[-1][0])
    dt=(time.time()-t0)/20
    print(f"[{prec}] {dt*1000:.1f} ms/batch ({B/dt:.0f} utt/s)", flush=True)
