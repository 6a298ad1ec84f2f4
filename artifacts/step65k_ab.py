import sys, time
sys.path.insert(0,"/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/marl_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from jax import lax
from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.core import fastb as FB

N, STEPS = 65536, 256
res = {}
for kernel in ("pallas", "xla"):
    cfg = load_config(bale_mode="events", step_kernel=kernel)
    st = FB.reset_batch(cfg, jax.random.PRNGKey(0), N)
    stepped = FB.mono_autoreset_step(cfg, "rule")
    def body(st, _):
        st, out = stepped(st, jnp.zeros(N, jnp.int32))
        return st, out.reward.sum()
    run = jax.jit(lambda st: lax.scan(body, st, None, length=STEPS))
    t0 = time.perf_counter()
    stf, r = run(st); rr = np.asarray(r)
    print(f"{kernel} first call {time.perf_counter()-t0:.1f}s", flush=True)
    res[kernel] = (rr, np.asarray(stf.cont_true), np.asarray(stf.key))
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        c = stf
        for _ in range(4):
            c, r2 = run(c)
        np.asarray(r2[-1])
        best = max(best, 4*N*STEPS/(time.perf_counter()-t0))
    print(f"{kernel:6s} 65536 envs: {best/1e6:7.1f}M env-steps/s", flush=True)
print("bitwise:", all(np.array_equal(a,b) for a,b in zip(*res.values())), flush=True)
