import time, sys
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/marl_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax import lax
sys.path.insert(0, "/root/repo")
from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.core import fastb as FB
from marl_sortingenv_tpu.ops import step_pallas as SPK

for T in (600, 1400):
    cfg = load_config(bale_mode="events", max_steps=T)
    E = cfg.max_press_events
    tile = SPK._tile_for(4096 // 128, E)
    print(f"max_steps={T} E={E} tile={tile}", flush=True)
    cx = cfg.with_(step_kernel="xla")
    def roll(cc):
        stepped = FB.mono_autoreset_step(cc, "rule")
        def body(st, _):
            st, out = stepped(st, jnp.zeros(4096, jnp.int32))
            return st, out.reward
        st0 = FB.reset_batch(cc, jax.random.PRNGKey(7), 4096)
        t0 = time.time()
        r = jax.jit(lambda s: lax.scan(body, s, None, length=32))(st0)
        jax.tree.map(np.asarray, r)
        print(f"  kernel={cc.step_kernel}: {time.time()-t0:.1f}s", flush=True)
        return r
    st_p, rew_p = roll(cfg)
    st_x, rew_x = roll(cx)
    for nm, a, b in zip(FB.BState._fields, st_x, st_p):
        if a is not None and not bool(jnp.array_equal(a, b)):
            raise AssertionError(f"T={T} diverged on state.{nm}")
    assert bool(jnp.array_equal(rew_x, rew_p)), T
    print(f"  T={T}: BITWISE PASS", flush=True)
print("BIG-E OK", flush=True)
