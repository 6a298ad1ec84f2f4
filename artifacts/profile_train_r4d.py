"""Device-time decomposition of the 8192-env train iteration into
rollout / GAE / update, each profiled as its own jit (device totals from
jax.profiler, immune to tunnel dispatch overhead)."""
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/marl_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.learn import ppo

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
cfg = load_config(bale_mode="events")
pcfg = ppo.PPOConfig(n_steps=64, batch_size=BATCH, n_epochs=4,
                     shuffle_block=128)
spec = ppo.spec_for("mono", engine="fastb")
ts = ppo.init_train_state(cfg, pcfg, spec, n_envs=N, seed=0)
step_fn = spec.step_fn(None, True)

roll = jax.jit(lambda ts: ppo.collect_rollout(cfg, pcfg, spec, ts,
                                              step_fn, True))
gae = jax.jit(lambda trs, lv: ppo.compute_gae(pcfg, trs, lv))
upd = jax.jit(lambda ts, trs, adv, ret: ppo.ppo_update(pcfg, ts, trs,
                                                       adv, ret))

ts2, trs, lv = roll(ts)
adv, ret = gae(trs, lv)
ts3, stats = upd(ts2, trs, adv, ret)
jax.block_until_ready(stats["loss"])


def device_ms(fn, *args, reps=4):
    o = fn(*args)
    jax.block_until_ready(jax.tree.leaves(o)[0])
    os.system("rm -rf /tmp/jt_r4d")
    with jax.profiler.trace("/tmp/jt_r4d"):
        for _ in range(reps):
            o = fn(*args)
        jax.block_until_ready(jax.tree.leaves(o)[0])
    d = glob.glob("/tmp/jt_r4d/plugins/profile/*/*.trace.json.gz")[0]
    with gzip.open(d) as f:
        tr = json.load(f)
    pids = {e["pid"] for e in tr["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "TPU" in str(e.get("args", {}).get("name", ""))}
    tot = collections.Counter()
    for e in tr["traceEvents"]:
        if (e.get("ph") == "X" and "dur" in e and e.get("pid") in pids
                and e["name"].startswith("jit_")):
            tot[e["name"]] += e["dur"]
    return max(tot.values()) / reps / 1e3 if tot else 0.0


r = device_ms(roll, ts)
g = device_ms(gae, trs, lv)
u = device_ms(upd, ts2, trs, adv, ret)
tot = r + g + u
print(f"n_envs={N} batch={BATCH}")
print(f"rollout {r:7.2f} ms   ({N*64/r*1e3/1e6:6.1f}M steps/s)")
print(f"GAE     {g:7.2f} ms")
print(f"update  {u:7.2f} ms")
print(f"sum     {tot:7.2f} ms device -> ceiling {N*64/tot*1e3/1e6:6.1f}M "
      f"steps/s, {1e3/tot:6.1f} up/s at zero host overhead")
