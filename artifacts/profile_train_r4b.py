"""Device-time breakdown of the FULL jitted PPO train iteration at 8192
envs (VERDICT r3 next-round #3): where do the ~13 ms actually go?
Profiles one iteration under jax.profiler.trace and prints the hottest
device ops (fusions / loops) with counts.
"""
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
cfg = load_config(bale_mode="events")
pcfg = ppo.PPOConfig(n_steps=64, batch_size=16384, n_epochs=4,
                     shuffle_block=128)
spec = ppo.spec_for("mono", engine="fastb")
ts = ppo.init_train_state(cfg, pcfg, spec, n_envs=N, seed=0)
it = ppo.make_train_iteration(cfg, pcfg, spec)

ts, stats = it(ts)
jax.block_until_ready(stats["loss"])

os.system("rm -rf /tmp/jt_r4b")
with jax.profiler.trace("/tmp/jt_r4b"):
    for _ in range(2):
        ts, stats = it(ts)
    jax.block_until_ready(stats["loss"])

d = glob.glob("/tmp/jt_r4b/plugins/profile/*/*.trace.json.gz")[0]
with gzip.open(d) as f:
    tr = json.load(f)
tot = collections.Counter()
cnt = collections.Counter()
pids = {e["pid"] for e in tr["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))}
for e in tr["traceEvents"]:
    if (e.get("ph") == "X" and "dur" in e and e.get("pid") in pids
            and not e["name"].startswith("$")):
        tot[e["name"]] += e["dur"]
        cnt[e["name"]] += 1

jit_total = max((v for k, v in tot.items() if k.startswith("jit_")), default=0)
print(f"device total (2 iterations): {jit_total/1e3:.2f} ms "
      f"-> {jit_total/2e3:.2f} ms/iteration at {N} envs")
shown = 0
for nm, us in tot.most_common(40):
    if nm.startswith("jit_"):
        continue
    print(f"  {us/2:9.1f} us  x{cnt[nm]//2:5d}  {nm[:90]}")
    shown += 1
    if shown >= 24:
        break
