"""VERDICT r4 item 6: the train_run (scanned segment) vs train_iter
(chained per-iteration dispatch) ~20% gap at 4096/8192 envs.

Measures, with bench.py's exact methodology (same pcfg, chain=16 for
per-iter, chain=2 for seg dispatches, best-of-3, one to-host fence):
  * train_iter chained          (BENCH_r04: 44.9M @4096, 55.8M @8192)
  * train_run seg=8 unroll=1    (BENCH_r04: 35.2M @4096, 44.5M @8192)
  * train_run seg=8 unroll=2/4/8 — the round-5 lever: unrolling the
    iteration scan lets XLA alias the transition buffers across
    consecutive iterations inside one body, which the rolled while-loop
    cannot do (artifacts/train_floor_r4.md §2: +3.3 ms/iter).

Writes train_run_gap_r5.json.  Run on the real chip, solo.
"""
import sys, os, time, json
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/marl_tpu_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/marl_tpu_jax_cache")
import numpy as np
from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.learn import ppo

N_STEPS, MB, EPOCHS, SHUF = 64, 16, 4, 128
cfg = load_config(max_steps=200, noise_sorting=0.0, balesize=200)


def pcfg_for(n_envs):
    return ppo.PPOConfig(n_steps=N_STEPS,
                         batch_size=n_envs * N_STEPS // MB,
                         n_epochs=EPOCHS, shuffle_block=SHUF)


def time_chain(run, carry, work, chain, repeats=3):
    carry, s = run(carry)
    np.asarray(s)
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        c = carry
        for _ in range(chain):
            c, s = run(c)
        np.asarray(s)
        dt = time.perf_counter() - t0
        best = max(best, chain * work / dt)
        carry = c
    return best


out = {}
for n_envs in (4096, 8192):
    pcfg = pcfg_for(n_envs)
    spec = ppo.spec_for("mono", engine="fastb")
    steps_per_iter = n_envs * N_STEPS

    ts = ppo.init_train_state(cfg, pcfg, spec, n_envs=n_envs, seed=0)
    it = ppo.make_train_iteration(cfg, pcfg, spec)
    sps = time_chain(lambda t: (lambda t2, st: (t2, st["loss"]))(*it(t)),
                     ts, steps_per_iter, chain=16)
    out[f"train_iter_{n_envs}"] = round(sps / 1e6, 2)
    print(f"{n_envs} train_iter           : {sps/1e6:7.2f}M steps/s",
          flush=True)

    for unroll in (1, 2, 4, 8):
        ts = ppo.init_train_state(cfg, pcfg, spec, n_envs=n_envs, seed=0)
        seg = ppo.make_train_run(cfg, pcfg, spec, 8, seg_unroll=unroll)
        t0 = time.perf_counter()
        sps = time_chain(
            lambda t: (lambda t2, st: (t2, st["loss"][-1]))(*seg(t)),
            ts, steps_per_iter * 8, chain=2)
        out[f"train_run8_u{unroll}_{n_envs}"] = round(sps / 1e6, 2)
        print(f"{n_envs} train_run seg8 u={unroll}: {sps/1e6:7.2f}M steps/s "
              f"(first-call {time.perf_counter()-t0:.0f}s incl compile)",
              flush=True)

with open("/root/repo/artifacts/train_run_gap_r5.json", "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out), flush=True)
