"""Train the masked sort+press pipeline at the LITERAL reference cadence
(n_envs=1, n_steps=2048 — SB3 PPO defaults with a single env, which is
exactly what the reference's Train_Agent runs) for several training
seeds.  Contrast with modular_seeds_train_r5.py (n_envs=16, n_steps=128,
same samples/iteration): if the 1-env cadence reaches the published
30.6-class modular score, the flow default's 16-env fragmentation is the
root cause of the gap."""
import sys, os, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/marl_tpu_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/marl_tpu_jax_cache")
from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.learn import trainer
from marl_sortingenv_tpu.utils import checkpoint as CK

SEEDS = [int(x) for x in (sys.argv[1:] or ["42", "43", "44"])]
cfg = load_config(max_steps=200, noise_sorting=0.0, balesize=200)
outdir = "/root/repo/artifacts/modular_cadence_r5"
os.makedirs(outdir, exist_ok=True)

for seed in SEEDS:
    t0 = time.time()
    print(f"=== training seed {seed} (n_envs=1, n_steps=2048) ===",
          flush=True)
    sort_res = trainer.train_agent(
        cfg, "sort", 100_000, n_envs=1, use_action_masking=True,
        seed=seed, engine="fastb", models_dir=outdir,
        save_prefix=f"s{seed}_PPO_Sorting", verbose=True)
    press_res = trainer.train_agent(
        cfg, "press", 100_000, n_envs=1, use_action_masking=True,
        sort_params=sort_res.params, seed=seed, engine="fastb",
        models_dir=outdir, save_prefix=f"s{seed}_PPO_Pressing",
        verbose=True)
    print(f"seed {seed}: sort final {sort_res.final_eval_mean:.2f}, "
          f"press final {press_res.final_eval_mean:.2f}  "
          f"({time.time()-t0:.0f}s)", flush=True)
print("done", flush=True)
