"""Train the default-preset (SB3-mirroring) masked sort+press pipeline at
several TRAINING seeds on the TPU, saving each stage's params.  A separate
CPU process (modular_seeds_bench_r5.py) benchmarks the modular cell.

Purpose (VERDICT r4 item 1): is the 20.0 +/- 5.2 modular score a weak
training-seed draw or a systematic default-preset deficit vs the published
30.61 +/- 0.87?"""
import sys, os, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/marl_tpu_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/marl_tpu_jax_cache")
from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.learn import trainer
from marl_sortingenv_tpu.utils import checkpoint as CK

SEEDS = [int(x) for x in (sys.argv[1:] or
                          ["42", "43", "44", "45", "46", "47"])]
cfg = load_config(max_steps=200, noise_sorting=0.0, balesize=200)
outdir = "/root/repo/artifacts/modular_seeds_r5"
os.makedirs(outdir, exist_ok=True)

for seed in SEEDS:
    t0 = time.time()
    print(f"=== training seed {seed} ===", flush=True)
    sort_res = trainer.train_agent(
        cfg, "sort", 100_000, n_envs=16, use_action_masking=True,
        seed=seed, engine="fastb", models_dir=outdir,
        save_prefix=f"s{seed}_PPO_Sorting", verbose=True)
    press_res = trainer.train_agent(
        cfg, "press", 100_000, n_envs=16, use_action_masking=True,
        sort_params=sort_res.params, seed=seed, engine="fastb",
        models_dir=outdir, save_prefix=f"s{seed}_PPO_Pressing",
        verbose=True)
    print(f"seed {seed}: sort final {sort_res.final_eval_mean:.2f}, "
          f"press final {press_res.final_eval_mean:.2f}  "
          f"({time.time()-t0:.0f}s)", flush=True)
print("done", flush=True)
