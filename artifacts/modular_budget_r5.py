"""Budget ablation for the modular-gap analysis: train the DEFAULT-preset
(SB3-mirroring) press stage for 300k steps instead of the protocol's
100k (sort stays at 100k), training seeds 42/45 — the two weakest seeds
of the 100k sweep.  If press evals keep climbing and the modular cell
clears the published 30.6 with nothing but more samples at the SAME
hyperparameters, the 100k default-preset shortfall is a mid-learning
budget effect, not a learner defect."""
import sys, os, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/marl_tpu_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/marl_tpu_jax_cache")
from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.learn import trainer

cfg = load_config(max_steps=200, noise_sorting=0.0, balesize=200)
outdir = "/root/repo/artifacts/modular_budget_r5"
os.makedirs(outdir, exist_ok=True)

for seed in (42, 45):
    t0 = time.time()
    print(f"=== seed {seed}: sort 100k, press 300k, defaults ===",
          flush=True)
    sort_res = trainer.train_agent(
        cfg, "sort", 100_000, n_envs=16, use_action_masking=True,
        seed=seed, engine="fastb", models_dir=outdir,
        save_prefix=f"s{seed}_PPO_Sorting", verbose=True)
    press_res = trainer.train_agent(
        cfg, "press", 300_000, n_envs=16, use_action_masking=True,
        sort_params=sort_res.params, seed=seed, engine="fastb",
        models_dir=outdir, save_prefix=f"s{seed}_PPO_Pressing",
        verbose=True)
    print(f"seed {seed}: press final {press_res.final_eval_mean:.2f} "
          f"({time.time()-t0:.0f}s)", flush=True)
print("done", flush=True)
