"""A/B: fastb bale_mode "full" vs "events" on the real TPU.

Times bench.py's three single-chip surfaces (rule closed loop, fused
policy+env, full PPO train iteration) under both bale representations.
Event mode is bitwise-lossless (tests/test_bale_events.py); this measures
what removing the (5, MAX_BALES, N) ring-buffer rewrite from the step is
worth on hardware.
"""
import sys

sys.path.insert(0, "/root/repo")

import bench
from marl_sortingenv_tpu.config.config import load_config

for mode in ("full", "events"):
    cfg = load_config(bale_mode=mode)
    rule = bench.bench_mono_rule(cfg)
    fused = bench.bench_fused_policy(cfg)
    train_sps, train_ups = bench.bench_train_iteration(cfg, bench.N_ENVS)
    print(f"bale_mode={mode:6s}  mono_rule {rule/1e6:7.2f}M  "
          f"fused {fused/1e6:7.2f}M  train {train_sps/1e6:6.2f}M "
          f"({train_ups:.1f} up/s)", flush=True)
