"""Analysis figures — reference ``utils/plot_env_analysis.py`` (accuracy
sweep :15-89, reward-vs-deviation :95-212, ``run_env_analysis`` :218-236)
and ``utils/reward_plot.py`` (standalone reward-shape figures :14-39)."""

from __future__ import annotations

import os

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_material_accuracies(cfg, out_path="./img/figures/accuracies.png"):
    """Accuracy per material under both sorting modes, with the noise band
    (reference sweep plot)."""
    plt = _plt()
    mats = ["A", "B", "C", "D"]
    base = np.asarray(cfg.baseline_accuracy)
    n = cfg.effective_noise
    fig, axes = plt.subplots(1, 2, figsize=(10, 4), sharey=True)
    for mode, ax in zip((0, 1), axes):
        boost = np.zeros(4)
        boost[[0, 2] if mode == 0 else [1, 3]] = cfg.boost
        acc = np.clip(base + boost, 0, 1)
        ax.bar(mats, acc, color=["#4C72B0", "#C44E52", "#55A868", "#8172B2"])
        if n > 0:
            ax.errorbar(mats, acc, yerr=n, fmt="none", c="black", capsize=4)
        ax.set_ylim(0, 1.1)
        ax.set_title(f"Mode {mode} (boost {'A/C' if mode == 0 else 'B/D'})")
    fig.suptitle("Sorting accuracies by mode")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    fig.savefig(out_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return out_path


def plot_sorting_rewards_vs_purity_deviation(
        cfg, out_path="./img/figures/sorting_reward.png"):
    """The sorting reward shape: tanh(mean(purity - theta) * 2 / 0.5)
    (reference reward_plot.py:14-25; env_super.py:963-1003)."""
    plt = _plt()
    purity = np.linspace(0.0, 1.0, 500)
    score = purity - cfg.purity_threshold_theta
    reward = np.tanh(score * cfg.purity_scaling_factor
                     / cfg.tanh_temperature)
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(purity, reward, lw=2)
    ax.axvline(cfg.purity_threshold_theta, ls="--", c="gray")
    ax.axhline(0, ls=":", c="gray")
    ax.set_xlabel("mean container purity")
    ax.set_ylabel("sorting reward")
    ax.set_title(r"Sorting reward: $\tanh((\bar p - \theta) \cdot 2 / 0.5)$")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    fig.savefig(out_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return out_path


def plot_press_reward_curves(cfg, out_path="./img/figures/press_reward.png"):
    """Press action reward vs pressed amount: triangular efficiency wave +
    multi-bale bonus peaks (reference reward_plot.py:27-39;
    env_super.py:1052-1071)."""
    plt = _plt()
    bs = cfg.effective_balesize
    amount = np.arange(0, 4 * bs + 1)
    rem = amount % bs
    dist = np.minimum(rem, bs - rem)
    bef = cfg.bale_efficiency_factor
    eff = (1.0 - 4.0 * dist / bs) * bef
    peaks = np.array([0.0, 1 / 3, 2 / 3, 1.0])
    idx = np.minimum(amount // bs, 3)
    bonus = peaks[idx] - bef
    r = np.clip(eff + bonus, -1, 1)
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.plot(amount, r, lw=1.5)
    for k in range(1, 5):
        ax.axvline(k * bs, ls="--", c="gray", lw=0.8)
    ax.set_xlabel("amount pressed (units)")
    ax.set_ylabel("action reward")
    ax.set_title("Press action reward vs pressed amount")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    fig.savefig(out_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return out_path


def run_env_analysis(cfg, out_dir="./img/figures"):
    """Reference run_env_analysis (plot_env_analysis.py:218-236): renders
    the accuracy and sorting-reward figures."""
    return [
        plot_material_accuracies(
            cfg, os.path.join(out_dir, "accuracies.png")),
        plot_sorting_rewards_vs_purity_deviation(
            cfg, os.path.join(out_dir, "sorting_reward.png")),
        plot_press_reward_curves(
            cfg, os.path.join(out_dir, "press_reward.png")),
    ]
