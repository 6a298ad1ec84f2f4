"""Exact reward-table verification (core/reward_tables.py).

The sorting reward's final ``np.tanh`` is resolved via a host-built
lookup over the finite score set, so device rewards are NumPy's own tanh
outputs bit-for-bit.  These tests verify (a) the enumeration covers the
reachable domain, (b) the table reproduces the reference's scalar
pipeline exactly, (c) NumPy's vector tanh (used to fill the table) is
bitwise identical to the scalar calls the reference makes, and (d) the
press-reward integer cutoffs and action table match the f64 semantics.
"""

import numpy as np
import pytest

from marl_sortingenv_tpu.config.config import SimConfig
from marl_sortingenv_tpu.core import reward_tables as RT

CFG = SimConfig()
TAB = RT.build_sorting_table(CFG)
PTAB = RT.build_press_table(CFG)


def reference_sorting_reward(purities):
    """Scalar transliteration of env_super.py:963-1003 (float ops in the
    reference's exact order)."""
    theta = CFG.purity_threshold_theta
    score = 0.0
    for p in purities:
        score += p - theta
    raw = (score / 4.0) * CFG.purity_scaling_factor
    return np.tanh(raw / CFG.tanh_temperature)


def test_sorting_table_size_and_sorted():
    assert TAB.scores.size == TAB.rewards.size
    assert np.all(np.diff(TAB.scores) > 0)
    # default config: the enumeration is known to collapse to 1770 scores
    assert TAB.scores.size == 1770


def test_table_matches_scalar_reference_pipeline():
    grid = np.arange(101) / 100.0
    rng = np.random.default_rng(0)
    for _ in range(2000):
        cents = rng.integers(0, 101, size=4)
        purities = grid[cents]
        ref = reference_sorting_reward(purities)
        # score exactly as the engine computes it
        d = purities - np.float64(CFG.purity_threshold_theta)
        score = ((d[0] + d[1]) + d[2]) + d[3]
        k = np.searchsorted(TAB.scores, score)
        assert TAB.scores[k] == score
        assert TAB.rewards[k] == ref, (cents, TAB.rewards[k], ref)
        # staged cents path must land on the same entry
        k2 = TAB.idx4[TAB.idx3[TAB.idx2[cents[0], cents[1]], cents[2]],
                      cents[3]]
        assert k2 == k


def test_vector_tanh_equals_scalar_tanh_on_table_args():
    raw = (TAB.scores / 4.0) * np.float64(CFG.purity_scaling_factor)
    args = raw / np.float64(CFG.tanh_temperature)
    vec = np.tanh(args)
    scal = np.array([np.tanh(x) for x in args])
    np.testing.assert_array_equal(vec, scal)


def test_reward_decomposition_roundtrip():
    # sign * m * 2^e must reconstruct the f64 exactly
    rec = TAB.reward_sign.astype(np.float64) * np.ldexp(
        TAB.reward_m.astype(np.float64), TAB.reward_e)
    np.testing.assert_array_equal(rec, TAB.rewards)
    np.testing.assert_array_equal(TAB.reward_bits, TAB.rewards.view(np.uint64))


def test_press_cutoffs_match_f64_compares():
    cap = np.float64(CFG.container_capacity)
    levels = np.arange(0, 5000, dtype=np.int64)
    fill = levels / cap
    np.testing.assert_array_equal(
        levels >= PTAB.cut_catastrophic, fill > 1.0)
    np.testing.assert_array_equal(levels >= PTAB.cut_severe, fill > 0.95)
    np.testing.assert_array_equal(levels >= PTAB.cut_mild, fill > 0.90)


def test_press_action_table_matches_f64_formula():
    bs = CFG.effective_balesize
    bef = np.float64(CFG.bale_efficiency_factor)
    peaks = np.array([0.0, 1.0 / 3.0, 2.0 / 3.0, 1.0])
    for dist in range(bs // 2 + 1):
        eff = (1.0 - 4.0 * (np.float64(dist) / np.float64(bs))) * bef
        for nb in range(4):
            assert PTAB.action[dist, nb] == eff + (peaks[nb] - bef)


def test_off_grid_threshold_rejected():
    cfg = SimConfig(quality_threshold=0.905)
    with pytest.raises(AssertionError):
        RT.build_sorting_table(cfg)
