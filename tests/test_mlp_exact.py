"""Integer-exact (fixed-point) MLP policy — models.mlp_exact — and the
frozen-policy exact step paths it enables (STATUS known-gap 2 closure).

Layers of evidence:
1. the baked tanh table is pinned by checksum (a libm change fails loudly);
2. the integer forward equals an independent pure-numpy int64 oracle
   bit for bit (the computation is its own portable spec);
3. quantized argmax agrees with the f32 policy on ~all states (random
   and trained params);
4. exact-engine frozen-policy trajectories (Env_2 frozen sort agent and
   the monolith modular 'model' path) match the parity engine driven by
   the SAME integer policy, bitwise — obs, rewards, actions, press logs.
On-chip CPU<->TPU bit-identity is certified by
``artifacts/mlp_exact_tpu.py`` (TPU scripts don't run in CI).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.core import exact_dynamics as XD
from marl_sortingenv_tpu.core import state as S, step as ST
from marl_sortingenv_tpu.models import mlp, mlp_exact as MX

CFG = load_config(max_steps=200, noise_sorting=0.0, balesize=200)


def test_tanh_table_pinned():
    assert MX.tanh_table_checksum() == 1467280001
    assert MX._TANH_TABLE[0] == -16373           # tanh(-4) in Q14
    assert MX._TANH_TABLE[-1] == 16373
    assert MX._TANH_TABLE[MX.TANH_IN_MAX] == 0   # tanh(0)
    # odd symmetry of the rounded table
    assert np.array_equal(MX._TANH_TABLE, -MX._TANH_TABLE[::-1])


def _numpy_forward(qp, obs_q):
    """Independent int64 oracle of policy_logits_q."""
    x = np.asarray(obs_q, np.int64)
    table = MX._TANH_TABLE
    for lyr in qp.pi:
        acc = (x @ np.asarray(lyr.w, np.int64)
               + np.asarray(lyr.b, np.int64))          # Q28
        h = acc >> MX.FRAC                              # arithmetic shift
        h = np.clip(h, -MX.TANH_IN_MAX, MX.TANH_IN_MAX).astype(np.int64)
        x = table[h + MX.TANH_IN_MAX].astype(np.int64)  # Q14
    return (x @ np.asarray(qp.action.w, np.int64)
            + np.asarray(qp.action.b, np.int64))


def test_integer_forward_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    for obs_dim, n_actions in ((13, 2), (16, 11)):
        params = mlp.init_params(jax.random.PRNGKey(3), obs_dim, n_actions)
        qp = MX.quantize_policy(params)
        obs = rng.uniform(-1, 1, (64, obs_dim)).astype(np.float32)
        obs_q = np.asarray(MX.quantize_obs(obs))
        got = np.asarray(MX.policy_logits_q(qp, jnp.asarray(obs_q)))
        want = _numpy_forward(qp, obs_q)
        np.testing.assert_array_equal(got, want)
        assert got.dtype == np.int64


def test_quantize_obs_is_exact_rint():
    obs = np.float32([[-1.0, -0.5, 0.0, 0.250244140625, 1.0]])
    np.testing.assert_array_equal(
        np.asarray(MX.quantize_obs(obs)),
        np.rint(obs.astype(np.float64) * MX.SCALE).astype(np.int32))


def _agreement(params, qp, obs, mask=None):
    f = np.asarray(mlp.predict_deterministic(
        params, obs, mask=None if mask is None else jnp.asarray(mask)))
    q = np.asarray(MX.predict_deterministic_q(
        qp, obs, mask=None if mask is None else jnp.asarray(mask)))
    return (f == q).mean()


def test_argmax_agreement_with_f32_policy():
    rng = np.random.default_rng(1)
    # trained flagship agents (committed artifacts): the measurement that
    # matters for benchmark equivalence
    from marl_sortingenv_tpu.utils import checkpoint as CK
    import os

    d = os.path.join(os.path.dirname(__file__), "..",
                     "artifacts", "models_masked")
    sp = CK.load_model(CK.find_latest_model("PPO_Sorting_Masked", d),
                       mlp.init_params(jax.random.PRNGKey(0), 13, 2))
    pp = CK.load_model(CK.find_latest_model("PPO_Pressing_Masked", d),
                       mlp.init_params(jax.random.PRNGKey(0), 16, 11))
    obs13 = rng.uniform(-1, 1, (2048, 13)).astype(np.float32)
    obs16 = rng.uniform(0, 1, (2048, 16)).astype(np.float32)
    assert _agreement(sp, MX.quantize_policy(sp), obs13) >= 0.99
    mask = rng.random((2048, 11)) < 0.5
    mask[:, 0] = True  # index 0 (no-op) always valid
    assert _agreement(pp, MX.quantize_policy(pp), obs16, mask) >= 0.99
    # random-init params: tiny (gain 0.01) logits are the worst case for
    # Q14 quantization — still near-total agreement (measured 0.992;
    # Q12 gave 0.941, which motivated FRAC=14)
    pr = mlp.init_params(jax.random.PRNGKey(9), 16, 11)
    assert _agreement(pr, MX.quantize_policy(pr), obs16) >= 0.97


def _scan(step, st, n):
    def body(st, _):
        st, out = step(st)
        return st, out
    return jax.jit(lambda st: lax.scan(body, st, None, length=n))(st)


def _trained_qpolicies():
    from marl_sortingenv_tpu.utils import checkpoint as CK
    import os

    d = os.path.join(os.path.dirname(__file__), "..",
                     "artifacts", "models_masked")
    sp = CK.load_model(CK.find_latest_model("PPO_Sorting_Masked", d),
                       mlp.init_params(jax.random.PRNGKey(0), 13, 2))
    pp = CK.load_model(CK.find_latest_model("PPO_Pressing_Masked", d),
                       mlp.init_params(jax.random.PRNGKey(0), 16, 11))
    return MX.quantize_policy(sp), MX.quantize_policy(pp)


def test_exact_press_frozen_sort_matches_parity():
    """Env_2 with the frozen (integer) sort agent: exact engine == parity
    engine driven by the same integer policy via its f64 logits view."""
    q_sort, _ = _trained_qpolicies()
    seed, steps = 42, 120
    rng = np.random.default_rng(11)
    # masked path: always-valid no-op actions; unmasked: arbitrary ones
    for masking in (True, False):
        acts = (np.zeros(steps, np.int64) if masking
                else rng.integers(0, 11, steps))

        def stepp(st, a):
            return ST.step_press(
                CFG, st, a,
                sort_policy=(lambda qp, o: MX.logits_q_as_f64(qp, o), q_sort),
                use_action_masking=masking)

        def stepx(st, a):
            return XD.step_press_model_exact(CFG, st, a, q_sort, masking)

        def scan_a(step, st):
            def body(st, a):
                st, out = step(st, a)
                return st, out
            return jax.jit(lambda st, a: lax.scan(body, st, a))(
                st, jnp.asarray(acts, jnp.int32))

        _, outs_p = scan_a(stepp, S.reset(CFG, seed))
        _, outs_x = scan_a(stepx, S.reset(CFG, seed))
        np.testing.assert_array_equal(
            np.asarray(outs_x["obs"]).view(np.uint32),
            np.asarray(outs_p.obs).view(np.uint32))
        np.testing.assert_array_equal(
            np.asarray(outs_x["reward_bits"]),
            np.asarray(outs_p.reward, np.float64).view(np.uint64))
        np.testing.assert_array_equal(
            np.asarray(outs_x["press_log"]), np.asarray(outs_p.press_log))


def test_exact_mono_model_matches_parity():
    """Monolith 'model' path (PPO Modular / Sort-Only benchmark
    scenarios): exact engine == parity engine on the same integer
    policies, including the rng_pressing fallback when no press agent is
    attached."""
    q_sort, q_press = _trained_qpolicies()
    adapter = lambda qp, o: MX.logits_q_as_f64(qp, o)
    for with_press in (True, False):
        qp = q_press if with_press else None
        pol = None if qp is None else (adapter, qp)

        def stepp(st):
            return ST.step_mono_model(CFG, st, (adapter, q_sort), pol,
                                      use_action_masking=True)

        def stepx(st):
            return XD.step_mono_model_exact(CFG, st, q_sort, qp, True)

        _, outs_p = _scan(stepp, S.reset(CFG, 7), 120)
        _, outs_x = _scan(stepx, S.reset(CFG, 7), 120)
        np.testing.assert_array_equal(
            np.asarray(outs_x["action"]), np.asarray(outs_p.action))
        np.testing.assert_array_equal(
            np.asarray(outs_x["obs"]).view(np.uint32),
            np.asarray(outs_p.obs).view(np.uint32))
        np.testing.assert_array_equal(
            np.asarray(outs_x["reward_bits"]),
            np.asarray(outs_p.reward, np.float64).view(np.uint64))
        np.testing.assert_array_equal(
            np.asarray(outs_x["sort_reward_bits"]),
            np.asarray(outs_p.sort_reward, np.float64).view(np.uint64))
        np.testing.assert_array_equal(
            np.asarray(outs_x["press_reward_bits"]),
            np.asarray(outs_p.press_reward, np.float64).view(np.uint64))


def test_exact_mono_policy_matches_parity():
    """Monolith-agent benchmark scenario (testing.py:37-44): exact ==
    parity on the same integer policy, masked and unmasked (the unmasked
    side crosses the sanitize timer-freeze quirk)."""
    from marl_sortingenv_tpu.utils import checkpoint as CK
    import os

    d = os.path.join(os.path.dirname(__file__), "..",
                     "artifacts", "models_masked")
    mp = CK.load_model(CK.find_latest_model("PPO_Monolith_Masked", d),
                       mlp.init_params(jax.random.PRNGKey(0), 29, 22))
    q_mono = MX.quantize_policy(mp)
    adapter = lambda qp, o: MX.logits_q_as_f64(qp, o)
    for masking in (True, False):
        _, outs_p = _scan(
            lambda st: ST.step_mono_policy(CFG, st, q_mono, adapter, masking),
            S.reset(CFG, 3), 120)
        _, outs_x = _scan(
            lambda st: XD.step_mono_policy_exact(CFG, st, q_mono, masking),
            S.reset(CFG, 3), 120)
        np.testing.assert_array_equal(
            np.asarray(outs_x["action"]), np.asarray(outs_p.action))
        np.testing.assert_array_equal(
            np.asarray(outs_x["obs"]).view(np.uint32),
            np.asarray(outs_p.obs).view(np.uint32))
        np.testing.assert_array_equal(
            np.asarray(outs_x["reward_bits"]),
            np.asarray(outs_p.reward, np.float64).view(np.uint64))
        np.testing.assert_array_equal(
            np.asarray(outs_x["press_log"]), np.asarray(outs_p.press_log))
