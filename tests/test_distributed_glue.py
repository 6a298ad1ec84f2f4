"""Multi-host glue in single-process form: global env-state construction
and the mesh helpers."""

import numpy as np
import jax

from marl_sortingenv_tpu.config.config import load_config
from marl_sortingenv_tpu.core import fast as FE
from marl_sortingenv_tpu.parallel import distributed as DD
from marl_sortingenv_tpu.parallel import mesh as M


def test_global_env_state_single_process():
    cfg = load_config(max_steps=16)
    mesh = DD.global_mesh(tp=1)
    assert mesh.shape["dp"] == 8

    def reset_fn(cfg, n_local, seed0):
        return FE.reset_batch(cfg, jax.random.PRNGKey(seed0), n_local)

    st = DD.make_global_env_state(cfg, reset_fn, 32, mesh)
    assert st.cont_true.shape == (32, 5)
    assert len(st.cont_true.sharding.device_set) == 8
    # one vmapped step over the sharded state works
    st2, out = jax.jit(jax.vmap(lambda s: FE.step_mono_rule(cfg, s)))(st)
    assert np.isfinite(np.asarray(out.reward)).all()


def test_initialize_noop_single_process():
    DD.initialize()  # must not raise in single-process mode
