"""Pallas kernel tests (interpret mode on CPU): the fused
fillDepthHoles+regularizeDepthMap kernel must match the XLA path
bit-for-bit — its body calls the same functions."""

import numpy as np
import jax
import jax.numpy as jnp

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
from egomotion_with_local_loop_closures_tpu.depth import propagate
from egomotion_with_local_loop_closures_tpu.depth import state as dstate
from egomotion_with_local_loop_closures_tpu.ops import reg_kernel

CFG = ELLCConfig(rows=48, cols=64, fx=60.0, fy=60.0, cx=32.0, cy=24.0)


def _random_state(seed=0, shape=(48, 64)):
    key = jax.random.PRNGKey(seed)
    mg = 3.0 * jax.random.uniform(jax.random.fold_in(key, 9), shape)
    st = dstate.initialize_random(key, mg, CFG)
    # punch holes + vary validity so both passes have work to do
    holes = jax.random.uniform(jax.random.fold_in(key, 1), shape) < 0.3
    st = st._replace(
        valid=st.valid & ~holes,
        idepth=jnp.where(holes, 0.0, st.idepth),
        validity=jnp.where(st.valid, 40.0, 0.0))
    return st, mg


def _assert_states_match(ref, got):
    """Discrete fields bit-exact; float fields to 1-2 ulp (XLA fuses FMAs
    differently inside vs outside the pallas_call)."""
    for name, a, b in zip(ref._fields, ref, got):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype in (np.bool_, np.int32):
            np.testing.assert_array_equal(a, b, err_msg=f"field {name}")
        else:
            np.testing.assert_allclose(a, b, rtol=2e-6, atol=1e-6,
                                       err_msg=f"field {name}")


def test_pallas_matches_xla():
    st, mg = _random_state()
    ref = propagate.do_regularization(st, mg, CFG)
    got = reg_kernel.do_regularization_pallas(st, mg, CFG, interpret=True)
    _assert_states_match(ref, got)


def test_pallas_matches_with_occlusion_removal():
    st, mg = _random_state(seed=3)
    ref = propagate.do_regularization(st, mg, CFG, remove_occlusions=True)
    got = reg_kernel.do_regularization_pallas(st, mg, CFG,
                                              remove_occlusions=True,
                                              interpret=True)
    _assert_states_match(ref, got)


def test_config_dispatch():
    st, mg = _random_state(seed=5)
    cfg_on = CFG.replace(use_pallas_reg=True)
    ref = propagate.do_regularization(st, mg, CFG)
    got = propagate.do_regularization(st, mg, cfg_on)
    _assert_states_match(ref, got)
