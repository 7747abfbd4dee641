"""Pallas kernels vs XLA references (interpret mode on CPU).

On real TPU hardware the same comparisons run with compiled kernels
(tests are exact in interpret mode; on-device exp() ulp differences can
flip near-tie argmin picks, which is within the reference's own
tolerance envelope).
"""

import jax
import jax.numpy as jnp
import numpy as np

from sparenet_tpu.ops.mds import minimum_density_sample
from sparenet_tpu.ops.pallas.mds_pallas import mds_pallas
from sparenet_tpu.ops.expansion_penalty import _mst_parents_xla
from sparenet_tpu.ops.pallas.expansion_pallas import mst_parents_pallas


def test_mds_pallas_matches_xla(rng):
    x = jnp.asarray(rng.rand(3, 700, 3) - 0.5, jnp.float32)
    mml = jnp.asarray([0.05, 0.1, 0.2], jnp.float32)
    i_ref = np.asarray(minimum_density_sample(x, 96, mml, impl="xla"))
    i_pal = np.asarray(mds_pallas(x, 96, mml, interpret=True))
    np.testing.assert_array_equal(i_pal, i_ref)


def test_mds_pallas_heavy_weighting(rng):
    # cross the 8192 double-weight boundary (MDS_cuda.cu:130)
    x = jnp.asarray(rng.rand(1, 8400, 3) - 0.5, jnp.float32)
    mml = jnp.asarray([0.1], jnp.float32)
    i_ref = np.asarray(minimum_density_sample(x, 32, mml, impl="xla"))
    i_pal = np.asarray(mds_pallas(x, 32, mml, interpret=True))
    np.testing.assert_array_equal(i_pal, i_ref)


def test_mst_pallas_matches_xla(rng):
    x = jnp.asarray(rng.rand(8, 64, 3), jnp.float32)
    p_ref, c_ref = _mst_parents_xla(x)
    p_pal, c_pal = mst_parents_pallas(x, 64, interpret=True)
    np.testing.assert_array_equal(np.asarray(p_pal), np.asarray(p_ref))
    np.testing.assert_allclose(np.asarray(c_pal), np.asarray(c_ref), atol=1e-6)


def test_charge_tree_dp_matches_round_simulation(rng):
    """The closed-form tree-DP charge assignment must equal the
    reference's round-parallel leaf-pruning semantics exactly."""
    from sparenet_tpu.ops.expansion_penalty import _prune_edges
    from sparenet_tpu.ops.pallas.expansion_pallas import expansion_pallas

    for bp, s in ((8, 32), (2, 200)):
        x = jnp.asarray(rng.rand(bp, s, 3), jnp.float32)
        p_pal, c_pal, charged_pal = expansion_pallas(x, s, interpret=True)
        p_ref, c_ref = _mst_parents_xla(x)
        charged_ref = _prune_edges(p_ref, c_ref, s)
        np.testing.assert_array_equal(
            np.asarray(charged_pal)[:, 1:], np.asarray(charged_ref))
