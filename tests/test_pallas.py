"""Pallas kernel parity vs the reference JAX implementations (interpret mode
on CPU; compiled on TPU)."""
import numpy as np
import pytest

import jax

from cdnet_tpu.ops import ddm


class TestDDMKernel:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_reference_impl(self, seed):
        from jax.experimental.pallas import tpu as pltpu
        from cdnet_tpu.ops.pallas_kernels import generate_dd_maps_pallas
        rng = np.random.RandomState(seed)
        labs = rng.randint(0, 9, size=(3, 32, 32)).astype(np.int32)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(generate_dd_maps_pallas(labs, 9))
        want = np.stack([np.asarray(ddm.generate_dd_map(l, 9)) for l in labs])
        np.testing.assert_allclose(got, want, atol=1e-5)

    @pytest.mark.slow
    def test_tiled_path_matches_reference_impl(self):
        """Maps > 512^2 take the row-tiled halo path (VERDICT item 9);
        non-multiple dims exercise the row/lane padding."""
        from jax.experimental.pallas import tpu as pltpu
        from cdnet_tpu.ops.pallas_kernels import (_VMEM_SAFE_PIXELS,
                                                  generate_dd_maps_pallas)
        rng = np.random.RandomState(2)
        labs = rng.randint(0, 9, size=(2, 530, 516)).astype(np.int32)
        assert labs.shape[1] * labs.shape[2] > _VMEM_SAFE_PIXELS
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(generate_dd_maps_pallas(labs, 9))
        want = np.stack([np.asarray(ddm.generate_dd_map(l, 9)) for l in labs])
        np.testing.assert_allclose(got, want, atol=1e-5)
