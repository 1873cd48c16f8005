"""Differentiable soft rasterizer tests."""

import jax
import jax.numpy as jnp
import numpy as np

from poco_tpu.ops.soft_raster import (
    render_losses,
    soft_part_probs,
    soft_silhouette,
)
from poco_tpu.smpl.assets import synthetic_smpl_model


def _mesh(scale=0.5, shift=(0.0, 0.0)):
    smpl = synthetic_smpl_model(num_verts=128)
    v = np.asarray(smpl.v_template) * scale
    v[:, 0] += shift[0]
    v[:, 1] += shift[1]
    return smpl, jnp.asarray(v[None])


class TestSilhouette:
    def test_coverage_in_unit_range_and_nonzero(self):
        _, verts = _mesh()
        sil = soft_silhouette(verts, jnp.asarray([[1.0, 0.0, 0.0]]), 56)
        s = np.asarray(sil)
        assert s.shape == (1, 56, 56)
        assert 0.0 <= s.min() and s.max() <= 1.0
        assert s.max() > 0.9          # body pixels covered
        assert s[0, 0, 0] < 0.1       # corners empty

    def test_identical_meshes_minimal_loss(self):
        # Soft-IoU of identical soft masks is not exactly 0 (p^2 < 2p-p^2
        # for p in (0,1)); it must still be the minimum over perturbations.
        _, verts = _mesh()
        cam = jnp.asarray([[1.0, 0.0, 0.0]])
        loss = float(render_losses(verts, verts, cam))
        assert loss < 0.5
        _, shifted = _mesh(shift=(0.1, 0.0))
        assert loss < float(render_losses(shifted, verts, cam))

    def test_shifted_mesh_higher_loss(self):
        _, v0 = _mesh()
        _, v1 = _mesh(shift=(0.3, 0.0))
        _, v2 = _mesh(shift=(0.9, 0.0))
        cam = jnp.asarray([[1.0, 0.0, 0.0]])
        l1 = float(render_losses(v1, v0, cam))
        l2 = float(render_losses(v2, v0, cam))
        assert 0.0 < l1 < l2

    def test_gradients_flow_to_vertices(self):
        _, v0 = _mesh()
        _, v1 = _mesh(shift=(0.2, 0.1))
        cam = jnp.asarray([[1.0, 0.0, 0.0]])

        g = jax.grad(lambda v: render_losses(v, v0, cam))(v1)
        g = np.asarray(g)
        assert np.all(np.isfinite(g))
        assert np.abs(g).max() > 0  # non-degenerate gradient


class TestPartProbs:
    def test_probabilities_normalized(self):
        smpl, verts = _mesh()
        probs = soft_part_probs(
            verts, jnp.asarray([[1.0, 0.0, 0.0]]),
            jnp.asarray(smpl.lbs_weights), 56,
        )
        p = np.asarray(probs)
        assert p.shape == (1, 56, 56, 25)
        np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-4)
        # background dominates corners, parts dominate body center pixels
        assert p[0, 0, 0, 0] > 0.9
