"""Block ray ordering (core.order): tiles cover compact pixel blocks.

Contract: BIT-EXACT output vs scan order — the permutation only changes
which rays share a hardware tile (performance), never any ray's math, and
the output is inverse-permuted back to scan order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import raymarching_tpu as rt
from raymarching_tpu.api import render_tables
from raymarching_tpu.core.order import block_permutation, resolve_ray_order


class TestPermutation:
    @pytest.mark.parametrize("H,W,S,tile", [
        (512, 512, 4, 2048),     # bench config: 16x32-pixel blocks
        (768, 1024, 9, 2048),    # reference config: ragged blocks
        (36, 64, 1, 1024),
        (50, 60, 9, 2048),       # nothing divides anything
    ])
    def test_perm_inv_are_inverse(self, H, W, S, tile):
        out = block_permutation(H, W, S, tile)
        assert out is not None
        perm, inv = out
        R = H * W * S
        assert perm.shape == inv.shape == (R,)
        assert perm.dtype == np.int32
        np.testing.assert_array_equal(perm[inv], np.arange(R))
        np.testing.assert_array_equal(np.sort(perm), np.arange(R))

    def test_tiny_frame_declines(self):
        assert block_permutation(8, 8, 1, 2048) is None

    def test_blocks_are_compact(self):
        """Consecutive tile_rays samples must span a small bounding box,
        not a full image row."""
        H = W = 512
        S, tile = 4, 2048
        perm, _ = block_permutation(H, W, S, tile)
        first = perm[:tile]
        ys = (first // S) // W
        xs = (first // S) % W
        # scan order would span the full 512-wide row; blocks stay local
        assert (ys.max() - ys.min() + 1) * (xs.max() - xs.min() + 1) \
            <= 2 * tile // S

    def test_resolve_modes(self):
        cfg = rt.RenderConfig()
        assert resolve_ray_order(cfg.replace(ray_order="scan"), "mega") \
            is False
        assert resolve_ray_order(cfg.replace(ray_order="block"), "jnp") \
            is True
        assert resolve_ray_order(cfg.replace(ray_order="auto"), "mega") \
            is True
        assert resolve_ray_order(cfg.replace(ray_order="auto"), "jnp") \
            is False
        with pytest.raises(ValueError):
            resolve_ray_order(cfg.replace(ray_order="zigzag"), "mega")


@pytest.fixture(scope="module")
def demo():
    return rt.compile_scene(rt.load_scene("scenes/demo.txt"))


CFG = rt.RenderConfig(width=64, height=36, ssaa=1, iterations=200,
                      tile_sublanes=8)


class TestBitExactness:
    def test_mega_block_equals_scan(self, demo):
        plan, tables = demo
        a = np.asarray(render_tables(plan, tables,
                                     CFG.replace(ray_order="scan"),
                                     backend="mega", interpret=True))
        b = np.asarray(render_tables(plan, tables,
                                     CFG.replace(ray_order="block"),
                                     backend="mega", interpret=True))
        np.testing.assert_array_equal(a, b)

    def test_mega_block_chunked_equals_scan(self, demo):
        plan, tables = demo
        a = np.asarray(render_tables(
            plan, tables, CFG.replace(ray_order="scan", ray_chunk=1024),
            backend="mega", interpret=True))
        b = np.asarray(render_tables(
            plan, tables, CFG.replace(ray_order="block", ray_chunk=1024),
            backend="mega", interpret=True))
        np.testing.assert_array_equal(a, b)

    @pytest.mark.slow
    def test_gradients_match_scan(self, demo):
        plan, tables = demo

        def loss(t, order):
            img = render_tables(plan, t, CFG.replace(ray_order=order),
                                backend="mega", interpret=True)
            return jnp.mean(img)

        ga = jax.grad(loss)(tables, "scan")
        gb = jax.grad(loss)(tables, "block")
        # NOT bit-exact: table cotangents reduce over rays, and the
        # permutation changes the FP summation order — agreement to
        # reduction-order noise (measured ~4e-3 relative) is the contract.
        for a, b in zip(jax.tree_util.tree_leaves(ga),
                        jax.tree_util.tree_leaves(gb)):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(float(np.abs(a).max()), 1e-12)
            np.testing.assert_allclose(a, b, atol=1e-2 * scale, rtol=0)

    def test_jnp_dof_block_matches_scan(self, demo):
        plan, tables = demo
        cfg = CFG.replace(aperture=0.05, ssaa=2)
        a = np.asarray(render_tables(plan, tables,
                                     cfg.replace(ray_order="scan"),
                                     backend="jnp"))
        b = np.asarray(render_tables(plan, tables,
                                     cfg.replace(ray_order="block"),
                                     backend="jnp"))
        np.testing.assert_array_equal(a, b)
