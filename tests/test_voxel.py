import jax
import jax.numpy as jnp
import numpy as np

from coxgraph_tpu.core import voxel as vx

SPEC = vx.VoxelGridSpec(voxel_size=0.1, voxels_per_side=8, grid_dim=16,
                        max_blocks=64, truncation=0.3)


def test_point_voxel_block_roundtrip():
    p = jnp.array([[0.25, -0.31, 1.05]])
    v = vx.point_to_voxel(SPEC, p)
    np.testing.assert_array_equal(np.asarray(v), [[2, -4, 10]])
    b, l = vx.voxel_to_block(SPEC, v)
    np.testing.assert_array_equal(np.asarray(b), [[0, -1, 1]])
    np.testing.assert_array_equal(np.asarray(l), [[2, 4, 2]])


def test_allocate_and_lookup():
    layer = vx.create_tsdf_layer(SPEC)
    coords = jnp.array([[0, 0, 0], [1, 2, 3], [0, 0, 0], [-1, -2, -3]])
    layer = vx.allocate_blocks(SPEC, layer, coords)
    assert int(layer.num_blocks) == 3
    idx = vx.lookup_block(SPEC, layer, coords)
    idx = np.asarray(idx)
    assert (idx >= 0).all()
    assert idx[0] == idx[2]  # duplicate coordinate → same slot
    # unallocated lookup
    missing = vx.lookup_block(SPEC, layer, jnp.array([[5, 5, 5]]))
    assert int(missing[0]) == -1
    # block_coords recorded correctly
    for i, c in enumerate(coords):
        slot = int(idx[i])
        np.testing.assert_array_equal(np.asarray(layer.block_coords[slot]), np.asarray(c))


def test_allocate_idempotent():
    layer = vx.create_tsdf_layer(SPEC)
    coords = jnp.array([[0, 0, 0], [1, 1, 1]])
    layer = vx.allocate_blocks(SPEC, layer, coords)
    layer2 = vx.allocate_blocks(SPEC, layer, coords)
    assert int(layer2.num_blocks) == int(layer.num_blocks) == 2
    np.testing.assert_array_equal(
        np.asarray(layer.block_index), np.asarray(layer2.block_index)
    )


def test_allocate_mask_and_out_of_range():
    layer = vx.create_tsdf_layer(SPEC)
    coords = jnp.array([[0, 0, 0], [100, 0, 0], [1, 1, 1]])
    mask = jnp.array([True, True, False])
    layer = vx.allocate_blocks(SPEC, layer, coords, mask)
    assert int(layer.num_blocks) == 1  # out-of-range + masked dropped


def test_pool_capacity_saturates():
    spec = vx.VoxelGridSpec(voxel_size=0.1, voxels_per_side=8, grid_dim=16,
                            max_blocks=4, truncation=0.3)
    layer = vx.create_tsdf_layer(spec)
    coords = jnp.stack(
        [jnp.arange(8), jnp.zeros(8, jnp.int32), jnp.zeros(8, jnp.int32)], axis=-1
    )
    layer = vx.allocate_blocks(spec, layer, coords)
    assert int(layer.num_blocks) == 4


def test_trilinear_sampling_constant_field():
    layer = vx.create_tsdf_layer(SPEC)
    coords = jnp.array([[0, 0, 0]])
    layer = vx.allocate_blocks(SPEC, layer, coords)
    # fill block 0 with sdf=0.05, weight=1
    import dataclasses

    layer = dataclasses.replace(
        layer,
        sdf=layer.sdf.at[0].set(0.05),
        weight=layer.weight.at[0].set(1.0),
    )
    # sample strictly inside block interior (voxel centers at 0.05+0.1k)
    p = jnp.array([[0.33, 0.41, 0.27]])
    s, w, ok = vx.sample_tsdf_trilinear(SPEC, layer, p)
    assert bool(ok[0])
    np.testing.assert_allclose(float(s[0]), 0.05, atol=1e-6)
    np.testing.assert_allclose(float(w[0]), 1.0, atol=1e-6)
    # outside any allocated block → invalid
    s2, w2, ok2 = vx.sample_tsdf_trilinear(SPEC, layer, jnp.array([[3.0, 3.0, 3.0]]))
    assert not bool(ok2[0])


def test_trilinear_linear_field():
    """A linear SDF field must be reproduced exactly by trilinear interp."""
    import dataclasses

    layer = vx.create_tsdf_layer(SPEC)
    coords = jnp.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
                        [1, 1, 0], [1, 0, 1], [0, 1, 1], [1, 1, 1]])
    layer = vx.allocate_blocks(SPEC, layer, coords)

    # sdf(p) = 0.2*x - 0.1*y + 0.05*z at each voxel center
    def fill(slot, bc):
        centers = vx.voxel_centers_of_block(SPEC, jnp.asarray(bc))
        vals = 0.2 * centers[..., 0] - 0.1 * centers[..., 1] + 0.05 * centers[..., 2]
        return vals.reshape(-1)   # flat pool row

    sdf = layer.sdf
    for i in range(8):
        sdf = sdf.at[i].set(fill(i, layer.block_coords[i]))
    layer = dataclasses.replace(layer, sdf=sdf, weight=layer.weight.at[:8].set(1.0))

    p = jnp.array([[0.4, 0.6, 0.9], [1.0, 1.0, 1.0], [0.77, 0.12, 1.31]])
    s, _, ok = vx.sample_tsdf_trilinear(SPEC, layer, p)
    expected = 0.2 * p[:, 0] - 0.1 * p[:, 1] + 0.05 * p[:, 2]
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(np.asarray(s), np.asarray(expected), atol=1e-5)

    g, gok = vx.sample_tsdf_gradient(SPEC, layer, jnp.array([[0.7, 0.7, 0.7]]))
    assert bool(gok[0])
    np.testing.assert_allclose(np.asarray(g[0]), [0.2, -0.1, 0.05], atol=1e-4)


def test_allocation_jits_with_donation():
    layer = vx.create_tsdf_layer(SPEC)
    coords = jnp.array([[0, 0, 0], [1, 2, 3]])

    @jax.jit
    def step(layer, coords):
        return vx.allocate_blocks(SPEC, layer, coords)

    out = step(layer, coords)
    assert int(out.num_blocks) == 2
