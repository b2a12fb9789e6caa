"""Isosurface mesh extraction (eval/mesh.py) — parity with the reference's
mcubes export (tsdf.py:520-528): correct surface, closed, outward winding."""

import numpy as np

from eogs2_tpu.eval.mesh import export_obj, marching_tetrahedra


def _sphere_sdf(n=33, r=10.0):
    ax = np.arange(n) - (n - 1) / 2.0
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    return np.sqrt(x * x + y * y + z * z) - r, (n - 1) / 2.0


def test_sphere_surface_accuracy():
    vol, c = _sphere_sdf()
    verts, faces = marching_tetrahedra(vol, 0.0)
    assert len(faces) > 100
    d = np.linalg.norm(verts - c, axis=1)
    # every vertex within half a voxel of the true sphere
    assert np.abs(d - 10.0).max() < 0.5


def test_sphere_mesh_is_closed_and_outward():
    vol, c = _sphere_sdf(25, 8.0)
    verts, faces = marching_tetrahedra(vol, 0.0)
    # closed 2-manifold: every undirected edge is shared by exactly 2 faces
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    e = np.sort(e, axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    assert (counts == 2).all()
    # outward winding: face normal agrees with the radial direction
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    n = np.cross(v1 - v0, v2 - v0)
    rad = (v0 + v1 + v2) / 3.0 - c
    assert (np.einsum("fd,fd->f", n, rad) > 0).mean() > 0.99


def test_axes_mapping_and_obj_roundtrip(tmp_path):
    vol, _ = _sphere_sdf(17, 5.0)
    axes = [np.linspace(-4.0, 4.0, 17)] * 3
    verts, faces = marching_tetrahedra(vol, 0.0, axes=axes)
    d = np.linalg.norm(verts, axis=1)
    # r=5 in index units = 2.5 in world units (0.5 spacing)
    assert np.abs(d - 2.5).max() < 0.3
    p = tmp_path / "m.obj"
    export_obj(str(p), verts, faces)
    lines = p.read_text().splitlines()
    nv = sum(1 for ln in lines if ln.startswith("v "))
    nf = sum(1 for ln in lines if ln.startswith("f "))
    assert nv == len(verts) and nf == len(faces)
    fidx = np.array(
        [[int(t) for t in ln.split()[1:]] for ln in lines if ln.startswith("f ")]
    )
    assert fidx.min() >= 1 and fidx.max() <= nv


def test_tsdf_volume_extract_mesh():
    from eogs2_tpu.eval.tsdf import TSDFVolume

    vb = np.array([[-8.0, 8.0], [-8.0, 8.0], [-8.0, 8.0]])
    vol = TSDFVolume(vb, 1.0, 4.0)
    # carve a sphere into the tsdf field directly
    d = np.linalg.norm(np.asarray(vol.world_coords), axis=1).reshape(vol.shape)
    vol.tsdf = (d - 5.0).astype(np.float32)
    verts, faces = vol.extract_mesh()
    assert len(faces) > 50
    r = np.linalg.norm(verts, axis=1)
    assert np.abs(r - 5.0).max() < 1.0


def test_empty_volume():
    verts, faces = marching_tetrahedra(np.ones((8, 8, 8)), 0.0)
    assert len(verts) == 0 and len(faces) == 0
