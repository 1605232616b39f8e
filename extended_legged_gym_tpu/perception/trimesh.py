"""True triangle-mesh raycast + signed-distance queries on device.

TPU-native replacement for the Warp mesh kernels the reference uses:

- raycast: ``raycast_mesh_kernel`` (legged_gym/utils/ray_caster.py:45-92,
  ``wp.mesh_query_ray`` per CUDA thread against a BVH).
- SDF: ``query_sdf_kernel`` (legged_gym/utils/mesh_sdf.py:38-116,
  ``wp.mesh_query_point_sign_normal`` + barycentric closest-point eval).

A BVH is the wrong acceleration structure for a TPU (pointer chasing,
divergent traversal).  Terrain meshes are ground-dominated, so a **uniform XY
grid of padded per-cell triangle lists** built host-side maps the problem to
what the hardware does well: dense gathers + branch-free vector math.

- Raycast = fixed-count parametric march over the XY cells a ray crosses;
  at each step one gather fetches the cell's K candidate triangles and a
  vectorized Möller–Trumbore picks the nearest hit.  Cell lists are inflated
  by half the march step so corner-clipped cells cannot be missed; purely
  vertical rays degenerate to repeated tests of one cell's list (correct:
  lists are z-agnostic).
- SDF = gather of the 3×3 cell neighborhood's triangle lists + vectorized
  point-triangle closest-point; sign from the best-aligned face normal among
  near-minimal triangles (robust at convex/concave edges where the naive
  closest-face sign flips).  Exact within one cell size of the surface;
  beyond that callers blend in the heightfield far-field (perception/sdf.py),
  which is accurate exactly where the trimesh near-field isn't needed.

Everything is jit/vmap-compatible; the host-side bucketing is numpy.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class TriMeshData:
    """Grid-bucketed triangle mesh.

    Triangle t is (v0[t], v0[t]+e1[t], v0[t]+e2[t]); index T (one past the
    real triangles) is a far-away degenerate sentinel used for list padding.
    """

    v0: jnp.ndarray          # [T+1, 3]
    e1: jnp.ndarray          # [T+1, 3]
    e2: jnp.ndarray          # [T+1, 3]
    normal: jnp.ndarray      # [T+1, 3] unit face normals
    cell_tris: jnp.ndarray   # [nx*ny, K] per-cell lists (½-cell inflation)
    origin: jnp.ndarray      # [2] world xy of cell (0, 0) corner
    # static: the march step count must be a Python int at trace time
    cell_size: float = struct.field(pytree_node=False, default=0.5)
    nx: int = struct.field(pytree_node=False, default=1)
    ny: int = struct.field(pytree_node=False, default=1)

    @property
    def sdf_radius(self) -> float:
        """SDF queries are exact within one cell of the surface (3×3 gather)."""
        return self.cell_size


# ---------------------------------------------------------------------------
# host-side construction
# ---------------------------------------------------------------------------

def _bucket(tv: np.ndarray, origin, cell_size: float, nx: int, ny: int,
            inflate: float) -> np.ndarray:
    """Per-cell padded triangle-id lists: triangle t lands in every cell whose
    (inflated) square overlaps its XY AABB.  Returns [nx*ny, K] int32 padded
    with T (the sentinel id).  Vectorized over triangles (terrain meshes run
    to millions of triangles); the rare oversized triangle is looped."""
    T = tv.shape[0]
    xy_min = tv[..., :2].min(axis=1) - inflate
    xy_max = tv[..., :2].max(axis=1) + inflate
    i0 = np.clip(np.floor((xy_min[:, 0] - origin[0]) / cell_size), 0, nx - 1).astype(np.int64)
    i1 = np.clip(np.floor((xy_max[:, 0] - origin[0]) / cell_size), 0, nx - 1).astype(np.int64)
    j0 = np.clip(np.floor((xy_min[:, 1] - origin[1]) / cell_size), 0, ny - 1).astype(np.int64)
    j1 = np.clip(np.floor((xy_max[:, 1] - origin[1]) / cell_size), 0, ny - 1).astype(np.int64)
    si = i1 - i0 + 1
    sj = j1 - j0 + 1

    cells_of_tri = []
    tri_of_entry = []
    big = (si > 16) | (sj > 16)
    small = np.where(~big)[0]
    if small.size:
        for di in range(int(si[small].max())):
            for dj in range(int(sj[small].max())):
                sel = small[(di < si[small]) & (dj < sj[small])]
                if sel.size:
                    cells_of_tri.append((i0[sel] + di) * ny + (j0[sel] + dj))
                    tri_of_entry.append(sel)
    for t in np.where(big)[0]:
        ii = np.arange(i0[t], i1[t] + 1)
        jj = np.arange(j0[t], j1[t] + 1)
        cid = (ii[:, None] * ny + jj[None, :]).ravel()
        cells_of_tri.append(cid)
        tri_of_entry.append(np.full(cid.size, t, dtype=np.int64))
    cid = np.concatenate(cells_of_tri) if cells_of_tri else np.zeros(0, np.int64)
    tid = np.concatenate(tri_of_entry) if tri_of_entry else np.zeros(0, np.int64)

    counts = np.bincount(cid, minlength=nx * ny)
    K = int(counts.max()) if counts.size else 1
    K = max(1, -(-K // 8) * 8)  # pad to a multiple of 8 (sublane friendly)
    lists = np.full((nx * ny, K), T, dtype=np.int32)
    order = np.argsort(cid, kind="stable")
    cid, tid = cid[order], tid[order]
    slot = np.arange(cid.size) - np.concatenate([[0], np.cumsum(counts)[:-1]])[cid]
    lists[cid, slot] = tid
    return lists


def build_trimesh(vertices: np.ndarray, triangles: np.ndarray,
                  cell_size: Optional[float] = None,
                  max_cells: int = 1 << 20) -> TriMeshData:
    """Bucket a triangle mesh for device queries.

    cell_size defaults to ~2× the median triangle XY extent (keeps K small
    without exploding the march step count).  It also sets the exact-SDF
    radius (see TriMeshData.sdf_radius)."""
    vertices = np.asarray(vertices, dtype=np.float32)
    triangles = np.asarray(triangles, dtype=np.int64)
    tv = vertices[triangles]  # [T, 3, 3]
    if cell_size is None:
        ext = (tv[..., :2].max(axis=1) - tv[..., :2].min(axis=1)).max(axis=-1)
        cell_size = float(np.clip(2.0 * np.median(ext) if ext.size else 0.5,
                                  0.05, 2.0))
    vmin = vertices.min(axis=0)
    vmax = vertices.max(axis=0)
    nx = int(np.ceil((vmax[0] - vmin[0]) / cell_size)) + 1
    ny = int(np.ceil((vmax[1] - vmin[1]) / cell_size)) + 1
    while nx * ny > max_cells:
        cell_size *= 1.5
        nx = int(np.ceil((vmax[0] - vmin[0]) / cell_size)) + 1
        ny = int(np.ceil((vmax[1] - vmin[1]) / cell_size)) + 1
    origin = vmin[:2]

    cell_tris = _bucket(tv, origin, cell_size, nx, ny, inflate=0.5 * cell_size)

    v0 = tv[:, 0]
    e1 = tv[:, 1] - tv[:, 0]
    e2 = tv[:, 2] - tv[:, 0]
    n = np.cross(e1, e2)
    n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    # sentinel: far away, degenerate (never hit, never nearest)
    v0 = np.concatenate([v0, [[1e6, 1e6, 1e6]]], axis=0).astype(np.float32)
    e1 = np.concatenate([e1, [[0.0, 0.0, 0.0]]], axis=0).astype(np.float32)
    e2 = np.concatenate([e2, [[0.0, 0.0, 0.0]]], axis=0).astype(np.float32)
    n = np.concatenate([n, [[0.0, 0.0, 1.0]]], axis=0).astype(np.float32)

    # host numpy fields: the mesh is a closure constant of jitted queries;
    # numpy embeds into the HLO without a device->host readback (axon trap)
    return TriMeshData(
        v0=v0, e1=e1, e2=e2, normal=n,
        cell_tris=cell_tris,
        origin=np.asarray(origin, dtype=np.float32),
        cell_size=float(cell_size),
        nx=nx, ny=ny)


def trimesh_from_heightfield(ground: np.ndarray, hscale: float,
                             origin=(0.0, 0.0),
                             ceiling: Optional[np.ndarray] = None,
                             slope_threshold: Optional[float] = None,
                             **build_kw) -> TriMeshData:
    """Triangulate a (two-layer) heightfield into a true mesh with vertical
    wall faces, then bucket it (reference:
    terrain_confine.py:13-146 ``convert_2layer_heightfield_to_trimesh``
    slope-threshold wall correction; ceiling gets flipped winding).

    The wall correction snaps steep cell edges into true vertical quads so
    lateral SDF/raycast queries see walls instead of slopes.

    Open-sky ceiling cells (sentinel ≥ 1e5, e.g. between overhead barriers)
    are clamped to a finite roof a few meters above the highest real ceiling;
    triangulating the raw 1e6 sentinel would create kilometer-tall quads that
    destroy float32 precision in the intersection math.  The resulting fake
    roof sits above any confined-task sensor range."""
    layers = [(np.asarray(ground, np.float64), False)]
    if ceiling is not None and np.asarray(ceiling).min() < 1e5:
        c = np.asarray(ceiling, np.float64)
        finite_max = c[c < 1e5].max()
        roof = finite_max + 3.0
        layers.append((np.minimum(c, roof), True))

    all_v, all_f = [], []
    voff = 0
    for h, flip in layers:
        H, W = h.shape
        xs = origin[0] + np.arange(H) * hscale
        ys = origin[1] + np.arange(W) * hscale
        X, Y = np.meshgrid(xs, ys, indexing="ij")
        Xc, Yc = X.copy(), Y.copy()
        if slope_threshold is not None:
            # shift vertices of steep edges horizontally to verticalize walls
            # (same idea as isaacgym terrain_utils / terrain_confine.py:40-96)
            thr = slope_threshold * hscale
            dx = np.zeros_like(h)
            dy = np.zeros_like(h)
            dx[:-1] += (h[1:] - h[:-1] > thr)
            dx[1:] -= (h[:-1] - h[1:] > thr)
            dy[:, :-1] += (h[:, 1:] - h[:, :-1] > thr)
            dy[:, 1:] -= (h[:, :-1] - h[:, 1:] > thr)
            Xc += np.clip(dx, -1, 1) * hscale
            Yc += np.clip(dy, -1, 1) * hscale
        V = np.stack([Xc.ravel(), Yc.ravel(), h.ravel()], axis=-1)
        idx = np.arange(H * W).reshape(H, W)
        a = idx[:-1, :-1].ravel()
        b = idx[:-1, 1:].ravel()
        c = idx[1:, :-1].ravel()
        d = idx[1:, 1:].ravel()
        # winding sets the face normals, and the SDF sign convention
        # ("positive in free space", perception/sdf.py) depends on them:
        # ground normals must point UP (+z, into the air above), ceiling
        # normals DOWN (−z, into the tunnel below).  [r4 fix: both layers
        # were wound inverted, flipping the near-surface SDF sign on every
        # heightfield-derived mesh — exposed when physics contacts started
        # consuming this SDF]
        if flip:  # ceiling: wind downward-facing
            F = np.concatenate([np.stack([a, b, c], -1), np.stack([b, d, c], -1)])
        else:     # ground: wind upward-facing
            F = np.concatenate([np.stack([a, c, b], -1), np.stack([b, c, d], -1)])
        all_v.append(V)
        all_f.append(F + voff)
        voff += V.shape[0]

    verts = np.concatenate(all_v)
    faces = np.concatenate(all_f)
    build_kw.setdefault("cell_size", max(2.0 * hscale, 0.1))
    return build_trimesh(verts, faces, **build_kw)


# ---------------------------------------------------------------------------
# device queries
# ---------------------------------------------------------------------------

def _cell_id(mesh: TriMeshData, xy: jnp.ndarray) -> jnp.ndarray:
    gi = jnp.clip(jnp.floor((xy[..., 0] - mesh.origin[0]) / mesh.cell_size),
                  0, mesh.nx - 1).astype(jnp.int32)
    gj = jnp.clip(jnp.floor((xy[..., 1] - mesh.origin[1]) / mesh.cell_size),
                  0, mesh.ny - 1).astype(jnp.int32)
    return gi * mesh.ny + gj


def _moller_trumbore(v0, e1, e2, origin, direction):
    """Vectorized ray-triangle intersection → t (inf on miss).
    Broadcasts origin/direction [..., 3] against triangles [..., K, 3]."""
    pvec = jnp.cross(direction, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
    tvec = origin - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(direction * qvec, axis=-1) * inv
    t = jnp.sum(e2 * qvec, axis=-1) * inv
    eps = 1e-6
    ok = ((jnp.abs(det) > 1e-9) & (u >= -eps) & (v >= -eps)
          & (u + v <= 1.0 + eps) & (t > 1e-5))
    return jnp.where(ok, t, jnp.inf)


def raycast_trimesh(mesh: TriMeshData, origins: jnp.ndarray,
                    dirs: jnp.ndarray, max_distance: float):
    """March rays [..., 3] through grid cells; returns (distance, hit, points,
    normal).  Matches ``wp.mesh_query_ray`` semantics: nearest hit within
    max_distance, endpoint returned on miss."""
    shape = origins.shape[:-1]
    o = origins.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    R = o.shape[0]

    # per-ray parametric step: advance one cell in XY per iteration, but at
    # least max_distance/M so near-vertical rays terminate in M iterations too
    cs = mesh.cell_size
    M = min(int(np.ceil(float(max_distance) / cs)) + 2, 256)
    dxy = jnp.linalg.norm(d[..., :2], axis=-1)
    dt = jnp.where(dxy > 1e-6, cs / jnp.maximum(dxy, 1e-6), max_distance)
    dt = jnp.minimum(dt, max_distance)

    def step(carry, i):
        best_t, best_tri = carry
        t0 = i.astype(jnp.float32) * dt                     # [R]
        p = o + d * t0[:, None]
        ids = jnp.take(mesh.cell_tris, _cell_id(mesh, p[..., :2]), axis=0)  # [R, K]
        v0 = jnp.take(mesh.v0, ids, axis=0)
        e1 = jnp.take(mesh.e1, ids, axis=0)
        e2 = jnp.take(mesh.e2, ids, axis=0)
        t = _moller_trumbore(v0, e1, e2, o[:, None, :], d[:, None, :])  # [R, K]
        t = jnp.where(t <= max_distance, t, jnp.inf)
        k = jnp.argmin(t, axis=-1)
        tmin = jnp.take_along_axis(t, k[:, None], axis=-1)[:, 0]
        tri = jnp.take_along_axis(ids, k[:, None], axis=-1)[:, 0]
        upd = tmin < best_t
        return (jnp.where(upd, tmin, best_t),
                jnp.where(upd, tri, best_tri)), None

    init = (jnp.full((R,), jnp.inf), jnp.full((R,), mesh.v0.shape[0] - 1,
                                              dtype=jnp.int32))
    (best_t, best_tri), _ = jax.lax.scan(step, init, jnp.arange(M))

    hit = jnp.isfinite(best_t)
    dist = jnp.where(hit, best_t, max_distance)
    points = o + d * dist[:, None]
    normal = jnp.take(mesh.normal, best_tri, axis=0)
    normal = jnp.where(hit[:, None], normal, 0.0)
    return (dist.reshape(shape), hit.reshape(shape),
            points.reshape(shape + (3,)), normal.reshape(shape + (3,)))


def _closest_point_triangle(p, v0, e1, e2):
    """Closest point on triangle (v0, v0+e1, v0+e2) to p — the standard
    clamped-barycentric region walk (Ericson RTCD 5.1.5), branch-free.
    p [..., 3] broadcast against triangle arrays [..., K, 3]."""
    a = v0
    ab = e1
    ac = e2
    ap = p - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - (a + ab)
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp_ = p - (a + ac)
    d5 = jnp.sum(ab * cp_, -1)
    d6 = jnp.sum(ac * cp_, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = jnp.maximum(va + vb + vc, 1e-20)
    v = vb / denom
    w = vc / denom

    # face region barycentrics, then clamp through the 6 edge/vertex regions
    # vertex A
    v = jnp.where((d1 <= 0) & (d2 <= 0), 0.0, v)
    w = jnp.where((d1 <= 0) & (d2 <= 0), 0.0, w)
    # vertex B
    in_b = (d3 >= 0) & (d4 <= d3)
    v = jnp.where(in_b, 1.0, v)
    w = jnp.where(in_b, 0.0, w)
    # vertex C
    in_c = (d6 >= 0) & (d5 <= d6)
    v = jnp.where(in_c, 0.0, v)
    w = jnp.where(in_c, 1.0, w)
    # edge AB
    in_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    t_ab = d1 / jnp.where(jnp.abs(d1 - d3) > 1e-20, d1 - d3, 1e-20)
    v = jnp.where(in_ab, t_ab, v)
    w = jnp.where(in_ab, 0.0, w)
    # edge AC
    in_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    t_ac = d2 / jnp.where(jnp.abs(d2 - d6) > 1e-20, d2 - d6, 1e-20)
    v = jnp.where(in_ac, 0.0, v)
    w = jnp.where(in_ac, t_ac, w)
    # edge BC
    in_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)
    t_bc = (d4 - d3) / jnp.where(jnp.abs((d4 - d3) + (d5 - d6)) > 1e-20,
                                 (d4 - d3) + (d5 - d6), 1e-20)
    v = jnp.where(in_bc, 1.0 - t_bc, v)
    w = jnp.where(in_bc, t_bc, w)

    v = jnp.clip(v, 0.0, 1.0)
    w = jnp.clip(w, 0.0, 1.0)
    return a + ab * v[..., None] + ac * w[..., None]


def query_sdf_trimesh(mesh: TriMeshData, points: jnp.ndarray):
    """Signed distance + gradient + nearest point for query points [..., 3]
    (``wp.mesh_query_point_sign_normal`` semantics, mesh_sdf.py:38-116).

    Candidates come from the 3×3 cell neighborhood → exact within
    ``sdf_radius`` (= cell_size) of the surface; farther points return the
    clipped positive bound.  Sign = direction against the best-aligned face
    normal among near-minimal triangles — the angle-weighted-pseudonormal
    trick reduced to a vectorized argmax."""
    shape = points.shape[:-1]
    p = points.reshape(-1, 3)
    gi = jnp.clip(jnp.floor((p[:, 0] - mesh.origin[0]) / mesh.cell_size),
                  0, mesh.nx - 1).astype(jnp.int32)
    gj = jnp.clip(jnp.floor((p[:, 1] - mesh.origin[1]) / mesh.cell_size),
                  0, mesh.ny - 1).astype(jnp.int32)
    neighbors = []
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            ci = jnp.clip(gi + di, 0, mesh.nx - 1)
            cj = jnp.clip(gj + dj, 0, mesh.ny - 1)
            neighbors.append(jnp.take(mesh.cell_tris, ci * mesh.ny + cj, axis=0))
    ids = jnp.concatenate(neighbors, axis=-1)                 # [P, 9K]
    v0 = jnp.take(mesh.v0, ids, axis=0)
    e1 = jnp.take(mesh.e1, ids, axis=0)
    e2 = jnp.take(mesh.e2, ids, axis=0)
    n = jnp.take(mesh.normal, ids, axis=0)

    cp = _closest_point_triangle(p[:, None, :], v0, e1, e2)   # [P, Ks, 3]
    u = p[:, None, :] - cp
    d = jnp.linalg.norm(u, axis=-1)                           # [P, Ks]
    dmin = jnp.min(d, axis=-1)

    # among triangles within tol of the minimum, trust the one whose normal
    # is most aligned with (p - cp): robust sign at shared edges/vertices
    align = jnp.abs(jnp.sum(u * n, axis=-1)) / jnp.maximum(d, 1e-9)
    near = d <= dmin[:, None] + 1e-4
    score = jnp.where(near, align, -1.0)
    k = jnp.argmax(score, axis=-1)
    take = lambda x: jnp.take_along_axis(
        x, k[:, None, None] if x.ndim == 3 else k[:, None], axis=1)
    u_b = take(u)[:, 0]
    n_b = take(n)[:, 0]
    cp_b = take(cp)[:, 0]
    sgn = jnp.where(jnp.sum(u_b * n_b, axis=-1) >= 0.0, 1.0, -1.0)

    sdf = sgn * dmin
    grad = jnp.where(dmin[:, None] > 1e-6,
                     sgn[:, None] * u_b / jnp.maximum(dmin[:, None], 1e-9),
                     n_b)
    # beyond the bucketing radius the result is approximate (closer
    # triangles may live in unvisited cells): clamp the MAGNITUDE to the
    # radius but keep the sign — a point deep inside the mesh must stay
    # negative or physics contacts tunnel through floors (r4).  Cells with
    # no real triangle at all (sentinel-only lists, dmin ~1e6) clamp to the
    # positive bound: the sentinel's pseudo-sign is meaningless and a
    # negative value there would fake solid everywhere off-mesh.
    found = dmin < 1e5
    sdf = jnp.where(found, jnp.clip(sdf, -mesh.sdf_radius, mesh.sdf_radius),
                    mesh.sdf_radius)
    return (sdf.reshape(shape), grad.reshape(shape + (3,)),
            cp_b.reshape(shape + (3,)))
