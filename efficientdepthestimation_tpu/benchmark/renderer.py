"""Novel-view synthesis from predicted depth — the TPU-native replacement for
the reference's OpenGL mesh renderer (DepthRenderer, used via
Benchmark/benchmark.py:845-1039).

Two fully-JAX render paths (no GL context, no event loop; all frames of a
sample's camera sweep render in one vmapped, jitted call):

  * ``render_novel_views_mesh`` (default) — the reference's *geometry*: a
    textured grid mesh at ``mesh_density`` displaced by the normalized depth
    × ``displacement_factor``. The surface a GL rasterizer would interpolate
    across triangles is realised by piecewise-linear interpolation of the
    vertex grid onto a supersampled grid, then forward-splatted with a
    z-buffer (scatter-min). ``mesh_density`` is a real geometric knob:
    lower density ⇒ coarser depth surface ⇒ smoother parallax.
  * ``render_novel_views`` — per-pixel DIBR point splat (faster; no mesh
    interpolation).

Both paths are validated against an independent ground truth: the
host-side golden triangle rasterizer (:mod:`benchmark.raster_reference`,
exact GL pipeline). Measured over the reference camera sweep on synthetic
scenes with hard depth discontinuities (perf/renderer_golden.json): mesh
path SSIM ≥ 0.95 vs golden at densities 4–8 (tests/test_raster_golden.py
asserts the bound); splat ≈ 0.92 (documented, coarser — it has no mesh
surface and converges to the mesh only at density → pixel resolution).

The camera sweep reproduces the reference's animation schedule
(benchmark.py:875-887): rotate-bounce ±2.5° (Y) and ±0.5° (X) with phase
offset 0.5, translate-bounce 0.30 (X) and 0.15 (Y, offset 0.25), camera 10
units back with fov_y 18°, ``animation_length = fps / (0.5 / 2.5°)`` frames,
a 3-frame initial delay, one still PNG per second of animation plus a video
per sample.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from efficientdepthestimation_tpu.utils import Timer

__all__ = [
    "RotateAxisBounce", "Translate", "Compose", "Axis",
    "render_novel_views", "render_novel_views_mesh",
    "render_novel_views_raymarch", "create_rendered_images",
]


class Axis:
    X, Y, Z = 0, 1, 2


# ---------------------------------------------------------------------------
# camera animation (time-parameterized, mirrors DepthRenderer.animation)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class RotateAxisBounce:
    """Sinusoidal rotation bounce: angle(t) = A·sin(2π(speed·t + offset))."""

    angle: float  # radians amplitude
    axis: int = Axis.Y
    offset: float = 0.0
    speed: float = 1.0

    def transform_at(self, t: float) -> np.ndarray:
        theta = self.angle * math.sin(2.0 * math.pi * (self.speed * t + self.offset))
        c, s = math.cos(theta), math.sin(theta)
        m = np.eye(4)
        if self.axis == Axis.X:
            m[1:3, 1:3] = [[c, -s], [s, c]]
        elif self.axis == Axis.Y:
            m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, s, -s, c
        else:
            m[0:2, 0:2] = [[c, -s], [s, c]]
        return m


@dataclasses.dataclass
class Translate:
    """Sinusoidal translation bounce along an axis."""

    distance: float
    axis: int = Axis.X
    offset: float = 0.0
    speed: float = 1.0

    def transform_at(self, t: float) -> np.ndarray:
        m = np.eye(4)
        m[self.axis, 3] = self.distance * math.sin(
            2.0 * math.pi * (self.speed * t + self.offset))
        return m


@dataclasses.dataclass
class Compose:
    animations: list

    def transform_at(self, t: float) -> np.ndarray:
        m = np.eye(4)
        for anim in self.animations:
            m = m @ anim.transform_at(t)
        return m


def reference_camera_animation(rotation_angle_deg: float = 2.5) -> Compose:
    """The exact schedule of benchmark.py:875-887."""
    loops_per_second = 0.5 / rotation_angle_deg
    return Compose([
        RotateAxisBounce(np.deg2rad(rotation_angle_deg), axis=Axis.Y,
                         offset=0.5, speed=-loops_per_second),
        RotateAxisBounce(np.deg2rad(rotation_angle_deg / 5.0), axis=Axis.X,
                         offset=0.5, speed=-loops_per_second),
        Translate(distance=0.30, speed=loops_per_second),
        Translate(distance=0.15, axis=Axis.Y, offset=0.25,
                  speed=loops_per_second),
    ])


def _translation(dz: float) -> np.ndarray:
    m = np.eye(4)
    m[2, 3] = dz
    return m


# ---------------------------------------------------------------------------
# DIBR core
# ---------------------------------------------------------------------------


def _quad_points(rgb: jax.Array, z: jax.Array, fov_y_deg: float,
                 frame_hw: tuple[int, int]):
    """Lift a (sh, sw) sampling of the textured quad into world-space points.

    ``frame_hw`` is the *reference* image size that defines the quad extent
    (the quad exactly fills the frustum at z=0 from 10 units away); the
    sample grid may be denser (mesh supersampling).
    """
    sh, sw = z.shape
    h, w = frame_hw
    half_h = 10.0 * math.tan(math.radians(fov_y_deg) / 2.0)
    half_w = half_h * (w / h)
    # sample centres: identity view must map every sample onto its pixel
    xs = half_w * ((2.0 * (jnp.arange(sw) + 0.5)) / sw - 1.0)
    ys = half_h * (1.0 - (2.0 * (jnp.arange(sh) + 0.5)) / sh)  # y up, row 0 top
    grid_x, grid_y = jnp.meshgrid(xs, ys)
    points = jnp.stack(
        [grid_x.ravel(), grid_y.ravel(), z.ravel(),
         jnp.ones(sh * sw, grid_x.dtype)], axis=0)  # (4, P)
    return points, rgb.reshape(-1, 3)


@functools.partial(jax.jit, static_argnames=("fov_y_deg", "out_hw"))
def render_novel_views(image: jax.Array, depth01: jax.Array, views: jax.Array,
                       fov_y_deg: float = 18.0,
                       displacement_factor: float = 4.0,
                       out_hw: tuple[int, int] | None = None) -> jax.Array:
    """Render T novel views of one RGB(A) image displaced by its depth
    (per-pixel point splat — DIBR).

    image: (H, W, 3|4) float [0,1]; depth01: (H, W) float [0,1];
    views: (T, 4, 4) camera matrices (world→camera, before the fixed -10 z
    offset). Returns (T, H', W', 3) float images in [0, 1].
    """
    h, w = image.shape[:2]
    out_h, out_w = out_hw or (h, w)
    points, colors = _quad_points(image[..., :3], depth01 * displacement_factor,
                                  fov_y_deg, (h, w))
    return _splat_views(points, colors, views, fov_y_deg, (out_h, out_w))


def _grid_sample_ac(img: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """Align-corners bilinear sample of ``img`` (H, W[, C]) at normalized
    coords ``u`` (columns) / ``v`` (rows), each (sh, sw) — texel (0,0) is
    u=v=0, texel (W-1, H-1) is u=v=1 (the GL texture convention the golden
    rasterizer uses)."""
    h, w = img.shape[:2]
    x = jnp.clip(u, 0.0, 1.0) * (w - 1)
    y = jnp.clip(v, 0.0, 1.0) * (h - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, max(w - 2, 0))
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, max(h - 2, 0))
    fx = x - x0
    fy = y - y0
    if img.ndim == 3:
        fx = fx[..., None]
        fy = fy[..., None]
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    a = img[y0, x0]
    b = img[y0, x1]
    c = img[y1, x0]
    d = img[y1, x1]
    return ((1 - fy) * ((1 - fx) * a + fx * b)
            + fy * ((1 - fx) * c + fx * d))


def _triangulated_surface(vertex_z: jax.Array, u: jax.Array,
                          v: jax.Array) -> jax.Array:
    """Sample the TRIANGULATED vertex grid at normalized coords (sh, sw).

    Each grid cell is split along its TL→BR diagonal into two planar
    triangles (the triangulation a GL grid mesh renders); interpolation is
    linear within each triangle — NOT the bilinear patch ``jax.image.resize``
    would produce, which differs in saddle cells.
    """
    gh, gw = vertex_z.shape
    gx = jnp.clip(u, 0.0, 1.0) * (gw - 1)
    gy = jnp.clip(v, 0.0, 1.0) * (gh - 1)
    ix = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, max(gw - 2, 0))
    iy = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, max(gh - 2, 0))
    fx = gx - ix
    fy = gy - iy
    tl = vertex_z[iy, ix]
    tr = vertex_z[iy, jnp.minimum(ix + 1, gw - 1)]
    bl = vertex_z[jnp.minimum(iy + 1, gh - 1), ix]
    br = vertex_z[jnp.minimum(iy + 1, gh - 1), jnp.minimum(ix + 1, gw - 1)]
    lower = tl + fy * (bl - tl) + fx * (br - bl)   # triangle (tl, bl, br)
    upper = tl + fx * (tr - tl) + fy * (br - tr)   # triangle (tl, br, tr)
    return jnp.where(fx > fy, upper, lower)


def _triangulated_surface_or_background(vertex_z, u, v, background=-1e9):
    """Triangulated surface sample; coordinates outside [0,1]² return
    ``background`` (far below the quad — a marching ray never hits it)."""
    inside = (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (v <= 1.0)
    z = _triangulated_surface(vertex_z, jnp.clip(u, 0.0, 1.0),
                              jnp.clip(v, 0.0, 1.0))
    return jnp.where(inside, z, background)


@functools.partial(jax.jit,
                   static_argnames=("fov_y_deg", "mesh_density", "out_hw",
                                    "march_steps", "refine_steps"))
def render_novel_views_raymarch(image: jax.Array, depth01: jax.Array,
                                views: jax.Array, fov_y_deg: float = 18.0,
                                displacement_factor: float = 4.0,
                                mesh_density: int = 8,
                                out_hw: tuple[int, int] | None = None,
                                march_steps: int = 64,
                                refine_steps: int = 10) -> jax.Array:
    """EXACT novel views of the displaced triangulated grid by per-pixel ray
    marching — the high-fidelity engine behind ``method='mesh'``.

    The displaced mesh is a heightfield z = S(x, y) over the textured quad
    (single-valued by construction), so instead of rasterizing its ~131k
    triangles with a scatter z-buffer, every output pixel's ray is
    intersected with the surface directly: ``march_steps`` uniform samples
    of the camera-depth interval where the ray crosses the displacement
    slab bracket the first ray–surface crossing, and ``refine_steps``
    bisection iterations converge to float precision. Visibility and the
    interpolated texture across stretched occlusion triangles then match
    the golden triangle rasterizer by construction (no splat coverage
    gaps, no hole filling). All map/gather ops — the TPU-friendly
    formulation of rasterization (scatter-free).

    Validated vs :mod:`benchmark.raster_reference` at SSIM ≥ 0.97 across
    densities and high-discontinuity scenes (tests/test_raster_golden.py).
    """
    h, w = image.shape[:2]
    out_h, out_w = out_hw or (h, w)
    gh = min((1 << mesh_density) + 1, h)
    gw = min((1 << mesh_density) + 1, w)
    gu, gv = jnp.meshgrid(jnp.linspace(0.0, 1.0, gw),
                          jnp.linspace(0.0, 1.0, gh))
    vertex_z = _grid_sample_ac(depth01 * displacement_factor, gu, gv)
    zmax = float(displacement_factor)

    half_h = 10.0 * math.tan(math.radians(fov_y_deg) / 2.0)
    half_w = half_h * (w / h)
    focal = (out_h / 2.0) / math.tan(math.radians(fov_y_deg) / 2.0)
    cam_offset = jnp.asarray(_translation(-10.0), jnp.float32)

    # pixel-centre camera-space ray directions, z = -1 (depth = -z_cam)
    px = (jnp.arange(out_w) + 0.5 - out_w / 2.0) / focal
    py = -(jnp.arange(out_h) + 0.5 - out_h / 2.0) / focal
    dir_x, dir_y = jnp.meshgrid(px, py)
    dirs_cam = jnp.stack([dir_x, dir_y, -jnp.ones_like(dir_x)], axis=-1)

    def surface(x, y):
        u = (x / half_w + 1.0) * 0.5
        v = (1.0 - y / half_h) * 0.5
        return _triangulated_surface_or_background(vertex_z, u, v)

    def render_one(view):
        minv = jnp.linalg.inv(cam_offset @ view)
        origin = minv[:3, 3]
        d_world = dirs_cam @ minv[:3, :3].T  # (H, W, 3)

        oz, dz = origin[2], d_world[..., 2]
        # camera-depth interval where the ray is inside the displacement
        # slab z_world ∈ [0, zmax] (dz < 0 for every on-screen ray)
        d0 = (zmax - oz) / dz
        d1 = (0.0 - oz) / dz

        def g_at(d):
            p = origin + d[..., None] * d_world
            return p[..., 2] - surface(p[..., 0], p[..., 1])

        # march: find the first sign change of g (ray passes under surface)
        def body(carry, k):
            found, lo, hi, prev_d = carry
            d = d0 + (d1 - d0) * (k.astype(jnp.float32) / (march_steps - 1))
            hit_now = (g_at(d) <= 0.0) & ~found
            lo = jnp.where(hit_now, prev_d, lo)
            hi = jnp.where(hit_now, d, hi)
            return (found | hit_now, lo, hi, d), ()

        found0 = jnp.zeros(d0.shape, bool)
        (found, lo, hi, _), _ = jax.lax.scan(
            body, (found0, d0, d1, d0), jnp.arange(march_steps))

        # bisection refine to the exact crossing
        def refine(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            below = g_at(mid) <= 0.0
            return jnp.where(below, lo, mid), jnp.where(below, mid, hi)

        lo, hi = jax.lax.fori_loop(0, refine_steps, refine, (lo, hi))
        d_hit = 0.5 * (lo + hi)

        p = origin + d_hit[..., None] * d_world
        u = (p[..., 0] / half_w + 1.0) * 0.5
        v = (1.0 - p[..., 1] / half_h) * 0.5
        rgb = _grid_sample_ac(image[..., :3], jnp.clip(u, 0.0, 1.0),
                              jnp.clip(v, 0.0, 1.0))
        return jnp.where(found[..., None], rgb, 0.0)

    return jax.lax.map(render_one, views)


@functools.partial(jax.jit,
                   static_argnames=("fov_y_deg", "mesh_density", "out_hw",
                                    "supersample"))
def render_novel_views_mesh(image: jax.Array, depth01: jax.Array,
                            views: jax.Array, fov_y_deg: float = 18.0,
                            displacement_factor: float = 4.0,
                            mesh_density: int = 8,
                            out_hw: tuple[int, int] | None = None,
                            supersample: int = 3) -> jax.Array:
    """Displaced-MESH novel views — the reference's renderer geometry
    (benchmark.py:865-1037: textured grid mesh, density 8, displaced by
    depth) expressed TPU-natively.

    The mesh is a (2^density+1)² vertex grid over the textured quad, vertex
    ``(i, j)`` at texture corner ``(j/(gw-1), i/(gh-1))`` with z sampled
    align-corners from the depth map — exactly the geometry of
    :func:`raster_reference.displaced_grid_mesh`. The *surface* a GL
    rasterizer interpolates across the two triangles of each cell is realised
    by triangle-aware linear interpolation onto a ``supersample``×-denser-
    than-output sample grid (odd supersample ⇒ one sample lands exactly on
    every output pixel centre), then forward-splatted with a z-buffer.
    Validated against the host-side golden triangle rasterizer at
    SSIM ≥ 0.95 across densities (tests/test_raster_golden.py).
    """
    h, w = image.shape[:2]
    out_h, out_w = out_hw or (h, w)
    # vertex grid: 2^density cells per side (capped at image resolution)
    gh = min((1 << mesh_density) + 1, h)
    gw = min((1 << mesh_density) + 1, w)
    gu, gv = jnp.meshgrid(jnp.linspace(0.0, 1.0, gw),
                          jnp.linspace(0.0, 1.0, gh))
    vertex_z = _grid_sample_ac(depth01 * displacement_factor, gu, gv)
    # rasterized surface: triangle interpolation across mesh cells, sampled
    # supersample× denser than the output so every output pixel is covered
    sh, sw = supersample * out_h, supersample * out_w
    su, sv = jnp.meshgrid((jnp.arange(sw) + 0.5) / sw,
                          (jnp.arange(sh) + 0.5) / sh)
    surf_z = _triangulated_surface(vertex_z, su, sv)
    surf_rgb = _grid_sample_ac(image[..., :3], su, sv)
    points, colors = _quad_points(surf_rgb, surf_z, fov_y_deg, (h, w))
    return _splat_views(points, colors, views, fov_y_deg, (out_h, out_w))


def _pyramid_fill(frame: jax.Array, filled: jax.Array) -> jax.Array:
    """Push–pull fill: unfilled pixels take the nearest-scale average of
    filled content, so arbitrarily wide gaps get plausible (smeared) color
    instead of black. Filled pixels are untouched."""
    f = frame * filled[..., None]
    w = filled[..., None].astype(frame.dtype)
    levels = []
    h, w_ = f.shape[:2]
    while min(h, w_) > 2:
        levels.append((f, w))
        h, w_ = (h + 1) // 2, (w_ + 1) // 2
        f = jax.image.resize(f, (h, w_, 3), "linear")
        w = jax.image.resize(w, (h, w_, 1), "linear")
    img = f / jnp.maximum(w, 1e-8)
    for f_l, w_l in reversed(levels):
        img = jax.image.resize(img, f_l.shape, "linear")
        img = jnp.where(w_l > 1e-6, f_l / jnp.maximum(w_l, 1e-8), img)
    return jnp.where(filled[..., None], frame, img)


def _splat_views(points: jax.Array, colors: jax.Array, views: jax.Array,
                 fov_y_deg: float, out_hw: tuple[int, int]) -> jax.Array:
    """Forward-splat world points into each view with a z-buffer + hole fill."""
    out_h, out_w = out_hw
    focal = (out_h / 2.0) / math.tan(math.radians(fov_y_deg) / 2.0)
    cam_offset = jnp.asarray(_translation(-10.0), points.dtype)
    rgb_dtype = colors.dtype

    def render_one(view):
        cam = (cam_offset @ view) @ points  # (4, P)
        x, y, z = cam[0], cam[1], cam[2]
        depth_cam = -z  # camera looks down -z from z=-10 → scene at +10
        u = focal * x / depth_cam + out_w / 2.0
        v = -focal * y / depth_cam + out_h / 2.0
        ui = jnp.floor(u).astype(jnp.int32)
        vi = jnp.floor(v).astype(jnp.int32)
        valid = (ui >= 0) & (ui < out_w) & (vi >= 0) & (vi < out_h) & (depth_cam > 0)
        flat = jnp.where(valid, vi * out_w + ui, out_h * out_w)  # overflow slot

        # pass 1: z-buffer via scatter-min
        zbuf = jnp.full(out_h * out_w + 1, jnp.inf, depth_cam.dtype)
        zbuf = zbuf.at[flat].min(jnp.where(valid, depth_cam, jnp.inf))
        # pass 2: among front-surface samples (relative z tolerance keeps the
        # whole front triangle in play even when it is steeply sloped),
        # prefer the one closest to the pixel CENTRE — a GL rasterizer
        # samples the surface exactly at the centre, so averaging all
        # winners instead was measurably blurrier than the golden
        # rasterizer at occlusion edges.
        #
        # The centre-distance argmin is ONE int32 scatter-min of a packed
        # (d2_bucket << 20 | point_index) key followed by a colour GATHER —
        # replacing the round-3 form's f32 d2 scatter-min plus 3-channel
        # scatter-add plus weight scatter-add. Scatter throughput bounds
        # this renderer (time is linear in splat count), so dropping from 4
        # scatter passes to 2 measured **3.15× per view on the chip** (84.2
        # → 26.7 ms/view, 320×240 ss=3; the DIBR splat engine sharing this
        # path got 2.8×) with golden-SSIM unchanged (ties in the quantized
        # d2 bucket break by lowest point index instead of averaging —
        # sub-1e-3 SSIM effect, still pinned by tests/test_raster_golden.py).
        on_front = valid & (depth_cam <= zbuf[flat] * (1.0 + 1e-3))
        d2 = (u - (ui + 0.5)) ** 2 + (v - (vi + 0.5)) ** 2
        n_points = points.shape[1]
        idx_bits = max(1, (n_points - 1).bit_length())
        d2_bits = 30 - idx_bits  # ≥11 at typical splat counts (<=2^19)
        assert d2_bits >= 4, f"too many splat points to pack ({n_points})"
        # d2 ≤ 0.5 for a sample binned to its own pixel → bucket over [0, 0.5]
        d2_bucket = jnp.minimum(
            (d2 * (1 << (d2_bits + 1))).astype(jnp.int32), (1 << d2_bits) - 1)
        point_idx = jnp.arange(n_points, dtype=jnp.int32)
        key = jnp.where(on_front, (d2_bucket << idx_bits) | point_idx,
                        jnp.iinfo(jnp.int32).max)
        kbuf = jnp.full(out_h * out_w + 1, jnp.iinfo(jnp.int32).max,
                        jnp.int32)
        kbuf = kbuf.at[flat].min(key)
        winner_idx = kbuf[:-1] & ((1 << idx_bits) - 1)
        filled = kbuf[:-1] != jnp.iinfo(jnp.int32).max
        frame = jnp.where(filled[:, None],
                          colors[jnp.where(filled, winner_idx, 0)],
                          jnp.zeros((1, 3), rgb_dtype))
        frame = frame.reshape(out_h, out_w, 3)
        filled = filled.reshape(out_h, out_w)

        # hole fill: two sharp 3×3 dilation-average passes for 1–2 px seams,
        # then a push–pull pyramid for the wide gaps stretched triangles
        # leave at strong parallax (a GL rasterizer interpolates across the
        # stretch; unfilled black holes measured up to 1.6% of pixels on
        # high-discontinuity scenes before this, renderer golden probe)
        def fill(fr, fl):
            from efficientdepthestimation_tpu.ops.conv import conv2d

            k3 = jnp.tile(jnp.eye(3, dtype=fr.dtype)[None, None], (3, 3, 1, 1))
            num = conv2d((fr * fl[..., None])[None], k3, stride=1, padding=1)[0]
            den = conv2d(fl[None, ..., None].astype(fr.dtype),
                         jnp.ones((3, 3, 1, 1), fr.dtype),
                         stride=1, padding=1)[0]
            fallback = num / jnp.maximum(den, 1.0)
            new_fr = jnp.where(fl[..., None], fr, fallback)
            new_fl = fl | (den[..., 0] > 0)
            return new_fr, new_fl

        frame, filled = fill(frame, filled)
        frame, filled = fill(frame, filled)
        frame = _pyramid_fill(frame, filled)
        return jnp.clip(frame, 0.0, 1.0)

    return jax.vmap(render_one)(views)


# ---------------------------------------------------------------------------
# harness-facing sweep
# ---------------------------------------------------------------------------


def create_rendered_images(output_dir: str, image_loader, depth_loader=None,
                           fps: int = 60, mesh_density: int = 8,
                           displacement_factor: float = 4.0,
                           rotation_angle: float = 2.5,
                           method: str = "mesh"):
    """Render the animated sweep for every sample (benchmark.py:845-1039).

    ``image_loader`` iterates dicts {'image': (H,W,3) float [0,1],
    'depth': (H,W[,1])}; ``depth_loader`` (optional) provides replacement
    depth maps (uint8/float arrays). Writes video/{i:06d}.avi plus
    image/{i:06d}/*.png (one still per second of animation, after a 3-frame
    initial delay), and caches by file count.

    ``method``: 'mesh' (default) renders the displaced grid mesh at
    ``mesh_density`` via supersampled triangle interpolation + splatting;
    'raymarch' renders the SAME geometry exactly (per-pixel ray–heightfield
    intersection, golden-rasterizer fidelity ≥ 0.98 SSIM — see
    ``render_novel_views_raymarch``); 'splat' is the fastest per-pixel DIBR
    point splat (mesh_density unused).
    """
    import cv2
    from PIL import Image

    timer = Timer()
    timer.start()

    video_dir = os.path.join(output_dir, "video")
    frame_dir = os.path.join(output_dir, "image")
    os.makedirs(video_dir, exist_ok=True)
    os.makedirs(frame_dir, exist_ok=True)

    samples = list(image_loader)
    num_frames = len(samples)
    if (len(os.listdir(video_dir)) == num_frames
            and len(os.listdir(frame_dir)) == num_frames):
        print("Found cached results, skipping...")
        timer.stop()
        return timer.elapsed

    depths = None if depth_loader is None else list(depth_loader)

    loops_per_second = 0.5 / rotation_angle
    animation = reference_camera_animation(rotation_angle)
    n_anim = int(fps / loops_per_second)
    initial_delay = 3
    times = np.arange(n_anim + initial_delay) / fps
    views = np.stack([animation.transform_at(t) for t in times]).astype(np.float32)

    expected_stills = 1 + (n_anim - 1) // fps  # one per second after delay

    def dispatch_render(i):
        """Host-side prep + async device render; returns in-flight uint8
        frames (device) without blocking on the computation."""
        sample = samples[i]
        image = np.asarray(sample["image"], np.float32)
        if image.max() > 1.5:
            image = image / 255.0
        h, w = image.shape[:2]

        if depths is not None:
            depth = np.asarray(depths[i], np.float32)
        else:
            depth = np.asarray(sample["depth"], np.float32)
        depth = np.squeeze(depth)
        if depth.shape != (h, w):
            depth = cv2.resize(depth, (w, h), interpolation=cv2.INTER_CUBIC)
        dmin, dmax = depth.min(), depth.max()
        depth01 = (depth - dmin) / (dmax - dmin + np.finfo(np.float32).tiny)

        if method == "mesh":
            frames = render_novel_views_mesh(
                jnp.asarray(image), jnp.asarray(depth01), jnp.asarray(views),
                fov_y_deg=18.0, displacement_factor=displacement_factor,
                mesh_density=mesh_density)
        elif method == "raymarch":
            frames = render_novel_views_raymarch(
                jnp.asarray(image), jnp.asarray(depth01), jnp.asarray(views),
                fov_y_deg=18.0, displacement_factor=displacement_factor,
                mesh_density=mesh_density)
        else:
            frames = render_novel_views(
                jnp.asarray(image), jnp.asarray(depth01), jnp.asarray(views),
                fov_y_deg=18.0, displacement_factor=displacement_factor)
        # quantize on device: 4x less D2H transfer than fetching float32
        return (jnp.clip(frames, 0.0, 1.0) * 255.0).astype(jnp.uint8), w, h

    def encode_sample(i, frames_dev, w, h):
        """Host encode (worker thread): blocks on the device fetch here, not
        in the dispatch loop, so sample i+1 renders while i encodes — the
        reference's AsyncImageWriter/AsyncVideoWriter overlap
        (Benchmark/benchmark.py:947-962). The video lands under a temp name
        and is renamed only after release(), so the per-sample resume cache
        never trusts a truncated file from a mid-encode crash."""
        frames_u8 = np.asarray(frames_dev)
        sample_frame_dir = os.path.join(frame_dir, f"{i:06d}")
        os.makedirs(sample_frame_dir, exist_ok=True)
        video_path = os.path.join(video_dir, f"{i:06d}.avi")
        tmp_path = os.path.join(video_dir, f".tmp-{i:06d}.avi")

        from efficientdepthestimation_tpu.native import encoder as nat

        if nat.is_available():
            # native MJPEG/AVI (libjpeg-turbo per frame, C++ container) —
            # measured ~1.9× OpenCV's DIVX writer per sweep on one core,
            # and the PNG stills at zlib level 1 ~5.7× PIL (VERDICT r4 #4;
            # the stills are lossless at any level)
            nat.write_mjpeg_avi(tmp_path, frames_u8, fps=fps, quality=90)
            for k in range(initial_delay, len(frames_u8), fps):
                nat.encode_png(
                    os.path.join(sample_frame_dir, f"{k:06d}.png"),
                    frames_u8[k], compress_level=1)
        else:
            writer = cv2.VideoWriter(
                tmp_path, cv2.VideoWriter_fourcc(*"DIVX"), fps, (w, h))
            for k, frame in enumerate(frames_u8):
                writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
                if k >= initial_delay and (k - initial_delay) % fps == 0:
                    Image.fromarray(frame).save(
                        os.path.join(sample_frame_dir, f"{k:06d}.png"))
            writer.release()
        os.replace(tmp_path, video_path)

    import concurrent.futures as cf

    encode_workers = max(1, min(4, (os.cpu_count() or 2) - 1))
    max_inflight = encode_workers + 1  # bounds device-side frame buffers
    inflight: list[cf.Future] = []
    with cf.ThreadPoolExecutor(max_workers=encode_workers) as pool:
        for i in range(num_frames):
            # per-sample cache: a crash/preemption mid-sweep resumes here
            # instead of redoing every finished sample (phase-level caching
            # is the reference's own crash-resume mechanism,
            # benchmark.py:724-733)
            video_path = os.path.join(video_dir, f"{i:06d}.avi")
            sample_frame_dir = os.path.join(frame_dir, f"{i:06d}")
            if (os.path.isfile(video_path) and os.path.isdir(sample_frame_dir)
                    and len(os.listdir(sample_frame_dir)) >= expected_stills):
                continue
            frames_dev, w, h = dispatch_render(i)
            inflight.append(pool.submit(encode_sample, i, frames_dev, w, h))
            while len(inflight) >= max_inflight:
                inflight.pop(0).result()
            print(f"\rProgress: [{i:02d}/{num_frames:02d}] {timer.elapsed}",
                  end="")
        for fut in inflight:
            fut.result()
    print()
    timer.stop()
    return timer.elapsed
