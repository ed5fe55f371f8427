"""Displaced-mesh renderer tests (VERDICT round-1 item 6).

Certifies that ``mesh_density`` is a real geometric parameter and records the
measured mesh-vs-splat SSIM/PSNR delta bound over the reference camera sweep.
"""

import numpy as np

import jax.numpy as jnp

from efficientdepthestimation_tpu.benchmark.metrics import psnr, ssim
from efficientdepthestimation_tpu.benchmark.renderer import (
    reference_camera_animation,
    render_novel_views,
    render_novel_views_mesh,
)


def _sample(h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    # smooth-ish image + structured depth (slanted plane + a bump)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    image = np.stack([xx / w, yy / h, 0.5 + 0.3 * np.sin(xx / 5)], axis=-1)
    image += 0.05 * rng.standard_normal((h, w, 3)).astype(np.float32)
    image = np.clip(image, 0, 1).astype(np.float32)
    depth = 0.3 + 0.5 * (xx / w) + 0.2 * np.exp(
        -((xx - w / 2) ** 2 + (yy - h / 2) ** 2) / 100.0)
    depth01 = ((depth - depth.min()) / (depth.max() - depth.min())).astype(np.float32)
    return image, depth01


def _sweep_views(n=5):
    anim = reference_camera_animation()
    times = np.linspace(0.0, 2.0, n)
    return np.stack([anim.transform_at(t) for t in times]).astype(np.float32)


def test_mesh_identity_view_reproduces_image():
    # flat depth + identity view = the source image (displaced depth under an
    # identity view magnifies — points move toward the camera — so the
    # reproduction property only holds for zero displacement)
    image, depth01 = _sample()
    views = np.eye(4, dtype=np.float32)[None]
    frames = np.asarray(render_novel_views_mesh(
        jnp.asarray(image), jnp.asarray(depth01 * 0), jnp.asarray(views),
        mesh_density=8))
    assert frames.shape == (1, 48, 64, 3)
    s = float(ssim(jnp.asarray(frames), jnp.asarray(image[None])))
    assert s > 0.9, f"identity-view SSIM {s}"
    assert np.abs(frames[0] - image).mean() < 0.05


def test_mesh_density_is_a_real_parameter():
    """Different densities must produce different geometry under parallax —
    the reference's density-8 knob (benchmark.py:865-1037) is not dead here."""
    image, depth01 = _sample()
    views = _sweep_views(3)[1:]  # skip t=0 (identity-ish)
    coarse = np.asarray(render_novel_views_mesh(
        jnp.asarray(image), jnp.asarray(depth01), jnp.asarray(views),
        mesh_density=2))
    fine = np.asarray(render_novel_views_mesh(
        jnp.asarray(image), jnp.asarray(depth01), jnp.asarray(views),
        mesh_density=8))
    diff = np.abs(coarse - fine).max()
    assert diff > 1e-3, "mesh_density had no effect on the rendered views"
    # density beyond the image resolution saturates (grid is capped)
    finer = np.asarray(render_novel_views_mesh(
        jnp.asarray(image), jnp.asarray(depth01), jnp.asarray(views),
        mesh_density=10))
    np.testing.assert_allclose(finer, fine, atol=1e-6)


def test_mesh_vs_splat_delta_bound():
    """Sanity cross-check between the two fast paths. Since round 3 each is
    pinned independently against the GROUND-TRUTH triangle rasterizer
    (tests/test_raster_golden.py — the authoritative fidelity bound, mesh
    SSIM ≥ 0.95); mesh-vs-splat mutual agreement is looser by construction
    (the splat has no mesh surface) and only guards against gross
    divergence here."""
    image, depth01 = _sample()
    views = _sweep_views(5)
    mesh = np.asarray(render_novel_views_mesh(
        jnp.asarray(image), jnp.asarray(depth01), jnp.asarray(views),
        mesh_density=8))
    splat = np.asarray(render_novel_views(
        jnp.asarray(image), jnp.asarray(depth01), jnp.asarray(views)))
    s = float(ssim(jnp.asarray(mesh), jnp.asarray(splat)))
    p = float(psnr(jnp.asarray(jnp.clip(mesh, 0, 1)),
                   jnp.asarray(jnp.clip(splat, 0, 1))))
    print(f"mesh-vs-splat over reference sweep: SSIM={s:.4f} PSNR={p:.2f}dB")
    assert s >= 0.70, f"SSIM {s} below sanity bound"
    assert p >= 24.0, f"PSNR {p} below sanity bound"
