"""Ray-path visualization: draw the selected pixel's bounce path.

The debug capability of the reference's VisualizeRaysCS.hlsl (ray-marched
cylinders over the image, bounce count -> color; records appended in
RayGenCommon.h:600-630, cap 1024). Here the recorded per-bounce segments
(collected by the wavefront for the selected lane) are projected through
the camera and rasterized as 2D lines host-side — a debug path, so numpy
is fine.
"""

from __future__ import annotations

import numpy as np

# bounce index -> color ramp (blue -> green -> yellow -> red)
_BOUNCE_COLORS = np.array(
    [
        [0.2, 0.4, 1.0],
        [0.2, 1.0, 0.6],
        [0.6, 1.0, 0.2],
        [1.0, 0.9, 0.1],
        [1.0, 0.5, 0.1],
        [1.0, 0.1, 0.1],
    ],
    np.float32,
)


def project_point(cam, width, height, p):
    """World point -> pixel coords through the thin-lens camera (the
    inverse of trace/camera.py's generate_primary_rays mapping)."""
    pos = np.asarray(cam["position"])
    forward = np.asarray(cam["look_at"]) - pos
    forward = forward / np.linalg.norm(forward)
    right = np.asarray(cam["right"])
    up = np.asarray(cam["up"])
    lens_h = float(cam["lens_height"])
    focal = pos - float(cam["focal_distance"]) * forward

    ray = p - focal
    denom = np.dot(ray, forward)
    if abs(denom) < 1e-9:
        return None
    t = np.dot(pos - focal, forward) / denom
    if t < 0:
        return None
    lens_pt = focal + ray * t
    off = lens_pt - pos
    aspect = width / height
    u = np.dot(off, right) / (lens_h * aspect / 2.0)
    v = np.dot(off, up) / (lens_h / 2.0)
    x = (u + 1.0) / 2.0 * width
    y = (1.0 - (v + 1.0) / 2.0) * height
    return x, y


def draw_line(img, x0, y0, x1, y1, color, alpha=0.85):
    """Simple DDA line rasterization into (H, W, 3) float image."""
    H, W = img.shape[:2]
    n = int(max(abs(x1 - x0), abs(y1 - y0), 1)) * 2
    ts = np.linspace(0.0, 1.0, n)
    xs = np.clip((x0 + (x1 - x0) * ts).astype(int), 0, W - 1)
    ys = np.clip((y0 + (y1 - y0) * ts).astype(int), 0, H - 1)
    img[ys, xs] = img[ys, xs] * (1 - alpha) + np.asarray(color) * alpha
    return img


def overlay_ray_path(img, viz_rays, cam, width, height):
    """Draw recorded bounce segments onto a display image.

    viz_rays: (max_bounces, 8) rows [origin(3), hit(3), t, valid].
    """
    img = np.array(img, np.float32, copy=True)
    viz = np.asarray(viz_rays)
    for i, row in enumerate(viz):
        if row[7] <= 0.0:
            continue
        a = project_point(cam, width, height, row[0:3])
        b = project_point(cam, width, height, row[3:6])
        if a is None or b is None:
            continue
        color = _BOUNCE_COLORS[min(i, len(_BOUNCE_COLORS) - 1)]
        draw_line(img, a[0], a[1], b[0], b[1], color)
    return img
