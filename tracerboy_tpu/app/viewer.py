"""Interactive viewer: progressive preview with camera controls.

The analog of the reference's windowed app + ImGui panel (WinMain +
UIController): a matplotlib window showing the progressively refined
render with WASD/QE camera movement, arrow-key look, mode/AOV toggles and
click-to-inspect material editing (the SelectPixel round trip of
D3D12App.cpp:146-152/275-314). Falls back to a turntable PNG sequence
when no display is available (the 'P' capture path, D3D12App.cpp:341-364).

Usage:
  python -m tracerboy_tpu.app.viewer SCENE.pbrt [--size 320x240]
  python -m tracerboy_tpu.app.viewer SCENE.pbrt --turntable 12 --out-dir frames/
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def run_viewer(renderer, samples_per_frame: int = 1):
    import matplotlib

    try:
        matplotlib.use("TkAgg")
    except Exception:
        pass
    import matplotlib.pyplot as plt

    from tracerboy_tpu.utils.config import OutputType, RenderMode

    fig, ax = plt.subplots(figsize=(8, 6))
    fig.canvas.manager.set_window_title("tracerboy-tpu")
    im = ax.imshow(np.zeros((renderer.height, renderer.width, 3)))
    ax.set_axis_off()
    status = ax.set_title("rendering...")

    move = 0.25 * renderer.settings.camera_settings.movement_speed
    aov_cycle = [OutputType.LIT, OutputType.ALBEDO, OutputType.NORMAL,
                 OutputType.DEPTH, OutputType.VARIANCE, OutputType.HEATMAP]

    def on_key(event):
        k = event.key
        cam_moves = {
            "w": dict(forward=move), "s": dict(forward=-move),
            "a": dict(strafe=-move), "d": dict(strafe=move),
            "q": dict(upward=-move), "e": dict(upward=move),
            "left": dict(yaw=-0.1), "right": dict(yaw=0.1),
            "up": dict(pitch=-0.1), "down": dict(pitch=0.1),
        }
        if k in cam_moves:
            renderer.move_camera(**cam_moves[k])
        elif k == "m":
            mode = (RenderMode.REAL_TIME
                    if renderer.settings.render_mode == RenderMode.UNBIASED
                    else RenderMode.UNBIASED)
            renderer.update_settings(renderer.settings.replace(render_mode=mode))
        elif k == "o":
            cur = aov_cycle.index(renderer.settings.output_type) \
                if renderer.settings.output_type in aov_cycle else 0
            renderer.settings = renderer.settings.replace(
                output_type=aov_cycle[(cur + 1) % len(aov_cycle)]
            )
        elif k == "p":
            from tracerboy_tpu.core import image_io

            image_io.write_png(f"capture_{renderer.state.spp:05d}.png",
                               renderer.current_image())

    def on_click(event):
        if event.xdata is None:
            return
        info = renderer.select_pixel(int(event.xdata), int(event.ydata))
        if info:
            print(f"pixel ({int(event.xdata)}, {int(event.ydata)}): "
                  f"material {info['material_id']} depth {info['depth']:.3f} "
                  f"albedo {info['albedo']}")
            print(renderer.get_material(info["material_id"]))

    fig.canvas.mpl_connect("key_press_event", on_key)
    fig.canvas.mpl_connect("button_press_event", on_click)

    import time

    while plt.fignum_exists(fig.number):
        t0 = time.time()
        if renderer.settings.render_mode == RenderMode.REAL_TIME:
            img = renderer.render_realtime_frame_fused(as_numpy=True)
        else:
            renderer.render_sample(samples_per_frame)
            img = renderer.current_image()
        im.set_data(np.clip(img, 0, 1))
        dt = time.time() - t0
        status.set_text(
            f"{renderer.state.spp} spp | {1.0/max(dt,1e-6):.1f} fps | "
            f"conv {renderer.convergence_error():.4f} | "
            f"[wasdqe] move [arrows] look [m]ode [o]utput [p] capture"
        )
        fig.canvas.draw_idle()
        plt.pause(0.001)


def run_turntable(renderer, frames: int, out_dir: str, spp: int = 8):
    """Offscreen orbit animation (headless fallback)."""
    import os

    from tracerboy_tpu.core import image_io

    os.makedirs(out_dir, exist_ok=True)
    step = 2 * np.pi / frames
    for f in range(frames):
        renderer.render_sample(spp)
        image_io.write_png(
            os.path.join(out_dir, f"frame_{f:04d}.png"),
            renderer.current_image(),
        )
        # Orbit: move sideways proportional to radius, then look back.
        cam = renderer.compiled.camera
        radius = float(np.linalg.norm(cam.look_at - cam.position))
        renderer.move_camera(strafe=radius * step, yaw=step)
        print(f"turntable frame {f + 1}/{frames}", flush=True)


def main(argv=None):
    p = argparse.ArgumentParser(prog="tracerboy-tpu viewer")
    p.add_argument("scene")
    p.add_argument("--size", default="320x240")
    p.add_argument("--turntable", type=int, default=0,
                   help="render N orbit frames headless instead of a window")
    p.add_argument("--out-dir", default="turntable")
    p.add_argument("--spp", type=int, default=2,
                   help="samples per displayed frame")
    args = p.parse_args(argv)

    from tracerboy_tpu import Renderer

    w, h = (int(x) for x in args.size.lower().split("x"))
    r = Renderer(args.scene, film_size=(w, h))
    if args.turntable:
        run_turntable(r, args.turntable, args.out_dir, args.spp)
    else:
        run_viewer(r, args.spp)
    return 0


if __name__ == "__main__":
    sys.exit(main())
