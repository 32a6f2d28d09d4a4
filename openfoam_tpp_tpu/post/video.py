"""Video rendering of the free surface (host-side).

Parity with `generate_video` (/root/reference/main.py:612-725) minus its
pyvista dependency and its documented `plotter` NameError bug: frames are
rendered with matplotlib from the on-device column-height surface and
encoded to MP4 (imageio/ffmpeg) or left as PNG frames when no encoder is
available.
"""

from __future__ import annotations

import os

import numpy as np


def _have(mod: str) -> bool:
    try:
        __import__(mod)
        return True
    except ImportError:
        return False


def generate_video(case_dir: str, fps: int = 30, fname: str = "animation.mp4") -> bool:
    if not _have("matplotlib"):
        print("  ❌ matplotlib not available — cannot render video")
        return False
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from openfoam_tpp_tpu.manager.cases import load_case_params
    from openfoam_tpp_tpu.manager.runner import (
        _case_shape_hint,
        build_case_geometry,
        iterate_snapshots,
    )
    from openfoam_tpp_tpu.post.interface import column_masks, liquid_height

    params = load_case_params(case_dir)
    geom = build_case_geometry(params, _case_shape_hint(case_dir))
    wet, z_floor, _ = column_masks(geom)
    x, y, _ = geom.cell_centers()

    out_dir = os.path.join(case_dir, "postProcessing", "video")
    os.makedirs(out_dir, exist_ok=True)

    frames = []
    snaps = list(iterate_snapshots(case_dir))
    if not snaps:
        print("  ❌ No checkpoints to render — run the case first")
        return False
    print(f"  🎬 Rendering {len(snaps)} frames...")

    # Frame the waterline band (works for both model families: cylinder
    # tanks fill to H/2, the 6DoF box to z=0 mid-tank).
    z_lo, z_hi = geom.origin[2], geom.H
    z_fill = params["H"] / 2.0 if "H" in params else 0.0
    zmin = z_fill - 0.2 * (z_hi - z_lo)
    zmax = z_fill + 0.2 * (z_hi - z_lo)
    for t, alpha in snaps:
        eta = np.asarray(liquid_height(np.asarray(alpha), geom, z_floor))
        eta = np.where(wet, eta, np.nan)
        fig = plt.figure(figsize=(6, 5), dpi=110)
        ax = fig.add_subplot(111, projection="3d")
        X, Y = np.meshgrid(x, y, indexing="ij")
        ax.plot_surface(X, Y, eta, cmap="viridis", vmin=zmin, vmax=zmax,
                        linewidth=0, antialiased=False)
        ax.set_zlim(zmin, zmax)
        ax.set_title(f"t = {t:.2f} s")
        ax.set_xlabel("x [m]")
        ax.set_ylabel("y [m]")
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[:, :, :3]
        frames.append(buf.copy())
        plt.close(fig)

    out_path = os.path.join(out_dir, fname)
    ok = False
    if _have("imageio"):
        import imageio

        try:
            imageio.mimsave(out_path, frames, fps=fps)
            print(f"  ✅ Video saved: {out_path}")
            ok = True
        except Exception as e:  # no ffmpeg plugin — fall back to PNGs
            print(f"  ⚠ mp4 encode failed ({e}); writing PNG frames")
    if not ok:
        import matplotlib.pyplot as plt

        for i, fr in enumerate(frames):
            plt.imsave(os.path.join(out_dir, f"frame_{i:04d}.png"), fr)
        print(f"  ✅ Frames saved under: {out_dir}")

    # Reference parity: the video action chains a potential-flow dashboard
    # animation for orbital cylinder cases (main.py:700-723).
    if "H" in params and "R" in params:
        try:
            from openfoam_tpp_tpu.utils.potential_flow import (
                generate_dashboard_animation,
            )

            dash, _ = generate_dashboard_animation(
                os.path.join(out_dir, "dashboard.mp4"),
                R=params["D"] / 2.0, a=params["R"], freq=params["freq"],
                d=params["H"] / 2.0,
            )
            print(f"  ✅ Dashboard animation: {dash}")
        except Exception as e:
            print(f"  ⚠ dashboard animation failed: {e}")
    return True
