"""Visualize an optimization run's progress directory.

TPU-framework equivalent of the reference's MATLAB viewer
(transient_rendering_python/optimization/visualize_optim.m and
collect_progress_results.m): loss curves over iterations plus the final
reconstructed surface, written as PNGs (headless matplotlib).

Usage:  python scripts/visualize_optim.py <progress_dir> [out_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from nlos_surface_optimization_tpu.io.progress import collect_progress


def main():
    progress_dir = sys.argv[1] if len(sys.argv) > 1 else "progress"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else progress_dir
    os.makedirs(out_dir, exist_ok=True)
    p = collect_progress(progress_dir)
    if p["iteration"].size == 0:
        print(f"no checkpoints found in {progress_dir}")
        return

    fig, axes = plt.subplots(1, 3, figsize=(14, 4))
    axes[0].plot(p["iteration"], p["l2"], label="L2 (weighted)")
    axes[0].plot(p["iteration"], p["l2_original"], label="L2 (raw)")
    axes[0].set_yscale("log")
    axes[0].set_xlabel("iteration")
    axes[0].set_title("loss")
    axes[0].legend()
    axes[1].plot(p["iteration"], p["num_faces"])
    axes[1].set_xlabel("iteration")
    axes[1].set_title("face count")
    axes[2].plot(p["iteration"], p["num_vertices"])
    axes[2].set_xlabel("iteration")
    axes[2].set_title("vertex count")
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "progress_curves.png"), dpi=120)
    print("wrote", os.path.join(out_dir, "progress_curves.png"))

    if "final_v" in p:
        v, f = p["final_v"], p["final_f"].astype(int)
        fig = plt.figure(figsize=(6, 6))
        ax = fig.add_subplot(111, projection="3d")
        ax.plot_trisurf(v[:, 0], v[:, 1], v[:, 2], triangles=f,
                        cmap="viridis", linewidth=0.1)
        ax.set_title(f"final mesh ({f.shape[0]} faces)")
        fig.savefig(os.path.join(out_dir, "final_mesh.png"), dpi=120)
        print("wrote", os.path.join(out_dir, "final_mesh.png"))


if __name__ == "__main__":
    main()
