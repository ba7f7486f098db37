"""Convert a config-5 soak accumulator npz into a display PNG.

Host-only (numpy + the repo's PNG writer): tonemaps the weighted sums
the soak saved (bench_logs/config5/solo_acc.npz) into
docs/procedural10k_1080p.png — the config-5 beauty artifact.

Usage: python scripts/soak_to_png.py [in.npz] [out.png]
"""

import sys

import numpy as np

from smallpt_tpu.utils import image as img_io


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else \
        "bench_logs/config5/solo_acc.npz"
    dst = sys.argv[2] if len(sys.argv) > 2 else \
        "docs/procedural10k_1080p.png"
    data = np.load(src)
    rad, w = data["rad"], data["w"]
    img = rad / np.maximum(w[..., None], 1)
    img_io.write_png(dst, img)
    print(f"{dst}: {img.shape[1]}x{img.shape[0]}, "
          f"spp min/max {w.min():.0f}/{w.max():.0f}, "
          f"mean {img.mean():.4f}")


if __name__ == "__main__":
    main()
