#!/usr/bin/env python
"""Generate synthetic stand-in SRTM .hgt tiles for regions whose real tiles
are absent from the snapshot (the reference repo also lacks the blobs —
its `.MISSING_LARGE_BLOBS`; see real_world_datasets.py:267-292 for the
region table). Terrain is a deterministic sum of smooth ridges + valley
noise shaped to each region's plausible elevation band, written as
big-endian int16 in the 3-arc-second 1201^2 format (also exercising the
size-sniffing branch of read_hgt_file) with a few -32768 voids so the
cleaning path is driven.

Usage: python scripts/make_synthetic_tiles.py [outdir]
"""

import os
import sys

import numpy as np

TILES = {
    # tile: (seed, base elevation m, relief m, void fraction)
    "N43W080": (43, 120.0, 350.0, 0.001),   # great_lakes: low rolling
    "N45W123": (45, 150.0, 1100.0, 0.002),  # oregon_coast: coast range
}


def synth(seed: int, base: float, relief: float, n: int = 1201) -> np.ndarray:
    rng = np.random.RandomState(seed)
    y, x = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n), indexing="ij")
    z = np.zeros((n, n))
    for k in range(1, 7):  # smooth multi-scale ridges
        ax, ay = rng.uniform(0, 2 * np.pi, 2)
        fx, fy = rng.uniform(1.5, 4.0, 2) * k
        z += (relief / (2.0 * k)) * np.sin(2 * np.pi * fx * x + ax) * np.cos(
            2 * np.pi * fy * y + ay)
    z += relief * 0.15 * rng.randn(n, n).cumsum(0).cumsum(1) / n  # fBm-ish drift
    z = base + (z - z.min()) * relief / max(np.ptp(z), 1e-9)
    return z


def main(outdir: str = "srtm_data"):
    os.makedirs(outdir, exist_ok=True)
    for tile, (seed, base, relief, void_frac) in TILES.items():
        z = synth(seed, base, relief)
        rng = np.random.RandomState(seed + 1000)
        voids = rng.rand(*z.shape) < void_frac
        arr = np.round(z).astype(np.int16)
        arr[voids] = np.int16(-32768)
        path = os.path.join(outdir, f"{tile}.hgt")
        arr.astype(">i2").tofile(path)
        print(f"{path}: {os.path.getsize(path)} bytes, "
              f"elev [{arr[~voids].min()}, {arr[~voids].max()}] m, "
              f"{voids.sum()} voids")


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["srtm_data"]))
