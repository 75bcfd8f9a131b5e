#!/usr/bin/env python
"""Generate synthetic stand-in SRTM .hgt tiles for all four reference regions.

The reference repo lacks the real tile blobs (`.MISSING_LARGE_BLOBS`; see
real_world_datasets.py:267-292 for the region table), so every region rides
a deterministic synthetic tile here. Terrain is a sum of smooth ridges +
valley noise shaped to each region's plausible elevation band (within the
per-region clamp limits of the loader), written as big-endian int16 in the
3-arc-second 1201^2 format (also exercising the size-sniffing branch of
``read_hgt_file``) with a few -32768 voids so the cleaning path is driven.

Usage: python scripts/make_synthetic_tiles.py [outdir]

Tests and the CLI demo self-provision via ``ensure_tiles``: only missing
tiles are generated (~0.5 s each), so a pre-populated ``srtm_data/`` —
e.g. with real 3601^2 1-arc-second tiles — is never overwritten.
"""

import os
import sys

import numpy as np

TILES = {
    # tile: (seed, base elevation m, relief m, void fraction)
    # bands sit inside the loader's per-region clamp limits
    # (real_world_datasets.py:447-464): maharashtra 0-2000, great_lakes
    # 75-600, oregon_coast 0-1500, washington_coast 0-3000.
    "N17E073": (17, 60.0, 1300.0, 0.002),   # maharashtra: Western Ghats scarp
    "N43W080": (43, 120.0, 350.0, 0.001),   # great_lakes: low rolling
    "N45W123": (45, 150.0, 1100.0, 0.002),  # oregon_coast: coast range
    "N47W124": (47, 5.0, 2200.0, 0.003),    # washington_coast: Olympics
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


def write_tile(tile: str, outdir: str) -> str:
    seed, base, relief, void_frac = TILES[tile]
    z = synth(seed, base, relief)
    rng = np.random.RandomState(seed + 1000)
    voids = rng.rand(*z.shape) < void_frac
    arr = np.round(z).astype(np.int16)
    arr[voids] = np.int16(-32768)
    path = os.path.join(outdir, f"{tile}.hgt")
    arr.astype(">i2").tofile(path)
    return path


def ensure_tiles(outdir: str = "srtm_data") -> None:
    """Generate any missing tiles into ``outdir`` (existing files are kept)."""
    os.makedirs(outdir, exist_ok=True)
    for tile in TILES:
        if not os.path.exists(os.path.join(outdir, f"{tile}.hgt")):
            write_tile(tile, outdir)


def main(outdir: str = "srtm_data"):
    os.makedirs(outdir, exist_ok=True)
    for tile in TILES:
        path = write_tile(tile, outdir)
        print(f"{path}: {os.path.getsize(path)} bytes")


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["srtm_data"]))
