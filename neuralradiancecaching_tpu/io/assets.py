"""Asset loading with fetch-or-synthesize fallbacks.

The reference's large assets are stripped from the repo
(/root/reference/.MISSING_LARGE_BLOBS lists data/cloud_sixteenth,
photostudio_4k.hdr and the MNIST image files). Per SURVEY.md §7 the loaders
here (a) parse the real files when present with the reference's exact layout
(ReadFileDensity3D raw fp32 x-major, read_file.cpp:50-78) and (b) otherwise
synthesize deterministic stand-ins with identical shapes: an fbm procedural
cloud, and MNIST digit images rendered from the (present) label files.
"""

from __future__ import annotations

import os
import struct
from typing import Tuple

import numpy as np

REFERENCE_DATA = "/root/reference/data"
CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "data")

CLOUD_SHAPE = (125, 85, 153)  # (x, y, z), src/main.cpp:123


def read_density3d(path: str, shape: Tuple[int, int, int]) -> np.ndarray:
    """ReadFileDensity3D (read_file.cpp:50-78): raw fp32, x-major ([x][y][z]
    nesting => x varies slowest). Returns (Nx, Ny, Nz) float32."""
    data = np.fromfile(path, dtype=np.float32)
    nx, ny, nz = shape
    if data.size != nx * ny * nz:
        raise ValueError(f"{path}: expected {nx*ny*nz} floats, got {data.size}")
    return data.reshape(nx, ny, nz)


def _value_noise_3d(rng: np.random.Generator, shape, cells) -> np.ndarray:
    """Trilinearly-interpolated lattice noise, one octave."""
    lattice = rng.random((cells + 1, cells + 1, cells + 1)).astype(np.float32)
    coords = [np.linspace(0, cells, n, endpoint=False, dtype=np.float32)
              for n in shape]
    gx, gy, gz = np.meshgrid(*coords, indexing="ij")
    i0 = np.floor(gx).astype(int), np.floor(gy).astype(int), \
        np.floor(gz).astype(int)
    f = gx - i0[0], gy - i0[1], gz - i0[2]
    out = np.zeros(shape, dtype=np.float32)
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                w = ((f[0] if cx else 1 - f[0])
                     * (f[1] if cy else 1 - f[1])
                     * (f[2] if cz else 1 - f[2]))
                out += w * lattice[i0[0] + cx, i0[1] + cy, i0[2] + cz]
    return out


def synthesize_cloud(shape=CLOUD_SHAPE, seed: int = 7) -> np.ndarray:
    """Deterministic fbm cloud with an ellipsoidal falloff, density in
    [0, 1] like the reference volume (which is 8-bit quantized on upload)."""
    rng = np.random.default_rng(seed)
    fbm = np.zeros(shape, dtype=np.float32)
    amp, total = 1.0, 0.0
    for octave_cells in (4, 8, 16, 32):
        fbm += amp * _value_noise_3d(rng, shape, octave_cells)
        total += amp
        amp *= 0.5
    fbm /= total

    # ellipsoid falloff so the cloud floats inside the box
    axes = [np.linspace(-1, 1, n, dtype=np.float32) for n in shape]
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    r2 = (gx / 0.8) ** 2 + (gy / 0.7) ** 2 + (gz / 0.8) ** 2
    falloff = np.clip(1.0 - r2, 0.0, 1.0)

    dens = np.clip((fbm - 0.4) * 2.5, 0.0, 1.0) * falloff
    return dens.astype(np.float32)


def load_cloud(path: str | None = None) -> np.ndarray:
    """The cloud_sixteenth volume: real file if present, else a cached
    synthesized stand-in of identical shape."""
    candidates = [path] if path else []
    candidates += [os.path.join(REFERENCE_DATA, "cloud_sixteenth"),
                   os.path.join(CACHE_DIR, "cloud_sixteenth")]
    for cand in candidates:
        if cand and os.path.exists(cand):
            return read_density3d(cand, CLOUD_SHAPE)
    dens = synthesize_cloud()
    os.makedirs(CACHE_DIR, exist_ok=True)
    dens.astype(np.float32).tofile(os.path.join(CACHE_DIR, "cloud_sixteenth"))
    return dens


def load_env_map(path: str | None = None) -> np.ndarray:
    """The HDR environment map: photostudio_4k if present, else the small
    photostudio.hdr that ships with the reference, else a synthetic sky."""
    from neuralradiancecaching_tpu.io.hdr import read_hdr
    candidates = [path] if path else []
    candidates += [
        os.path.join(REFERENCE_DATA, "image/photostudio_4k.hdr"),
        os.path.join(REFERENCE_DATA, "image/photostudio.hdr"),
        os.path.join(CACHE_DIR, "photostudio.hdr"),
    ]
    for cand in candidates:
        if cand and os.path.exists(cand):
            return read_hdr(cand)
    return synthesize_sky()


def synthesize_sky(height: int = 128, width: int = 256) -> np.ndarray:
    """Simple analytic sky: blue gradient + warm 'sun' disc, (H, W, 3)."""
    v = np.linspace(0, 1, height, dtype=np.float32)[:, None]
    u = np.linspace(0, 1, width, dtype=np.float32)[None, :]
    sky = np.stack([
        0.3 + 0.2 * v + 0 * u, 0.5 + 0.2 * v + 0 * u, 0.8 + 0.2 * v + 0 * u,
    ], axis=-1)
    d2 = ((u - 0.7) ** 2 + (v - 0.3) ** 2)
    sun = 50.0 * np.exp(-d2 / 0.001)[..., None] * np.array([1.0, 0.9, 0.7],
                                                           np.float32)
    return (sky + sun).astype(np.float32)


# ---------------------------------------------------------------------------
# MNIST (labels are present in the reference; image files are missing blobs)
# ---------------------------------------------------------------------------

# 5x7 digit glyph bitmaps for the synthetic fallback
_DIGIT_GLYPHS = [
    "01110 10001 10011 10101 11001 10001 01110",  # 0
    "00100 01100 00100 00100 00100 00100 01110",  # 1
    "01110 10001 00001 00010 00100 01000 11111",  # 2
    "11110 00001 00001 01110 00001 00001 11110",  # 3
    "00010 00110 01010 10010 11111 00010 00010",  # 4
    "11111 10000 11110 00001 00001 10001 01110",  # 5
    "00110 01000 10000 11110 10001 10001 01110",  # 6
    "11111 00001 00010 00100 01000 01000 01000",  # 7
    "01110 10001 10001 01110 10001 10001 01110",  # 8
    "01110 10001 10001 01111 00001 00010 01100",  # 9
]


def read_idx_labels(path: str) -> np.ndarray:
    """MNIST idx1 label file parser (mnist_reader.hpp equivalent)."""
    with open(path, "rb") as f:
        magic, count = struct.unpack(">ii", f.read(8))
        if magic != 2049:
            raise ValueError(f"bad idx1 magic {magic}")
        return np.frombuffer(f.read(count), dtype=np.uint8)


def read_idx_images(path: str) -> np.ndarray:
    """MNIST idx3 image file parser -> (N, 28, 28) uint8."""
    with open(path, "rb") as f:
        magic, count, rows, cols = struct.unpack(">iiii", f.read(16))
        if magic != 2051:
            raise ValueError(f"bad idx3 magic {magic}")
        data = np.frombuffer(f.read(count * rows * cols), dtype=np.uint8)
        return data.reshape(count, rows, cols)


def synthesize_digit_images(labels: np.ndarray, seed: int = 0) -> np.ndarray:
    """Render 28x28 digit images from labels: upscaled glyphs with random
    shift + blur + noise. Deterministic; learnable by a tiny MLP."""
    rng = np.random.default_rng(seed)
    glyphs = np.zeros((10, 7, 5), dtype=np.float32)
    for d, rows in enumerate(_DIGIT_GLYPHS):
        for r, row in enumerate(rows.split()):
            for c, ch in enumerate(row):
                glyphs[d, r, c] = float(ch == "1")
    big = np.kron(glyphs, np.ones((3, 4), dtype=np.float32))  # (10, 21, 20)

    n = labels.shape[0]
    out = np.zeros((n, 28, 28), dtype=np.float32)
    dx = rng.integers(0, 28 - 20, size=n)
    dy = rng.integers(0, 28 - 21, size=n)
    for i in range(n):
        g = big[labels[i]]
        out[i, dy[i]:dy[i] + 21, dx[i]:dx[i] + 20] = g
    # box blur + noise
    blurred = out.copy()
    blurred[:, 1:] += out[:, :-1]
    blurred[:, :-1] += out[:, 1:]
    blurred[:, :, 1:] += out[:, :, :-1]
    blurred[:, :, :-1] += out[:, :, 1:]
    blurred /= 5.0
    blurred += rng.normal(0, 0.05, size=blurred.shape).astype(np.float32)
    return np.clip(blurred, 0.0, 1.0)


def load_mnist(split: str = "train", limit: int | None = None):
    """Returns (images (N,784) float32 in [0,1], labels (N,) int32).

    Uses the real label files from the reference (data/mnist) and the real
    image files if present; otherwise synthesizes images from the labels.
    """
    name = "train" if split == "train" else "t10k"
    label_path = os.path.join(REFERENCE_DATA, f"mnist/{name}-labels-idx1-ubyte")
    if not os.path.exists(label_path):
        label_path = os.path.join(CACHE_DIR, f"mnist/{name}-labels-idx1-ubyte")
    labels = read_idx_labels(label_path)
    if limit:
        labels = labels[:limit]
    image_path = os.path.join(REFERENCE_DATA, f"mnist/{name}-images-idx3-ubyte")
    if os.path.exists(image_path):
        images = read_idx_images(image_path)[:len(labels)]
        images = images.astype(np.float32) / 255.0
    else:
        images = synthesize_digit_images(labels)
    return images.reshape(len(labels), -1), labels.astype(np.int32)
