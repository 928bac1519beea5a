"""Radiance .hdr (RGBE) reader.

Replaces the reference's stb_image HDR path (read_file.cpp:80-121
ReadFileHdr4f). Supports the new-style per-channel RLE scanlines and the
flat fallback. Pure numpy; returns (H, W, 3) float32 linear radiance.
"""

from __future__ import annotations

import numpy as np


def _decode_rgbe(rgbe: np.ndarray) -> np.ndarray:
    """(..., 4) uint8 RGBE -> (..., 3) float32 (stb semantics:
    f = ldexp(1, e - 136), rgb = c * f; e == 0 -> black)."""
    rgbe = rgbe.astype(np.int32)
    e = rgbe[..., 3]
    scale = np.where(e == 0, 0.0, np.ldexp(1.0, e - 136)).astype(np.float32)
    return rgbe[..., :3].astype(np.float32) * scale[..., None]


def read_hdr(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        data = f.read()

    # header: lines until the blank line, then the resolution line
    pos = 0

    def readline():
        nonlocal pos
        end = data.index(b"\n", pos)
        line = data[pos:end]
        pos = end + 1
        return line

    magic = readline()
    if not (magic.startswith(b"#?RADIANCE") or magic.startswith(b"#?RGBE")):
        raise ValueError(f"not a Radiance HDR file: {path}")
    while True:
        line = readline()
        if line == b"":
            break
    res = readline().split()
    if res[0] != b"-Y" or res[2] != b"+X":
        raise ValueError(f"unsupported HDR orientation: {res}")
    height, width = int(res[1]), int(res[3])

    # native fast path (csrc/nrcio.cpp), ~16x the pure-Python RLE decode
    from neuralradiancecaching_tpu.io import native
    if native.available():
        return native.hdr_decode(data[pos:], width, height)

    out = np.zeros((height, width, 4), dtype=np.uint8)
    buf = np.frombuffer(data, dtype=np.uint8, offset=pos)
    bp = 0
    for y in range(height):
        if width < 8 or width > 0x7FFF or buf[bp] != 2 or buf[bp + 1] != 2 \
                or (int(buf[bp + 2]) << 8 | int(buf[bp + 3])) != width:
            # flat (non-RLE) scanline: width RGBE pixels
            row = buf[bp:bp + width * 4].reshape(width, 4)
            out[y] = row
            bp += width * 4
            continue
        bp += 4
        for c in range(4):
            x = 0
            while x < width:
                count = int(buf[bp])
                bp += 1
                if count > 128:  # run
                    out[y, x:x + count - 128, c] = buf[bp]
                    bp += 1
                    x += count - 128
                else:  # literal
                    if count == 0:
                        # a zero-count packet never advances x; treat as a
                        # corrupt/truncated file instead of spinning forever
                        raise ValueError(
                            f"corrupt HDR RLE scanline (zero-count packet) "
                            f"at y={y}")
                    out[y, x:x + count, c] = buf[bp:bp + count]
                    bp += count
                    x += count
    return _decode_rgbe(out)
