"""Texture image loading (host side).

Reproduces the reference's stb_image path (template/texture.h:15-39): decode
to 8-bit, expand greyscale to RGB, drop alpha, and store as float32 in
[0, 1].  Note the reference pushes even its "HDR" skydome through this 8-bit
LDR path — we keep that quantization so renders match (SURVEY.md §7 quirk
list), unless `keep_float=True` (the differentiable pipeline's high-precision
mode).
"""

from __future__ import annotations

import numpy as np


def load_texture_image(path: str, keep_float: bool = False) -> np.ndarray:
    """Returns float32 [H, W, 3] in [0, 1]."""
    if path.lower().endswith(".hdr"):
        rgb = _load_radiance_hdr(path)
        if not keep_float:
            # stb would LDR-clamp: quantize to 8 bits like the reference.
            rgb = np.round(np.clip(rgb, 0.0, 1.0) * 255.0) / 255.0
        return rgb.astype(np.float32)

    from PIL import Image

    img = Image.open(path)
    if img.mode not in ("RGB", "L"):
        img = img.convert("RGB")
    arr = np.asarray(img)
    if arr.ndim == 2:  # greyscale expand (texture.h:25-33)
        arr = np.repeat(arr[..., None], 3, axis=-1)
    return (arr[..., :3].astype(np.float32)) / 255.0


def _load_radiance_hdr(path: str) -> np.ndarray:
    """Minimal Radiance .hdr (RGBE) reader, RLE and flat scanlines."""
    with open(path, "rb") as f:
        line = f.readline()
        if not line.startswith(b"#?"):
            raise ValueError(f"{path}: not a Radiance HDR file")
        while True:
            line = f.readline()
            if line in (b"\n", b"\r\n", b""):
                break
        dims = f.readline().split()
        if len(dims) != 4 or dims[0] != b"-Y" or dims[2] != b"+X":
            raise ValueError(f"{path}: unsupported HDR orientation {dims}")
        h, w = int(dims[1]), int(dims[3])
        data = np.zeros((h, w, 4), np.uint8)
        for y in range(h):
            head = f.read(4)
            if len(head) < 4:
                raise ValueError("truncated HDR")
            if head[0] == 2 and head[1] == 2 and (head[2] << 8 | head[3]) == w:
                # new-style RLE: each channel run-length encoded
                for c in range(4):
                    x = 0
                    while x < w:
                        n = f.read(1)[0]
                        if n > 128:
                            data[y, x : x + n - 128, c] = f.read(1)[0]
                            x += n - 128
                        else:
                            buf = np.frombuffer(f.read(n), np.uint8)
                            data[y, x : x + n, c] = buf
                            x += n
            else:
                row = head + f.read(4 * w - 4)
                data[y] = np.frombuffer(row, np.uint8).reshape(w, 4)
        rgbe = data.astype(np.float32)
        exp = np.ldexp(1.0, data[..., 3].astype(np.int32) - 136)  # 128+8
        rgb = rgbe[..., :3] * exp[..., None]
        rgb[data[..., 3] == 0] = 0.0
        return rgb
