"""Image I/O codec tests: the from-scratch EXR writer/reader
(film/imageio.py — scanline HALF + ZIP with the predictor transform,
tinyexr's supported subset) and the PNG path.

The EXR codec is the only producer AND consumer of env maps in the
repo's pipeline (the reference ships no EXR), so a silent encode/decode
asymmetry would poison every env render while staying self-consistent —
the tests pin the half-float quantization and the byte format against
an independent PIL decode for PNG and exact values for EXR.
"""

import numpy as np
import pytest

from gpu_pathtracer_tpu.film.imageio import (load_exr, load_texture,
                                             save_exr, save_png)


def test_exr_roundtrip_half_exact(tmp_path):
    """Values exactly representable in f16 survive the HALF+ZIP
    scanline roundtrip bit-for-bit."""
    rng = np.random.default_rng(0)
    img = rng.random((37, 61, 3)).astype(np.float32)
    img[0, 0] = [0.0, 1.0, 65504.0]   # f16 max
    img[1, 1] = [1e-4, 2.5, 1.0 / 3.0]
    img = img.astype(np.float16).astype(np.float32)  # f16-exact values
    p = str(tmp_path / "rt.exr")
    save_exr(p, img)
    back = load_exr(p)
    np.testing.assert_array_equal(back, img)


def test_exr_roundtrip_quantization(tmp_path):
    """Arbitrary f32 values come back within half-float precision."""
    rng = np.random.default_rng(1)
    img = (rng.random((16, 32, 3)) * 40.0).astype(np.float32)
    p = str(tmp_path / "q.exr")
    save_exr(p, img)
    back = load_exr(p)
    np.testing.assert_allclose(back, img, rtol=1e-3)


def test_png_roundtrip_vs_pil(tmp_path):
    """save_png output decodes identically through PIL (independent
    decoder) including the bottom-up flip convention."""
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(2)
    img = rng.random((24, 24, 3)).astype(np.float32)
    p = str(tmp_path / "x.png")
    save_png(p, img)  # flip=True: row 0 = bottom
    pil = np.asarray(PIL.open(p).convert("RGB"), np.float32) / 255.0
    np.testing.assert_allclose(pil[::-1], img, atol=1.0 / 255.0 + 1e-6)


def test_load_texture_srgb(tmp_path):
    """load_texture linearizes 8-bit sRGB (gamma 2.2 pipeline parity
    with the reference's stbi + pow(2.2) path)."""
    from PIL import Image
    a = np.full((4, 4, 3), 128, np.uint8)
    p = str(tmp_path / "t.png")
    Image.fromarray(a).save(p)
    tex = load_texture(p, gamma=True)
    expect = (128.0 / 255.0) ** 2.2
    np.testing.assert_allclose(tex.reshape(-1, 3).mean(0), expect,
                               rtol=2e-2)
