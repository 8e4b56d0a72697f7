"""Image I/O: LDR textures (sRGB->linear), PNG save, and a minimal EXR codec.

The TPU-native replacement for the reference's stb/tinyexr usage
(imageio.cpp:11-162):
- `load_texture` flips V and converts sRGB->linear with pow 2.2
  (imageio.cpp LoadTexture + texture.h:15-27);
- `save_png` clamps, converts to 8-bit, and flips V (imageio.cpp SavePng);
- `load_exr` / `save_exr` implement the small subset of OpenEXR needed for
  equirect environment maps (scanline, half/float, NO/ZIP/ZIPS compression)
  in pure numpy — no OpenEXR dependency exists in this image.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
from PIL import Image


def load_texture(path: str, gamma: bool = True) -> np.ndarray:
    """LDR texture -> linear float32 [H, W, 3], V flipped so row 0 is the
    bottom (matches reference stbi flip + pow-2.2, imageio.cpp:11-44)."""
    img = Image.open(path).convert("RGB")
    arr = np.asarray(img, np.float32) / 255.0
    arr = arr[::-1]  # flip V
    if gamma:
        arr = arr ** 2.2
    return arr


def save_png(path: str, image: np.ndarray, flip: bool = True) -> None:
    """float32 [H, W, 3] (display-ready, already tonemapped) -> PNG.
    Reference SavePng clamps to [0,1] and flips V (imageio.cpp:100-120)."""
    arr = np.clip(np.asarray(image), 0.0, 1.0)
    if flip:
        arr = arr[::-1]
    Image.fromarray((arr * 255.0 + 0.5).astype(np.uint8)).save(path)


# ---------------------------------------------------------------------------
# Minimal EXR codec (scanline RGB(A), half/float, NO/ZIP/ZIPS compression)
# ---------------------------------------------------------------------------

_PIX_UINT, _PIX_HALF, _PIX_FLOAT = 0, 1, 2
_COMP_NO, _COMP_RLE, _COMP_ZIPS, _COMP_ZIP = 0, 1, 2, 3


def _read_cstr(buf: bytes, off: int) -> tuple[str, int]:
    end = buf.index(b"\x00", off)
    return buf[off:end].decode("latin-1"), end + 1


def _predictor_decode(data: bytearray) -> bytes:
    """EXR 'deltas + interleave' post-zlib decode."""
    arr = np.frombuffer(bytes(data), np.uint8).astype(np.int32)
    arr = np.cumsum(arr - 128, dtype=np.int64) % 256
    arr = arr.astype(np.uint8)
    # de-interleave: first half = even bytes, second half = odd bytes
    n = arr.shape[0]
    out = np.empty(n, np.uint8)
    half = (n + 1) // 2
    out[0::2] = arr[:half]
    out[1::2] = arr[half:]
    return out.tobytes()


def _predictor_encode(data: bytes) -> bytes:
    arr = np.frombuffer(data, np.uint8)
    n = arr.shape[0]
    half = (n + 1) // 2
    inter = np.empty(n, np.uint8)
    inter[:half] = arr[0::2]
    inter[half:] = arr[1::2]
    d = inter.astype(np.int32)
    d[1:] = d[1:] - d[:-1]
    d = ((d + 128) % 256).astype(np.uint8)
    return d.tobytes()


def load_exr(path: str) -> np.ndarray:
    """Load a scanline EXR -> float32 [H, W, 3] (RGB; extra channels dropped).

    Supports NO/ZIPS/ZIP compression, HALF/FLOAT channels. Raises on tiled
    or other compressions (the reference's tinyexr has the same core).
    """
    with open(path, "rb") as f:
        buf = f.read()
    magic, version = struct.unpack_from("<iI", buf, 0)
    if magic != 20000630:
        raise ValueError(f"{path}: not an EXR file")
    if version & 0x200:
        raise ValueError(f"{path}: tiled EXR unsupported")
    off = 8

    channels = []  # (name, pixtype)
    compression = _COMP_NO
    data_window = None
    while True:
        name, off = _read_cstr(buf, off)
        if name == "":
            break
        typ, off = _read_cstr(buf, off)
        (size,) = struct.unpack_from("<i", buf, off)
        off += 4
        val = buf[off:off + size]
        off += size
        if name == "channels":
            coff = 0
            while val[coff] != 0:
                cname, coff = _read_cstr(val, coff)
                ptype, = struct.unpack_from("<i", val, coff)
                coff += 16
                channels.append((cname, ptype))
        elif name == "compression":
            compression = val[0]
        elif name == "dataWindow":
            data_window = struct.unpack("<4i", val)

    xmin, ymin, xmax, ymax = data_window
    width = xmax - xmin + 1
    height = ymax - ymin + 1

    if compression not in (_COMP_NO, _COMP_ZIPS, _COMP_ZIP):
        raise ValueError(f"{path}: unsupported EXR compression {compression}")
    lines_per_block = {_COMP_NO: 1, _COMP_ZIPS: 1, _COMP_ZIP: 16}[compression]

    channels.sort(key=lambda c: c[0])  # EXR stores channels alphabetically
    dtypes = {_PIX_HALF: np.float16, _PIX_FLOAT: np.float32,
              _PIX_UINT: np.uint32}
    ch_dtypes = [dtypes[t] for _, t in channels]
    bytes_per_pix = sum(np.dtype(d).itemsize for d in ch_dtypes)

    n_blocks = (height + lines_per_block - 1) // lines_per_block
    offsets = struct.unpack_from(f"<{n_blocks}Q", buf, off)

    planes = {name: np.zeros((height, width), np.float32)
              for name, _ in channels}
    for bi in range(n_blocks):
        boff = offsets[bi]
        y, dsize = struct.unpack_from("<iI", buf, boff)
        raw = buf[boff + 8: boff + 8 + dsize]
        y0 = y - ymin
        nlines = min(lines_per_block, height - y0)
        expect = nlines * width * bytes_per_pix
        if compression != _COMP_NO and dsize < expect:
            raw = _predictor_decode(bytearray(zlib.decompress(raw)))
        line_bytes = width * bytes_per_pix
        for li in range(nlines):
            line = raw[li * line_bytes:(li + 1) * line_bytes]
            coff = 0
            for (cname, _), dt in zip(channels, ch_dtypes):
                isz = np.dtype(dt).itemsize
                seg = np.frombuffer(line, dt, count=width, offset=coff)
                planes[cname][y0 + li] = seg.astype(np.float32)
                coff += width * isz

    out = np.zeros((height, width, 3), np.float32)
    for i, c in enumerate("RGB"):
        if c in planes:
            out[..., i] = planes[c]
        elif "Y" in planes:
            out[..., i] = planes["Y"]
    return out


def save_exr(path: str, image: np.ndarray) -> None:
    """Save float32 [H, W, 3] as scanline HALF EXR with ZIP compression."""
    img = np.asarray(image, np.float32)
    height, width, _ = img.shape
    half = img.astype(np.float16)

    header = b""

    def attr(name: str, typ: str, val: bytes) -> bytes:
        return (name.encode() + b"\x00" + typ.encode() + b"\x00"
                + struct.pack("<i", len(val)) + val)

    chan = b""
    for c in "BGR":  # alphabetical storage order
        chan += c.encode() + b"\x00" + struct.pack("<i", _PIX_HALF) + \
            b"\x00" * 4 + struct.pack("<ii", 1, 1)
    chan += b"\x00"
    header += attr("channels", "chlist", chan)
    header += attr("compression", "compression", bytes([_COMP_ZIP]))
    box = struct.pack("<4i", 0, 0, width - 1, height - 1)
    header += attr("dataWindow", "box2i", box)
    header += attr("displayWindow", "box2i", box)
    header += attr("lineOrder", "lineOrder", b"\x00")
    header += attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += attr("screenWindowCenter", "v2f", struct.pack("<2f", 0, 0))
    header += attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\x00"

    lines_per_block = 16
    n_blocks = (height + lines_per_block - 1) // lines_per_block
    blocks = []
    for bi in range(n_blocks):
        y0 = bi * lines_per_block
        nlines = min(lines_per_block, height - y0)
        rows = []
        for li in range(nlines):
            row = b""
            for ci in [2, 1, 0]:  # B, G, R
                row += half[y0 + li, :, ci].tobytes()
            rows.append(row)
        raw = b"".join(rows)
        comp = zlib.compress(_predictor_encode(raw))
        if len(comp) >= len(raw):
            comp = raw
        blocks.append((y0, comp))

    with open(path, "wb") as f:
        f.write(struct.pack("<iI", 20000630, 2))
        f.write(header)
        table_off = f.tell() + 8 * n_blocks
        offs = []
        pos = table_off
        for y0, comp in blocks:
            offs.append(pos)
            pos += 8 + len(comp)
        f.write(struct.pack(f"<{n_blocks}Q", *offs))
        for y0, comp in blocks:
            f.write(struct.pack("<iI", y0, len(comp)))
            f.write(comp)


def read_density_file(path: str, nx: int, ny: int, nz: int) -> np.ndarray:
    """Text density grid, one float per line (reference medium.h:237-245).
    Returns [nz, ny, nx] float32.

    Index order d[z*ny*nx + y*nx + x], matching the reference
    (medium.h:174-177). Verified as the true memory layout: it is the
    only reshape smooth along all three axes. Note the bundled
    cornell_box density.d then renders a DIAGONAL plume, while the
    reference's historical golden (result/smoke.png) shows a vertical
    one — the golden predates the bundled data."""
    data = np.loadtxt(path, dtype=np.float32).reshape(-1)
    if data.size != nx * ny * nz:
        raise ValueError(
            f"{path}: expected {nx * ny * nz} density samples, got {data.size}")
    return data.reshape(nz, ny, nx)
