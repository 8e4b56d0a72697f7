"""Synthesize the teapot golden's graph-paper floor texture.

result/teapot.png sits the teapot on white graph paper with dark major
grid lines and small handwritten-style coordinate labels at the cell
corners. That texture does not ship with the reference, so the teapot
golden scene (scenes/teapot) uses this synthesized stand-in: paper
white, black major lines every CELL px, gray sub-grid, and small
"(x, y)" labels near each major-line crossing. At the golden-comparison
resolution (<=256 px tall) the labels blur into the same low-contrast
speckle as the original handwriting.

    python tools/make_graph_paper.py   # writes scenes/teapot/graph_paper.png
"""
import os

import numpy as np
from PIL import Image, ImageDraw

SIZE = 2048
CELLS = 8          # major cells across the texture
LINE_W = 3         # major line width (px)
PAPER = 235        # paper gray level (display, sRGB)
LINE = 185         # major line level (the golden's lines are
                   # thin and light: ~0.8x the paper level)
LABEL = 170        # label ink level


def main():
    img = Image.new("L", (SIZE, SIZE), PAPER)
    d = ImageDraw.Draw(img)
    cell = SIZE // CELLS
    for i in range(CELLS + 1):
        p = min(i * cell, SIZE - LINE_W)
        d.rectangle([p, 0, p + LINE_W - 1, SIZE], fill=LINE)
        d.rectangle([0, p, SIZE, p + LINE_W - 1], fill=LINE)
    # coordinate labels at the major crossings, like the golden's
    # handwritten "(0.2, 0.1)" annotations
    for i in range(CELLS):
        for j in range(CELLS):
            x, y = i * cell + 14, j * cell + 10
            d.text((x, y), f"({i % 10 / 10:.1f}, {j % 10 / 10:.1f})",
                   fill=LABEL)
    out = os.path.join(os.path.dirname(__file__), "..",
                       "scenes", "teapot", "graph_paper.png")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    rgb = Image.merge("RGB", (img, img, img))
    rgb.save(out, optimize=True)
    print("wrote", out, os.path.getsize(out), "bytes")


if __name__ == "__main__":
    main()
