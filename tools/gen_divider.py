"""Regenerate scenes/mlt_slit/divider.obj with a configurable hole.

The MLT showcase needs the slit small enough that plain PT cannot
cheaply find the hole-transmitting paths (equal-time protocol in
tools/bench_mlt_equal_time.py). Two horizontal panel layers (y = 1.70
facing down, y = 1.74 facing up) each leave a hole x,z in [-h, h].

    python tools/gen_divider.py [h]     # default 0.04
"""
import os
import sys

H = float(sys.argv[1]) if len(sys.argv) > 1 else 0.04
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "scenes", "mlt_slit", "divider.obj")


def main():
    lines = []
    vi = 0

    def quad(p0, p1, p2, p3, ny):
        nonlocal vi
        for p in (p0, p1, p2, p3):
            lines.append(f"v {p[0]} {p[1]} {p[2]}")
        for _ in range(4):
            lines.append(f"vn 0 {ny} 0")
        lines.append("vt 0 0")
        lines.append("vt 1 0")
        lines.append("vt 1 1")
        lines.append("vt 0 1")
        a, b, c, d = vi + 1, vi + 2, vi + 3, vi + 4
        lines.append(f"f {a}/{a}/{a} {b}/{b}/{b} {c}/{c}/{c}")
        lines.append(f"f {a}/{a}/{a} {c}/{c}/{c} {d}/{d}/{d}")
        vi += 4

    for y, ny in ((1.70, -1), (1.74, 1)):
        # four slabs around the [-H, H]^2 hole (full-width z strips,
        # x strips between them)
        quad((-1, y, -1), (-1, y, -H), (1, y, -H), (1, y, -1), ny)
        quad((-1, y, H), (-1, y, 1), (1, y, 1), (1, y, H), ny)
        quad((-1, y, -H), (-1, y, H), (-H, y, H), (-H, y, -H), ny)
        quad((H, y, -H), (H, y, H), (1, y, H), (1, y, -H), ny)

    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {OUT} (hole {2 * H}x{2 * H})")


if __name__ == "__main__":
    main()
