#!/usr/bin/env python3
"""Deterministic generator for the m6 rotation-robust near-dup PPM fixtures
(src/main/resources/ppmrot) and the REFERENCE orbit-distance implementation
the m6_rot_robust_dedup golden oracle is derived from.

Run: python3 tools/gen_ppmrot_fixtures.py
Rewrites the fixture files and prints every pairwise ORBIT distance
  d(A,B) = min over the 8-element dihedral orbit of
           min(ham(dhash(A), dhash(t(B))), ham(dhash(B), dhash(t(A))))
Pairs at d <= 3 are the golden rows in SparkEntry.oracleSql.

The reference dhash is the same independent re-implementation as
tools/gen_ppmnear_fixtures.py; flip/rotate/orbit are re-implemented here
from scratch. The orbit is compared as a SET, so agreement with the Scala
graft.ops.Multimodal.dihedralOrbit does not depend on either side's
coordinate conventions — only on both implementing the dihedral group.
"""
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "src/main/resources/ppmrot")


def lcg(seed):
    s = seed
    while True:
        s = (s * 1103515245 + 12345) & 0x7FFFFFFF
        yield s


def noise_img(w, h, seed):
    g = lcg(seed)
    return [[(next(g) % 256, next(g) % 256, next(g) % 256) for _ in range(w)]
            for _ in range(h)]


def write_ppm(name, px, comment=None):
    h, w = len(px), len(px[0])
    hdr = b"P6"
    if comment:
        hdr += b"\n# " + comment
    hdr += b"\n%d %d\n255\n" % (w, h)
    body = bytes(c for row in px for p in row for c in p)
    with open(os.path.join(OUT, name), "wb") as f:
        f.write(hdr + body)


def bright(px, d, perturb=()):
    """+d clamped (flips no dHash bits), then overwrite pixels to flip a
    couple — the retouch a rotated re-grade carries."""
    q = [[tuple(min(255, c + d) for c in p) for p in row] for row in px]
    for (x, y, v) in perturb:
        q[y][x] = (v, v, v)
    return q


def flip_h(px):
    return [list(reversed(row)) for row in px]


def rot_cw(px):
    h, w = len(px), len(px[0])
    return [[px[h - 1 - x][y] for x in range(h)] for y in range(w)]


def orbit(px):
    rots = [px]
    for _ in range(3):
        rots.append(rot_cw(rots[-1]))
    return rots + [flip_h(r) for r in rots]


def dhash(px):
    h, w = len(px), len(px[0])

    def cell(x, y, gw, gh):
        x0, x1 = x * w // gw, max(x * w // gw + 1, (x + 1) * w // gw)
        y0, y1 = y * h // gh, max(y * h // gh + 1, (y + 1) * h // gh)
        tot = n = 0
        for yy in range(y0, y1):
            for xx in range(x0, x1):
                r, g, b = px[yy][xx]
                tot += 299 * r + 587 * g + 114 * b
                n += 1
        return tot // n

    gray = [[cell(x, y, 9, 8) for x in range(9)] for y in range(8)]
    sig = 0
    for y in range(8):
        for x in range(8):
            if gray[y][x] < gray[y][x + 1]:
                sig |= 1 << (y * 8 + x)
    return sig


def ham(a, b):
    return bin(a ^ b).count("1")


def orbit_dist(pa, pb):
    sa, sb = dhash(pa), dhash(pb)
    return min(min(ham(sa, dhash(t)) for t in orbit(pb)),
               min(ham(sb, dhash(t)) for t in orbit(pa)))


def main():
    A = noise_img(16, 12, 7777)
    B = noise_img(16, 12, 998877)
    C = noise_img(10, 10, 5150)
    Afb = bright(flip_h(A), 8, perturb=((2, 3, 0), (12, 8, 255)))

    imgs = {
        "imga.ppm": A,
        "imga_rot90.ppm": rot_cw(A),
        "imga_flip_bright.ppm": Afb,
        "imgb.ppm": B,
        "imgb_rot180.ppm": rot_cw(rot_cw(B)),
        "imgc.ppm": C,
    }
    os.makedirs(OUT, exist_ok=True)
    for n, px in imgs.items():
        write_ppm(n, px)

    names = sorted(imgs)
    print("pairs (orbit distance):")
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            d = orbit_dist(imgs[names[i]], imgs[names[j]])
            print(names[i], names[j], d, "<= 3 GOLDEN" if d <= 3 else "")


if __name__ == "__main__":
    main()
