#!/usr/bin/env python3
"""Deterministic generator for the m17 TIFF fixtures
(src/main/resources/tiff) and the REFERENCE stats their golden oracle pins.

TIFF here is BASELINE UNCOMPRESSED RGB (public spec, TIFF 6.0): one strip,
8-bit samples, no compression — lossless by construction, so the JVM decode
(javax.imageio's TIFF plugin, in the JDK since Java 9) must agree with the
source raster to the bit. The rasters are the SAME noise images as the
PNG/BMP/GIF fixtures (seeds 90210 / 555001), so the per-channel sums equal
m11/m15/m16's goldens — pinning that one raster through FOUR container
formats decodes identically (scanned-document corpora lead with TIFF, the
one zero-dependency registry format the matrix was missing).

Encoder: little-endian ("II") header, one IFD with the 11 baseline tags a
reader needs for uncompressed chunky RGB:
  ImageWidth(256) ImageLength(257) BitsPerSample(258)=[8,8,8]
  Compression(259)=1 PhotometricInterpretation(262)=2 StripOffsets(273)
  SamplesPerPixel(277)=3 RowsPerStrip(278)=h StripByteCounts(279)
  XResolution(282) YResolution(283) ResolutionUnit(296)=2

corrupt.tiff is a HEADER truncation (cut inside the IFD): an unambiguous
whole-asset reject for any decoder.

Run: python3 tools/gen_tiff_fixtures.py
"""
import os
import struct

HERE = os.path.dirname(__file__)


def lcg(seed):
    s = seed
    while True:
        s = (s * 1103515245 + 12345) & 0x7FFFFFFF
        yield s


def noise_img(w, h, seed):
    g = lcg(seed)
    return [[(next(g) % 256, next(g) % 256, next(g) % 256) for _ in range(w)]
            for _ in range(h)]


def stats(px):
    s = [0, 0, 0]
    for row in px:
        for p in row:
            for c in range(3):
                s[c] += p[c]
    return s


def tiff_bytes(w, h, px):
    data = b"".join(bytes(c for p in row for c in p) for row in px)
    entries = []  # (tag, type, count, value_or_offset); SHORT=3, LONG=4, RATIONAL=5

    # layout: 8-byte header, IFD at 8, then out-of-line values, then strip.
    n = 12
    ifd_size = 2 + n * 12 + 4
    off = 8 + ifd_size                 # first out-of-line value
    bps_off = off                      # BitsPerSample: 3 SHORTs (6 bytes)
    xres_off = bps_off + 6             # XResolution: RATIONAL (8 bytes)
    yres_off = xres_off + 8            # YResolution: RATIONAL (8 bytes)
    strip_off = yres_off + 8

    def short(tag, v):
        entries.append(struct.pack("<HHI", tag, 3, 1) + struct.pack("<HH", v, 0))

    def long_(tag, v):
        entries.append(struct.pack("<HHI", tag, 4, 1) + struct.pack("<I", v))

    short(256, w)                      # ImageWidth
    short(257, h)                      # ImageLength
    entries.append(struct.pack("<HHII", 258, 3, 3, bps_off))  # BitsPerSample
    short(259, 1)                      # Compression: none
    short(262, 2)                      # Photometric: RGB
    long_(273, strip_off)              # StripOffsets
    short(277, 3)                      # SamplesPerPixel
    short(278, h)                      # RowsPerStrip: one strip
    long_(279, len(data))              # StripByteCounts
    entries.append(struct.pack("<HHII", 282, 5, 1, xres_off))  # XResolution
    entries.append(struct.pack("<HHII", 283, 5, 1, yres_off))  # YResolution
    short(296, 2)                      # ResolutionUnit: inch
    assert len(entries) == n

    ifd = struct.pack("<H", n) + b"".join(sorted(entries)) + struct.pack("<I", 0)
    values = (struct.pack("<HHH", 8, 8, 8)
              + struct.pack("<II", 72, 1) + struct.pack("<II", 72, 1))
    return struct.pack("<2sHI", b"II", 42, 8) + ifd + values + data


def write(name, data):
    out = os.path.join(HERE, "..", "src/main/resources", "tiff")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, name), "wb") as f:
        f.write(data)


def bright(px, d, perturb=()):
    """The PNG generator's retouch, verbatim: +d clamped, then a couple of
    overwritten pixels so the dHash moves (shift-invariance) — SAME raster
    as imga_bright.png, so the d43 golden pair equals d40's."""
    q = [[tuple(min(255, c + d) for c in p) for p in row] for row in px]
    for (x, y, v) in perturb:
        q[y][x] = (v, v, v)
    return q


def main():
    A = noise_img(16, 12, 90210)
    B = noise_img(16, 12, 555001)
    Ab = bright(A, 8, perturb=((5, 2, 0), (12, 10, 255)))
    imga, imgb = tiff_bytes(16, 12, A), tiff_bytes(16, 12, B)
    imgab = tiff_bytes(16, 12, Ab)
    write("imga.tiff", imga)
    write("imga_bright.tiff", imgab)
    write("imgb.tiff", imgb)
    write("corrupt.tiff", imga[:40])   # cut inside the IFD
    print("stats (name w h n_pixels sum_r sum_g sum_b) — shared with png/bmp/gif:")
    for k, px in (("imga", A), ("imga_bright", Ab), ("imgb", B)):
        s = stats(px)
        print(k, 16, 12, 192, s[0], s[1], s[2])
    for nm, b in (("imga.tiff", imga), ("imga_bright.tiff", imgab),
                  ("imgb.tiff", imgb)):
        print(nm, len(b), "bytes")


if __name__ == "__main__":
    main()
