"""TIFF codec (kernels/tiffcodec.py) — the imagestack page format.

The reference hands every ``*_tif.zip`` page file to PIL
(``recode.py:595-597`` imagestack scan, ``bin/pdf-to-imagestack``
inverse); this suite pins the re-derived capability: classic TIFF
strips across none/PackBits/LZW(+predictor)/CCITT G3/G4/JPEG
compressions, both byte orders, bilevel fax pages and 8-bit
gray/RGB.  No foreign TIFF exists in-container, so the evidence
model is bit-exact round-trips, hand-built byte-level fixtures
(big-endian, JPEGTables) and typed-error fuzz — the same model as
the other codecs."""

import struct

import numpy as np
import pytest

from archive_pdf_tools_spark.kernels.tiffcodec import (
    TiffError, decode_tiff, encode_tiff, lzw_decode, lzw_encode,
    packbits_decode, packbits_encode)


def test_packbits_roundtrip_and_pins():
    rng = np.random.default_rng(1)
    for n in (0, 1, 2, 127, 128, 129, 4000):
        for lo in (2, 256):
            b = bytes(rng.integers(0, lo, n, dtype=np.uint8))
            assert packbits_decode(packbits_encode(b), n) == b, (n, lo)
    # §9 worked example shapes: a repeat run and a literal run
    assert packbits_encode(b"\xaa\xaa\xaa") == b"\xfe\xaa"
    assert packbits_decode(b"\xfe\xaa", 3) == b"\xaa\xaa\xaa"
    assert packbits_decode(b"\x02abc", 3) == b"abc"
    with pytest.raises(TiffError):
        packbits_decode(b"\x05ab", 6)        # truncated literal
    # review-finding pin: a 127-byte literal followed by a folded
    # 2-byte pair must NOT emit a 129-byte literal (header 0x80 =
    # the no-op code — undecodable by ANY PackBits reader)
    tricky = bytes(range(127)) + b"\xc8\xc8\x07"
    enc = packbits_encode(tricky)
    assert 0x80 not in [enc[k] for k in _header_positions(enc)]
    assert packbits_decode(enc, len(tricky)) == tricky
    img = np.array([list(range(127)) + [200, 200, 7]], dtype=np.uint8)
    from archive_pdf_tools_spark.kernels.tiffcodec import (
        decode_tiff, encode_tiff)
    t = encode_tiff(img, compression="packbits")
    assert np.array_equal(decode_tiff(t), img)


def _header_positions(enc: bytes):
    """Walk a PackBits stream yielding its header-byte indices."""
    i = 0
    while i < len(enc):
        yield i
        b = enc[i]
        i += (b + 2) if b < 128 else (2 if b > 128 else 1)


def test_lzw_roundtrip_growth_and_pins():
    """Early-change width schedule: the first code is 9 bits and the
    stream opens with Clear (256) — pinned at the bit level — and a
    long low-entropy payload crosses 10/11/12-bit widths plus a table
    reset without desynchronizing."""
    rng = np.random.default_rng(2)
    for n in (0, 1, 300, 5000):
        b = bytes(rng.integers(0, 6, n, dtype=np.uint8))
        assert lzw_decode(lzw_encode(b), n) == b, n
        r = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert lzw_decode(lzw_encode(r), n) == r, n
    big = bytes(rng.integers(0, 16, 300_000, dtype=np.uint8))
    assert lzw_decode(lzw_encode(big), len(big)) == big
    # bit-level pin: Clear=256 as the leading 9-bit code = 1000 0000 0
    enc = lzw_encode(b"A")
    assert enc[0] == 0b10000000
    assert (enc[1] >> 7) == 0
    with pytest.raises(TiffError):
        lzw_decode(lzw_encode(b"hello")[:1], 5)


@pytest.mark.parametrize("comp", ["none", "packbits", "lzw",
                                  "lzw_predictor"])
def test_gray_rgb_roundtrip(comp):
    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, (45, 61), dtype=np.uint8)
    rgb = rng.integers(0, 256, (21, 34, 3), dtype=np.uint8)
    smooth = np.clip(np.add.outer(np.arange(40) * 3,
                                  np.arange(50) * 2), 0, 255
                     ).astype(np.uint8)
    for img in (gray, rgb, smooth):
        t = encode_tiff(img, compression=comp, rows_per_strip=7)
        assert np.array_equal(decode_tiff(t), img), comp


@pytest.mark.parametrize("comp", ["none", "packbits", "g4", "g3"])
def test_bilevel_roundtrip(comp):
    """Fax-style pages: photometric 0 (min-is-white, the CCITT norm),
    1-bit rows padded to bytes; decode renders 0/255 gray."""
    rng = np.random.default_rng(4)
    bl = (rng.random((37, 83)) < 0.25).astype(np.uint8) * 255
    t = encode_tiff(bl, compression=comp, bilevel=True)
    assert np.array_equal(decode_tiff(t), np.where(bl < 128, 0, 255))


def test_jpeg_in_tiff_and_jpegtables():
    """New-style JPEG (tag 7): full interchange strips decode, and
    the JPEGTables-abbreviated layout (tables stream + per-strip
    scan-only streams, §22 / TTN2) re-merges to the same pixels."""
    from archive_pdf_tools_spark.kernels.jpegcodec import encode_baseline
    yy, xx = np.mgrid[0:48, 0:64]
    img = ((xx * 3 + yy * 2) % 256).astype(np.uint8)
    t = encode_tiff(img, compression="jpeg")
    full = decode_tiff(t)
    assert full.shape == img.shape
    # split a full stream into tables (DQT/DHT) + abbreviated image
    blob = encode_baseline(img)
    tables, image = bytearray(b"\xff\xd8"), bytearray(b"\xff\xd8")
    i = 2
    while i < len(blob):
        assert blob[i] == 0xFF
        m = blob[i + 1]
        if m == 0xD9:
            break
        seg_len = struct.unpack(">H", blob[i + 2:i + 4])[0]
        seg = blob[i:i + 2 + seg_len]
        (tables if m in (0xDB, 0xC4) else image).extend(seg)
        i += 2 + seg_len
        if m == 0xDA:                        # entropy data to EOI
            image.extend(blob[i:])
            break
    tables.extend(b"\xff\xd9")
    # hand-build a TIFF with JPEGTables: take the encoder's layout and
    # swap the strip + add tag 347
    base = encode_tiff(img, compression="jpeg")
    h, w = img.shape
    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    entries = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8]), (259, 3, [7]),
        (262, 3, [1]), (273, 4, [0]), (277, 3, [1]), (278, 4, [h]),
        (279, 4, [len(image)]), (347, 7, None)]
    ifd_size = 2 + 12 * len(entries) + 4
    tbl_off = 8 + ifd_size
    strip_off = tbl_off + len(tables)
    out += struct.pack("<H", len(entries))
    for tag, typ, vals in entries:
        if tag == 273:
            vals = [strip_off]
        if tag == 347:
            out += struct.pack("<HHII", tag, typ, len(tables), tbl_off)
            continue
        fmt = {3: "H", 4: "I"}[typ]
        b = b"".join(struct.pack("<" + fmt, v) for v in vals)
        out += struct.pack("<HHI", tag, typ, len(vals))
        out += b + b"\x00" * (4 - len(b))
    out += struct.pack("<I", 0)
    out += tables + image
    merged = decode_tiff(bytes(out))
    assert np.array_equal(merged, full)


def test_big_endian_and_photometric_inversion():
    """MM byte order decodes (hand-built fixture) and photometric 0
    on 8-bit gray inverts."""
    img = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
    raw = img.tobytes()
    out = bytearray(b"MM\x00*" + struct.pack(">I", 8))
    entries = [(256, 3, 4), (257, 3, 3), (258, 3, 8), (259, 3, 1),
               (262, 3, 0), (273, 4, None), (277, 3, 1),
               (278, 3, 3), (279, 4, len(raw))]
    ifd_size = 2 + 12 * len(entries) + 4
    data_off = 8 + ifd_size
    out += struct.pack(">H", len(entries))
    for tag, typ, val in entries:
        if tag == 273:
            val = data_off
        out += struct.pack(">HHI", tag, typ, 1)
        if typ == 3:
            out += struct.pack(">H", val) + b"\x00\x00"
        else:
            out += struct.pack(">I", val)
    out += struct.pack(">I", 0)
    out += raw
    got = decode_tiff(bytes(out))
    assert np.array_equal(got, 255 - img)    # WhiteIsZero inverts


def test_multi_strip_and_gates():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (64, 32), dtype=np.uint8)
    t = encode_tiff(img, compression="lzw", rows_per_strip=5)
    assert np.array_equal(decode_tiff(t), img)
    with pytest.raises(TiffError, match="magic"):
        decode_tiff(b"NOTATIFF")
    with pytest.raises(TiffError):
        decode_tiff(encode_tiff(img)[:30])
    big = encode_tiff(np.zeros((100, 100), np.uint8))
    with pytest.raises(TiffError, match="dimensions"):
        decode_tiff(big, max_pixels=50)
    with pytest.raises(ValueError, match="bilevel"):
        encode_tiff(img, compression="g4")


def test_lying_jpeg_strip_raises():
    """Review-finding pin: an IFD that claims more rows than its JPEG
    strip decodes (or a YCbCr photometric on a non-JPEG compression)
    must raise, never return a wrong-sized or wrong-colored raster."""
    img = ((np.add.outer(np.arange(40) * 2, np.arange(48) * 3)) % 256
           ).astype(np.uint8)
    t = bytearray(encode_tiff(img, compression="jpeg"))
    # patch ImageLength (tag 257) from 40 to 80 in the LE IFD
    pos = t.find(struct.pack("<HHI", 257, 4, 1))
    assert pos > 0
    t[pos + 8:pos + 12] = struct.pack("<I", 80)
    with pytest.raises(TiffError):
        decode_tiff(bytes(t))
    # photometric 6 on an LZW strip: raw YCbCr must not pass as RGB
    rgbish = np.stack([img, img, img], axis=-1)
    t2 = bytearray(encode_tiff(rgbish, compression="lzw"))
    pos = t2.find(struct.pack("<HHI", 262, 3, 1))
    assert pos > 0
    t2[pos + 8:pos + 10] = struct.pack("<H", 6)
    with pytest.raises(TiffError, match="photometric"):
        decode_tiff(bytes(t2))
    with pytest.raises(ValueError, match="8-bit"):
        encode_tiff(img, compression="jpeg", bilevel=True)


def test_multi_page_chain():
    """Multi-page TIFF (next-IFD chain — the multi-page book-scan
    layout): mixed per-page compressions and bilevel pages round-trip
    by page index, MULTI-STRIP pages exercise the out-of-line value
    layout across chained blocks, and reading past the chain raises."""
    from archive_pdf_tools_spark.kernels.tiffcodec import (
        encode_tiff_multi, tiff_page_count)
    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 256, (30 + i, 41 - i), dtype=np.uint8)
            for i in range(3)]
    bl = (rng.random((25, 40)) < 0.3).astype(np.uint8) * 255
    data = encode_tiff_multi(
        imgs + [bl],
        compression=["none", "packbits", "lzw_predictor", "g4"],
        bilevel=[False, False, False, True],
        rows_per_strip=6)                    # multi-strip every page
    assert tiff_page_count(data) == 4
    for k, im in enumerate(imgs):
        assert np.array_equal(decode_tiff(data, page=k), im), k
    assert np.array_equal(decode_tiff(data, page=3),
                          np.where(bl < 128, 0, 255))
    with pytest.raises(TiffError, match="chain"):
        decode_tiff(data, page=4)
    with pytest.raises(ValueError, match="length"):
        encode_tiff_multi(imgs, compression=["lzw"])
    # single-page files report one page
    from archive_pdf_tools_spark.kernels.tiffcodec import encode_tiff
    assert tiff_page_count(encode_tiff(imgs[0])) == 1


def test_fuzz_typed_errors_only():
    """Truncations and byte mutations raise TiffError only (the
    mapInPandas metadata-fallback contract)."""
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (20, 30), dtype=np.uint8)
    for comp in ("none", "packbits", "lzw", "g4"):
        base = bytearray(encode_tiff(
            np.where(img > 128, np.uint8(255), np.uint8(0))
            if comp == "g4" else img,
            compression=comp, bilevel=comp == "g4"))
        for i in range(0, len(base), 13):
            try:
                decode_tiff(bytes(base[:i]), max_pixels=64 * 64)
            except TiffError:
                pass
        for _ in range(120):
            d = bytearray(base)
            for _ in range(int(rng.integers(1, 5))):
                d[int(rng.integers(0, len(d)))] = \
                    int(rng.integers(0, 256))
            try:
                decode_tiff(bytes(d), max_pixels=64 * 64)
            except TiffError:
                pass


def test_tiled_roundtrips():
    """Tile organization (§15): every byte-oriented scheme plus G4
    and lossy JPEG round-trip through a tile grid with edge cropping;
    tile dims must be positive multiples of 16."""
    from archive_pdf_tools_spark.kernels.tiffcodec import encode_tiff
    rng = np.random.default_rng(17)
    for comp in ("none", "packbits", "lzw", "lzw_predictor"):
        for shape in ((31, 45), (70, 33, 3)):
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            t = encode_tiff(img, compression=comp, tile=(16, 16))
            assert np.array_equal(decode_tiff(t), img), (comp, shape)
    mask = (rng.integers(0, 2, (40, 60)) * 255).astype(np.uint8)
    t = encode_tiff(mask, compression="g4", bilevel=True,
                    tile=(32, 16))
    assert np.array_equal(decode_tiff(t), mask)
    # lossy JPEG tiles: geometry exact, content close
    img = (np.add.outer(np.arange(48), np.arange(64)) % 200
           + 20).astype(np.uint8)
    d = decode_tiff(encode_tiff(img, compression="jpeg",
                                tile=(32, 16)))
    assert d.shape == img.shape
    assert abs(int(d.astype(int).mean()) - int(img.astype(int).mean())) < 8
    with pytest.raises(ValueError, match="16"):
        encode_tiff(img, tile=(15, 16))
    with pytest.raises(ValueError, match="strip-shaped"):
        encode_tiff(mask, compression="g3", bilevel=True,
                    tile=(16, 16))


def test_planar_roundtrips():
    """PlanarConfiguration=2: RGB as three separate strip-sequenced
    sample planes, byte-oriented schemes incl. the per-plane
    horizontal predictor."""
    from archive_pdf_tools_spark.kernels.tiffcodec import (
        encode_tiff_planar)
    rng = np.random.default_rng(18)
    img = rng.integers(0, 256, (29, 37, 3), dtype=np.uint8)
    for comp in ("none", "packbits", "lzw", "lzw_predictor"):
        t = encode_tiff_planar(img, compression=comp,
                               rows_per_strip=6)
        assert np.array_equal(decode_tiff(t), img), comp
    with pytest.raises(ValueError, match="planar"):
        encode_tiff_planar(img[:, :, 0])
    with pytest.raises(ValueError, match="planar"):
        encode_tiff_planar(img, compression="jpeg")


def test_bigtiff_roundtrips():
    """BigTIFF (version 43, 8-byte offsets — the >4 GB book-scan
    shape): strips, tiles, bilevel G4 and multi-strip RGB all
    round-trip; LONG8 segment offsets on the wire; header constants
    validated."""
    import struct as _s

    from archive_pdf_tools_spark.kernels.tiffcodec import (
        encode_tiff, tiff_page_count)
    rng = np.random.default_rng(19)
    img = rng.integers(0, 256, (25, 41, 3), dtype=np.uint8)
    t = encode_tiff(img, compression="lzw", rows_per_strip=9,
                    bigtiff=True)
    assert t[:4] == b"II+\x00" and _s.unpack("<H", t[4:6])[0] == 8
    assert np.array_equal(decode_tiff(t), img)
    assert tiff_page_count(t) == 1
    mask = (rng.integers(0, 2, (30, 50)) * 255).astype(np.uint8)
    t = encode_tiff(mask, compression="g4", bilevel=True,
                    bigtiff=True)
    assert np.array_equal(decode_tiff(t), mask)
    gray = rng.integers(0, 256, (40, 50), dtype=np.uint8)
    t = encode_tiff(gray, compression="lzw", tile=(16, 32),
                    bigtiff=True)
    assert np.array_equal(decode_tiff(t), gray)
    # corrupt header constants raise typed
    bad = bytearray(t)
    bad[4] = 4                               # bytesize must be 8
    with pytest.raises(TiffError, match="BigTIFF"):
        decode_tiff(bytes(bad))


def test_tiled_planar_bigtiff_fuzz():
    """The new layouts hold the typed-error contract under mutation."""
    from archive_pdf_tools_spark.kernels.tiffcodec import (
        encode_tiff, encode_tiff_planar)
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    streams = [encode_tiff(img, compression="lzw", tile=(16, 16)),
               encode_tiff_planar(img, compression="packbits",
                                  rows_per_strip=7),
               encode_tiff(img, compression="lzw", rows_per_strip=9,
                           bigtiff=True)]
    for base in streams:
        b = bytearray(base)
        for i in range(0, len(b), 17):
            try:
                decode_tiff(bytes(b[:i]), max_pixels=64 * 64)
            except TiffError:
                pass
        for _ in range(150):
            d = bytearray(b)
            d[int(rng.integers(0, len(d)))] = int(rng.integers(0, 256))
            try:
                out = decode_tiff(bytes(d), max_pixels=64 * 64)
                assert out.dtype == np.uint8
            except TiffError:
                pass


def test_old_style_jpeg_interchange():
    """Old-style JPEG (compression 6, §22 deprecated): the common
    JPEGInterchangeFormat shape — tags 513/514 pointing at one whole
    JFIF stream — decodes; the per-strip JPEGProc machinery stays
    gated with a typed error."""
    from archive_pdf_tools_spark.kernels.jpegcodec import (
        decode_baseline, encode_baseline)

    img = (np.add.outer(np.arange(24), np.arange(40)) % 200
           + 20).astype(np.uint8)
    jpg = encode_baseline(img)
    exp = decode_baseline(jpg)

    def build(with_ptr=True, jlen=None):
        entries = [(256, 4, [40]), (257, 4, [24]), (258, 3, [8]),
                   (259, 3, [6]), (262, 3, [1]), (277, 3, [1])]
        if with_ptr:
            entries += [(513, 4, [0]),        # patched below
                        (514, 4, [jlen if jlen is not None
                                  else len(jpg)])]
        entries.sort()
        ifd_size = 2 + 12 * len(entries) + 4
        joff = 8 + ifd_size
        out = bytearray(b"II*\x00" + struct.pack("<I", 8))
        out += struct.pack("<H", len(entries))
        for tag, typ, vals in entries:
            if tag == 513:
                vals = [joff]
            fmt = {3: "H", 4: "I"}[typ]
            b = b"".join(struct.pack("<" + fmt, v) for v in vals)
            out += struct.pack("<HHI", tag, typ, len(vals))
            out += b + b"\x00" * (4 - len(b))
        out += struct.pack("<I", 0)
        out += jpg
        return bytes(out)

    assert np.array_equal(decode_tiff(build()), exp)
    with pytest.raises(TiffError, match="JPEGInterchangeFormat"):
        decode_tiff(build(with_ptr=False))
    with pytest.raises(TiffError, match="range"):
        decode_tiff(build(jlen=10_000_000))


def test_color_old_style_jpeg_ycbcr():
    """Review-finding pin: Compression=6 with PhotometricInterp=6
    (the standard color old-style scanner shape) passes the
    photometric gate and decodes through the JPEG handoff."""
    from archive_pdf_tools_spark.kernels.jpegcodec import (
        decode_baseline, encode_baseline)

    rgb = np.stack([(np.add.outer(np.arange(24), np.arange(40))
                     * (c + 1)) % 200 + 20 for c in range(3)],
                   axis=-1).astype(np.uint8)
    jpg = encode_baseline(rgb)
    exp = decode_baseline(jpg)
    entries = [(256, 4, [40]), (257, 4, [24]), (258, 3, [8, 8, 8]),
               (259, 3, [6]), (262, 3, [6]), (277, 3, [3]),
               (513, 4, [0]), (514, 4, [len(jpg)])]
    entries.sort()
    ifd_size = 2 + 12 * len(entries) + 4
    tail = b""
    voff = 8 + ifd_size
    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    out += struct.pack("<H", len(entries))
    for tag, typ, vals in entries:
        if tag == 513:
            vals = [8 + ifd_size + 6]        # after the one tail value
        fmt = {3: "H", 4: "I"}[typ]
        b = b"".join(struct.pack("<" + fmt, v) for v in vals)
        out += struct.pack("<HHI", tag, typ, len(vals))
        if len(b) <= 4:
            out += b + b"\x00" * (4 - len(b))
        else:
            out += struct.pack("<I", voff)
            tail += b
            voff += len(b)
    out += struct.pack("<I", 0)
    out += tail + jpg
    assert np.array_equal(decode_tiff(bytes(out)), exp)


def test_tile_grid_amplification_guard():
    """Review-finding pin: a tile grid whose aggregate pixel work
    dwarfs the image area (w=1 but TileWidth=4000, every tile offset
    aliasing one span) is rejected up front — the per-tile cap alone
    admitted 2500x max_pixels of decode work."""
    from archive_pdf_tools_spark.kernels.tiffcodec import encode_tiff

    base = bytearray(encode_tiff(
        np.zeros((16, 16), np.uint8), compression="none",
        tile=(16, 16)))
    # forge ImageWidth=1, ImageLength=40000, TileWidth=4000: walk the
    # IFD and patch tag values in place
    n = struct.unpack("<H", base[8:10])[0]
    for k in range(n):
        e = 10 + 12 * k
        tag = struct.unpack("<H", base[e:e + 2])[0]
        if tag == 256:
            base[e + 8:e + 12] = struct.pack("<I", 1)
        elif tag == 257:
            base[e + 8:e + 12] = struct.pack("<I", 40000)
        elif tag == 322:
            base[e + 8:e + 12] = struct.pack("<I", 4000)
        elif tag == 323:
            base[e + 8:e + 12] = struct.pack("<I", 1)
    with pytest.raises(TiffError, match="grid exceeds"):
        decode_tiff(bytes(base), max_pixels=64_000)


def test_16bit_scan_masters():
    """16-bit samples (archival scan masters) reduce to the high byte
    — the PNG codec's convention — across strips/tiles/BigTIFF and
    the predictor, which must difference at the NATIVE 16-bit width
    before the reduction; big-endian sample order honored."""
    from archive_pdf_tools_spark.kernels.tiffcodec import encode_tiff
    rng = np.random.default_rng(29)
    for shape in ((21, 34), (21, 34, 3)):
        img16 = rng.integers(0, 65536, shape, dtype=np.uint16)
        exp = (img16 >> 8).astype(np.uint8)
        for comp in ("none", "packbits", "lzw", "lzw_predictor"):
            for kw in ({}, {"tile": (16, 16)}, {"bigtiff": True}):
                t = encode_tiff(img16, compression=comp,
                                rows_per_strip=6, **kw)
                assert np.array_equal(decode_tiff(t), exp), (comp, kw)
    with pytest.raises(ValueError, match="8-bit"):
        encode_tiff(np.zeros((8, 8), np.uint16), compression="jpeg")
    # big-endian 16-bit: flip the encoder's little-endian stream to MM
    # by hand-building one uncompressed sample
    vals = np.array([[0x12AB, 0xFF01]], dtype=np.uint16)
    raw = vals.astype(">u2").tobytes()
    entries = [(256, 4, [2]), (257, 4, [1]), (258, 3, [16]),
               (259, 3, [1]), (262, 3, [1]), (277, 3, [1]),
               (278, 4, [1]), (273, 4, [0]), (279, 4, [len(raw)])]
    entries.sort()
    ifd = 2 + 12 * len(entries) + 4
    out = bytearray(b"MM\x00*" + struct.pack(">I", 8))
    out += struct.pack(">H", len(entries))
    for tag, typ, v in entries:
        if tag == 273:
            v = [8 + ifd]
        fmt = {3: "H", 4: "I"}[typ]
        b = b"".join(struct.pack(">" + fmt, x) for x in v)
        out += struct.pack(">HHI", tag, typ, len(v))
        out += b + b"\x00" * (4 - len(b))
    out += struct.pack(">I", 0) + raw
    assert list(decode_tiff(bytes(out))[0]) == [0x12, 0xFF]


def test_deflate_roundtrips():
    """Deflate (compression 8, and the original 32946 assignment):
    stdlib-zlib strips/tiles/BigTIFF with the shared predictor at
    both sample widths; code 32946 decodes via a patched comp tag."""
    from archive_pdf_tools_spark.kernels.tiffcodec import encode_tiff
    rng = np.random.default_rng(31)
    for comp in ("deflate", "deflate_predictor"):
        for shape in ((23, 37), (23, 37, 3)):
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            for kw in ({}, {"tile": (16, 16)}, {"bigtiff": True}):
                t = encode_tiff(img, compression=comp,
                                rows_per_strip=7, **kw)
                assert np.array_equal(decode_tiff(t), img), (comp, kw)
        img16 = rng.integers(0, 65536, (23, 37), dtype=np.uint16)
        t = encode_tiff(img16, compression=comp, rows_per_strip=7)
        assert np.array_equal(decode_tiff(t),
                              (img16 >> 8).astype(np.uint8))
    # legacy code 32946 aliases 8: patch the comp tag in place
    img = rng.integers(0, 256, (23, 37), dtype=np.uint8)
    t = bytearray(encode_tiff(img, compression="deflate",
                              rows_per_strip=7))
    n = struct.unpack("<H", t[8:10])[0]
    for k in range(n):
        e = 10 + 12 * k
        if struct.unpack("<H", t[e:e + 2])[0] == 259:
            assert struct.unpack("<H", t[e + 8:e + 10])[0] == 8
            t[e + 8:e + 10] = struct.pack("<H", 32946)
    assert np.array_equal(decode_tiff(bytes(t)), img)
    # corrupt deflate stream raises typed
    bad = bytearray(encode_tiff(img, compression="deflate"))
    bad[-8] ^= 0xFF
    with pytest.raises(TiffError):
        decode_tiff(bytes(bad))


def test_bigtiff_multipage_book():
    """A multi-page BigTIFF book (version-43 next-IFD chain — the
    shape a >4 GB master actually needs) round-trips page-by-page
    with mixed per-page compressions."""
    from archive_pdf_tools_spark.kernels.tiffcodec import (
        encode_tiff_multi, tiff_page_count)
    rng = np.random.default_rng(37)
    imgs = [rng.integers(0, 256, (18, 26), dtype=np.uint8)
            for _ in range(4)]
    book = encode_tiff_multi(
        imgs, compression=["none", "lzw", "deflate", "packbits"],
        bigtiff=True)
    assert book[:4] == b"II+\x00"
    assert tiff_page_count(book) == 4
    for k, im in enumerate(imgs):
        assert np.array_equal(decode_tiff(book, page=k), im), k


def test_unknown_predictor_raises():
    """Review-finding pin: Predictor values other than 1/2 must raise
    (the floating-point predictor 3 is out of scope) — silently
    returning still-differenced pixels violates the module's
    no-garbage contract."""
    from archive_pdf_tools_spark.kernels.tiffcodec import encode_tiff

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    t = bytearray(encode_tiff(img, compression="lzw_predictor"))
    n = struct.unpack("<H", t[8:10])[0]
    for k in range(n):
        e = 10 + 12 * k
        if struct.unpack("<H", t[e:e + 2])[0] == 317:
            t[e + 8:e + 10] = struct.pack("<H", 3)
    with pytest.raises(TiffError, match="predictor 3"):
        decode_tiff(bytes(t))


def test_lzw_long_stream_table_resets():
    """Page-size LZW round-trip: noisy content fills the 12-bit code
    table repeatedly (the next_code==4094 Clear/reset path small
    fixtures never reach), and the masked bit-accumulator keeps the
    decode linear — the r8 quadratic-bignum regression guard (0.04 ->
    4.6 Mpx/s/core at 3.7 Mpx, BENCH/codec_swap_r8.md)."""
    import time

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (600, 800), dtype=np.uint8)
    blob = encode_tiff(img, compression="lzw")
    t0 = time.perf_counter()
    out = decode_tiff(blob)
    elapsed = time.perf_counter() - t0
    assert np.array_equal(out, img)
    # 0.48 Mpx of worst-case noise: linear decode lands well under a
    # second even on a throttled burst window; the quadratic bug took
    # ~12 s here.  Generous 10x margin.
    assert elapsed < 10.0, f"LZW decode non-linear? {elapsed:.1f}s"
