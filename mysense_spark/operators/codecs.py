"""Stdlib codecs for the compressed/boxed media formats (r9): PNG
decode+encode on zlib, JPEG and MP4 header parsers on pure struct walks.

This closes most of what was left of the codec gate after r8's
PCM-WAV/netpbm/BMP decoders: PNG is FULLY decodable with nothing but
the stdlib (the image data is zlib, the rest is chunk framing and
per-scanline filters), and JPEG/MP4 expose their geometry/duration in
plain marker/box structures long before any entropy coding starts — so
`media_properties`' header tier is real for all five image/video
formats, and only the JPEG entropy decode and MP4 sample decode remain
honestly gated behind NotImplementedError (those genuinely need a codec
library).

Reference parity: the reference pipelines never decode media at all
(sensor kits ship numbers); these kernels serve the training-data
mandate — multimodal corpus curation needs geometry/duration for
budgeting and dedup before any GPU decode runs.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# expanded channel count per PNG color type (palette reports 3: that is
# what the raster expands to)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(b: bytes):
    """Yield (type, payload) for each chunk, validating lengths and
    CRCs — a torn or bit-flipped chunk is corrupt data, not a decode."""
    pos = len(_PNG_SIG)
    while pos + 8 <= len(b):
        (size,) = struct.unpack_from(">I", b, pos)
        ctype = b[pos + 4 : pos + 8]
        body = b[pos + 8 : pos + 8 + size]
        if len(body) < size or pos + 12 + size > len(b):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", b, pos + 8 + size)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, body
        if ctype == b"IEND":
            return
        pos += 12 + size
    raise ValueError("PNG ended without IEND")


def _paeth(a: int, bb: int, c: int) -> int:
    p = a + bb - c
    pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return bb if pb <= pc else c


def decode_png(payload: bytes, pixels: bool = True):
    """REAL PNG decoder — stdlib zlib + numpy, no codec library.
    Supports 8-bit samples, color types 0 (gray) / 2 (RGB) / 3
    (palette, expanded to RGB) / 4 (gray+alpha) / 6 (RGBA), scanline
    filters 0-4 (None/Sub/Up/Average/Paeth), non-interlaced. Adam7
    interlace and 1/2/4/16-bit depths raise NotImplementedError (rare
    tiers; a wrong guess would be worse than a gate). Returns
    (meta, array) where array is HxW for grayscale or HxWxC otherwise —
    or None with pixels=False: the IHDR-only header tier a properties
    scan needs, no inflate, no raster."""
    import numpy as np

    b = bytes(payload)
    if b[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    chunks = _png_chunks(b)
    ctype, ihdr = next(chunks, (None, None))
    if ctype != b"IHDR" or len(ihdr) != 13:
        raise ValueError("PNG missing IHDR")
    width, height, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if width < 1 or height < 1 or width > 2**31 - 1 or height > 2**31 - 1:
        # the PNG spec itself caps dimensions at 2^31-1; a "larger"
        # header is corrupt, and letting it through would also overflow
        # the int32 Arrow properties schema downstream
        raise ValueError(f"invalid PNG dimensions {width}x{height}")
    if comp != 0 or filt != 0 or color not in _PNG_CHANNELS:
        raise ValueError(f"corrupt PNG header (compression={comp} filter={filt} color={color})")
    meta = {
        "width": int(width),
        "height": int(height),
        "channels": 3 if color == 3 else _PNG_CHANNELS[color],
        "bit_depth": int(depth),
        "color_type": int(color),
    }
    if not pixels:
        return meta, None
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG needs a codec library")
    if depth != 8:
        raise NotImplementedError(f"{depth}-bit PNG needs a codec library")
    plte = None
    idat = []
    for ctype, body in chunks:
        if ctype == b"PLTE":
            if len(body) % 3:
                raise ValueError("PNG palette length not a multiple of 3")
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
    if not idat:
        raise ValueError("PNG has no IDAT data")
    ch = _PNG_CHANNELS[color]
    stride = width * ch
    expected = height * (1 + stride)
    try:
        # bounded inflate: the geometry already says exactly how many
        # bytes the raster must be, so cap the decompression there — a
        # zip-bomb IDAT is rejected after expected+1 bytes instead of
        # ballooning to its full inflated size first
        raw = zlib.decompressobj().decompress(b"".join(idat), expected + 1)
    except zlib.error as exc:
        raise ValueError(f"PNG IDAT inflate failed: {exc}") from None
    if len(raw) != expected:
        raise ValueError("PNG raster length does not match geometry")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, 1 + stride)
    filters, lines = raw[:, 0], raw[:, 1:].astype(np.int64)
    out = np.zeros((height, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        f, line = int(filters[y]), lines[y]
        if f == 0:
            rec = line
        elif f == 1:
            # Sub telescopes: recon[x] = Σ raw over the channel lane,
            # mod 256 — a per-lane cumsum, vectorized like Up
            rec = np.mod(
                line.reshape(width, ch).cumsum(axis=0, dtype=np.int64), 256
            ).reshape(stride)
        elif f == 2:  # Up — vectorized (the common photographic filter)
            rec = (line + prev) & 0xFF
        elif f in (3, 4):
            # Average/Paeth mix the up row into the left recursion —
            # genuinely sequential along x, per-byte loop, exact
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                left = rec[x - ch] if x >= ch else 0
                up = prev[x]
                ul = prev[x - ch] if x >= ch else 0
                if f == 3:
                    rec[x] = (line[x] + (left + up) // 2) & 0xFF
                else:
                    rec[x] = (line[x] + _paeth(int(left), int(up), int(ul))) & 0xFF
        else:
            raise ValueError(f"invalid PNG scanline filter {f}")
        out[y] = rec
        prev = out[y]
    arr = out.astype(np.uint8).reshape(height, width, ch)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        idx = arr[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range")
        arr = plte[idx]
    if arr.shape[2] == 1:
        arr = arr[:, :, 0]
    meta["mean"] = float(arr.mean())
    return meta, arr


def write_png(arr) -> bytes:
    """PNG encoder (filter 0 + zlib): HxW uint8 grayscale, HxWx3 RGB, or
    HxWx4 RGBA — the round-trip partner of decode_png and a real K7-tier
    artifact writer (report thumbnails without Pillow)."""
    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3, 4):
        raise ValueError(f"write_png needs HxW, HxWx3 or HxWx4; got {arr.shape}")
    h, w, ch = a.shape
    color = {1: 0, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raster = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    idat = zlib.compress(raster)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


# JPEG markers that stand alone (no length field follows)
_JPEG_STANDALONE = {0x01, *range(0xD0, 0xD8)}  # TEM, RST0-7
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def parse_jpeg_header(payload: bytes) -> dict:
    """REAL JPEG header parser — the marker walk every `identify`-style
    tool performs: SOI, then length-framed segments to the first SOFn,
    which carries precision, geometry, and component count in plain
    big-endian struct fields (entropy coding only starts at SOS). The
    pixel decode (Huffman + IDCT) stays gated — see decode_jpeg."""
    b = bytes(payload)
    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
        raise ValueError("not a JPEG payload")
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"JPEG marker desync at byte {pos}")
        marker = b[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker in _JPEG_STANDALONE:
            pos += 2
            continue
        if marker == 0xD9:  # EOI before any SOF
            break
        (size,) = struct.unpack_from(">H", b, pos + 2)
        if size < 2 or pos + 2 + size > len(b):
            raise ValueError("truncated JPEG segment")
        if marker in _JPEG_SOF:
            if size < 8:
                raise ValueError("truncated JPEG SOF segment")
            precision, height, width, ncomp = struct.unpack_from(">BHHB", b, pos + 4)
            if width < 1 or height < 1 or ncomp < 1:
                raise ValueError(f"invalid JPEG geometry {width}x{height}x{ncomp}")
            return {
                "width": int(width),
                "height": int(height),
                "channels": int(ncomp),
                "bit_depth": int(precision),
                "progressive": marker in (0xC2, 0xC6, 0xCA, 0xCE),
            }
        if marker == 0xDA:  # SOS without a preceding SOF
            break
        pos += 2 + size
    raise ValueError("JPEG has no SOF segment")


def decode_jpeg(payload: bytes, pixels: bool = True):
    """JPEG decode: the header tier (geometry/components/progressive) is
    REAL — parse_jpeg_header above; the pixel tier (Huffman entropy
    decode + dequant + IDCT + chroma upsampling) genuinely needs a codec
    library and stays gated."""
    meta = parse_jpeg_header(payload)
    if not pixels:
        return meta, None
    raise NotImplementedError("JPEG entropy decode needs a codec library")


def _mp4_boxes(b: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each ISO-BMFF box in
    [start, end) — size 1 means 64-bit largesize, size 0 means
    to-end-of-enclosing-box."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", b, pos)
        btype = b[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize box")
            (size,) = struct.unpack_from(">Q", b, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"MP4 box {btype!r} overruns its container")
        yield btype, body, pos + size
        pos += size


def parse_mp4_header(payload: bytes) -> dict:
    """REAL MP4/ISO-BMFF structural parser — the moov metadata tree is
    plain big-endian boxes, no codec needed: mvhd gives
    timescale/duration, each trak's tkhd gives 16.16-fixed geometry,
    each mdia/hdlr classifies the track (vide/soun). Returns duration_s,
    n_tracks, video/audio track counts, and the largest video track's
    width/height. Sample DECODE (H.264 et al.) stays gated — see
    decode_mp4."""
    b = bytes(payload)
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload")
    duration_s = 0.0
    n_tracks = video = audio = 0
    width = height = 0
    seen_moov = False
    for btype, s, e in _mp4_boxes(b, 0, len(b)):
        if btype != b"moov":
            continue
        seen_moov = True
        for t2, s2, e2 in _mp4_boxes(b, s, e):
            if t2 == b"mvhd" and e2 - s2 >= 20:
                version = b[s2]
                if version == 1:
                    # v1 widens creation/modification/duration to 64 bits:
                    # timescale at +20, duration (8 bytes) at +24 — the
                    # box must hold all 32 bytes or it is corrupt, not
                    # "close enough to read as v0"
                    if e2 - s2 < 32:
                        raise ValueError("truncated MP4 mvhd v1 box")
                    (timescale,) = struct.unpack_from(">I", b, s2 + 20)
                    (dur,) = struct.unpack_from(">Q", b, s2 + 24)
                else:
                    timescale, dur = struct.unpack_from(">II", b, s2 + 12)
                if timescale:
                    duration_s = dur / timescale
            elif t2 == b"trak":
                n_tracks += 1
                tw = th = 0
                kind = None
                for t3, s3, e3 in _mp4_boxes(b, s2, e2):
                    if t3 == b"tkhd" and e3 - s3 >= 84:
                        version = b[s3]
                        off = s3 + (88 if version == 1 else 76)
                        if off + 8 <= e3:
                            wfx, hfx = struct.unpack_from(">II", b, off)
                            tw, th = wfx >> 16, hfx >> 16
                    elif t3 == b"mdia":
                        for t4, s4, e4 in _mp4_boxes(b, s3, e3):
                            if t4 == b"hdlr" and e4 - s4 >= 12:
                                kind = b[s4 + 8 : s4 + 12]
                if kind == b"vide":
                    video += 1
                    if tw * th >= width * height:
                        width, height = tw, th
                elif kind == b"soun":
                    audio += 1
    if not seen_moov:
        raise ValueError("MP4 has no moov box (streaming-fragmented or truncated)")
    return {
        "duration_s": float(duration_s),
        "n_tracks": int(n_tracks),
        "video_tracks": int(video),
        "audio_tracks": int(audio),
        "width": int(width),
        "height": int(height),
    }


def decode_mp4(payload: bytes, pixels: bool = True):
    """MP4 decode: the structural tier (duration, tracks, geometry) is
    REAL — parse_mp4_header above; the sample tier (H.264/AAC decode)
    genuinely needs a codec library and stays gated."""
    meta = parse_mp4_header(payload)
    if not pixels:
        return meta, None
    raise NotImplementedError("MP4 sample decode needs a codec library")
