"""Property-based tests (hypothesis) for the pure-python operator
kernels — invariants that hold for ANY input, complementing the golden
vectors in test_operators_unit."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mysense_spark.operators._tdist import t_cdf, t_ppf
from mysense_spark.operators.geo import geohash_decode, geohash_encode
from mysense_spark.operators.qc import grubbs_filter

finite_lat = st.floats(min_value=-89.999, max_value=89.999, allow_nan=False)
finite_lon = st.floats(min_value=-179.999, max_value=179.999, allow_nan=False)


@given(lat=finite_lat, lon=finite_lon)
@settings(max_examples=300, deadline=None)
def test_geohash_roundtrip_anywhere(lat, lon):
    """12-char geohash cells are ~±1.7e-5 deg; decode must land inside."""
    gh = geohash_encode(lat, lon, 12)
    assert len(gh) == 12
    dlat, dlon = geohash_decode(gh)
    assert abs(dlat - lat) < 1e-4
    assert abs(dlon - lon) < 1e-4


@given(lat=finite_lat, lon=finite_lon, p=st.integers(min_value=1, max_value=12))
@settings(max_examples=200, deadline=None)
def test_geohash_prefix_nesting(lat, lon, p):
    """A shorter geohash is a prefix of the longer one for the same
    point — the property neighbour-search bucketing relies on."""
    assert geohash_encode(lat, lon, 12).startswith(geohash_encode(lat, lon, p))


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
        min_size=15,
        max_size=80,
    )
)
@settings(max_examples=200, deadline=None)
def test_grubbs_invariants(vals):
    """For any series: the keep-mask keeps an envelope-interior subset
    (outliers are only ever shaved from the extremes), at least 2 values
    survive, and the filter is idempotent (a second pass removes
    nothing)."""
    arr = np.asarray(vals, dtype=np.float64)
    mask = grubbs_filter(arr)
    assert mask.dtype == bool and mask.shape == arr.shape
    kept = arr[mask]
    assert kept.size >= 2
    # removed values are extreme relative to the survivors' envelope:
    # nothing strictly inside (min(kept), max(kept)) may be removed
    removed = arr[~mask]
    assert not np.any((removed > kept.min()) & (removed < kept.max()))
    mask2 = grubbs_filter(kept)
    assert mask2.all()


@given(
    q=st.floats(min_value=0.55, max_value=0.999),
    df=st.integers(min_value=1, max_value=200),
)
@settings(max_examples=200, deadline=None)
def test_tdist_roundtrip_and_monotonic(q, df):
    x = t_ppf(q, df)
    assert x > 0
    assert abs(t_cdf(x, df) - q) < 1e-6
    # heavier tails at lower df: quantiles shrink toward normal as df grows
    assert t_ppf(q, df) >= t_ppf(q, df + 50) - 1e-9


@given(
    vals=st.lists(st.floats(min_value=-100, max_value=100, allow_nan=False), min_size=3, max_size=50)
)
@settings(max_examples=150, deadline=None)
def test_grubbs_constant_and_order(vals):
    """A constant series has no outliers; and the mask is a function of
    values-by-position, invariant to evaluation order details (same
    input -> same mask on repeat calls)."""
    arr = np.asarray(vals, dtype=np.float64)
    const = np.full(10, arr[0])
    assert grubbs_filter(const).all()
    m1, m2 = grubbs_filter(arr), grubbs_filter(arr)
    assert np.array_equal(m1, m2)


def _chunk_layout(n: int, chunk: int = 64, stride: int = 48):
    """Pure-python mirror of q_chunk_overlap's integer arithmetic."""
    n_chunks = 1 if n <= chunk else (n - chunk + stride - 1) // stride + 1
    out = []
    for i in range(n_chunks):
        start = i * stride
        length = min(chunk, n - start)
        out.append((start, length))
    return out


@given(n=st.integers(min_value=1, max_value=5000))
@settings(max_examples=500, deadline=None)
def test_chunk_layout_covers_exactly(n):
    """For ANY document length: every token falls in >= 1 chunk, no chunk
    is empty or overruns the document, the last chunk ends exactly at n,
    and consecutive chunks overlap by exactly chunk-stride (except a
    shorter final chunk)."""
    chunks = _chunk_layout(n)
    assert chunks[0][0] == 0
    assert all(1 <= ln <= 64 for _, ln in chunks)
    assert all(s + ln <= n for s, ln in chunks)
    assert chunks[-1][0] + chunks[-1][1] == n
    covered = set()
    for s, ln in chunks:
        covered.update(range(s, s + ln))
    assert covered == set(range(n))
    # a further chunk would be redundant: the last start must still add
    # new tokens (start < n and previous chunks end before n)
    if len(chunks) > 1:
        prev_end = chunks[-2][0] + chunks[-2][1]
        assert prev_end < n


@given(
    tokens=st.lists(st.integers(min_value=1, max_value=900), min_size=1, max_size=60),
    budget=st.integers(min_value=16, max_value=1024),
)
@settings(max_examples=300, deadline=None)
def test_sequence_packing_spans(tokens, budget):
    """For ANY shard content and budget: per-doc chunk spans are
    contiguous and consistent with the running sum (the q_sequence_packing
    integer arithmetic), and every chunk boundary crossing is counted."""
    cum = 0
    for n in tokens:
        tok_start, cum = cum, cum + n
        chunk_start = tok_start // budget
        chunk_end = (cum - 1) // budget
        n_chunks = chunk_end - chunk_start + 1
        assert chunk_start <= chunk_end
        assert n_chunks >= 1
        # crossings: a doc spans exactly the chunks its token range touches
        assert n_chunks == len({t // budget for t in range(tok_start, cum)})


# gaps drawn to straddle every decision boundary of IsBehavingKit:
# exactly the 480 s rate floor (the strict-< edge), just inside/outside
# it, the 1800 s interval cap, and a penalty-clearing jump
_gap_s = st.sampled_from([1, 60, 479, 480, 481, 1799, 1800, 1801, 14400, 20000])


@given(gaps=st.lists(_gap_s, min_size=1, max_size=60))
@settings(max_examples=300, deadline=None)
def test_throttle_step_invariants(gaps):
    """IsBehavingKit invariants for ANY record sequence (the shared
    _throttle_step drives the streaming handler, the graded batch twin,
    and — as mirrored text — the DuckDB oracle):
    - the first record is always accepted; count increments by 1;
    - the interval estimate stays in (0, INTERVAL_CAP_S] (deltas are
      capped, the running mean of capped deltas cannot exceed the cap);
    - every record inside a penalty window is dropped, and the penalty
      is NOT extended by in-penalty records;
    - a fresh throttle fires only with count >= 3, delta < 480 s AND
      updated interval < 480 s — re-derived here from the published
      constants, not from the step function's own branches."""
    from mysense_spark.streaming.state import (
        INTERVAL_CAP_S,
        THROTTLE_MIN_COUNT,
        THROTTLE_PENALTY_S,
        THROTTLE_RATE_S,
        _throttle_step,
    )

    e = 1_700_000_000_000_000
    count, interval, last, pen = 0, float(INTERVAL_CAP_S), None, 0
    prev_pen = 0
    for i, g in enumerate(gaps):
        if i:
            e += g * 1_000_000
        prev_count, prev_interval, prev_last, prev_pen = count, interval, last, pen
        accepted, count, interval, last, pen = _throttle_step(e, count, interval, last, pen)
        assert count == prev_count + 1
        assert 0.0 < interval <= float(INTERVAL_CAP_S)
        if i == 0:
            assert accepted
            continue
        # independent re-derivation of the decision
        d = min(e - prev_last, INTERVAL_CAP_S * 1_000_000)
        want_interval = (prev_interval * prev_count + d / 1e6) / (prev_count + 1)
        assert interval == want_interval
        if e < prev_pen:
            assert not accepted and pen == prev_pen, "penalty must not extend"
        elif (
            prev_count >= THROTTLE_MIN_COUNT
            and d < THROTTLE_RATE_S * 1_000_000
            and want_interval < THROTTLE_RATE_S
        ):
            assert not accepted and pen == e + THROTTLE_PENALTY_S * 1_000_000
        else:
            assert accepted and pen == prev_pen


# ---------------------------------------------------------------------------
# Codec error-contract fuzzing (r10): every media decoder must either
# decode or raise ValueError / NotImplementedError — never IndexError /
# struct.error / KeyError / MemoryError — for ANY byte string, including
# byte-level mutations of VALID files (the class of bug three r10 review
# passes kept finding by hand: Ns=0 SOS, ragged IMA blocks, RLE
# overruns). Mutating valid fixtures reaches far deeper than random
# bytes, which rarely survive the magic/CRC checks.
# ---------------------------------------------------------------------------


def _codec_fixtures():
    """Small VALID payloads for every decoder family, built with the
    repo's own writers/builders (cached once per session)."""
    import struct
    import zlib

    from mysense_spark.operators.codecs import (
        write_jpeg,
        write_jpeg_lossless,
        write_png,
    )

    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, (9, 7), dtype=np.uint8)
    rgb = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    png16 = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(10)))
        + chunk(b"IEND", b"")
    )

    def wav(code, data, channels=1, block_align=8, bits=4):
        fmt = struct.pack("<HHIIHH", code, channels, 8000, 4000, block_align, bits)
        body = (
            b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    ima = wav(0x11, struct.pack("<hBB", 100, 0, 0) + bytes([0x83, 0x00, 0x0F, 0x48]))
    ms = wav(
        2, bytes([0]) + struct.pack("<hhh", 16, 100, 50) + bytes([0x12, 0x8F]),
        block_align=9,
    )
    pcm = wav(1, struct.pack("<4h", 100, -200, 300, -400), block_align=2, bits=16)

    def bmp(width, height, bpp, raster, palette=b"", compression=0):
        data_off = 54 + len(palette)
        info = struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, bpp, compression,
            len(raster), 2835, 2835, len(palette) // 4, 0,
        )
        head = b"BM" + struct.pack("<IHHI", data_off + len(raster), 0, 0, data_off)
        return head + info + palette + raster

    pal = bytes([10, 20, 30, 0, 40, 50, 60, 0, 70, 80, 90, 0])
    rle = bmp(4, 2, 8, bytes([3, 1, 1, 2, 0, 0, 4, 0, 0, 1]), palette=pal, compression=1)

    # OS/2 2.x shapes (r13: the _decode_bmp_os2 branch must see the
    # mutation battery too): a 16-byte short-header 24-bit file and a
    # 20-byte-header RLE24 file
    os2_hdr16 = struct.pack("<IIIHH", 16, 2, 1, 1, 24)
    os2_24 = (
        b"BM" + struct.pack("<IHHI", 14 + 16 + 8, 0, 0, 14 + 16)
        + os2_hdr16 + bytes([1, 2, 3, 4, 5, 6, 0, 0])
    )
    os2_hdr20 = struct.pack("<IIIHHI", 20, 5, 1, 1, 24, 4)
    os2_rle24_stream = bytes([2, 5, 6, 7, 0, 3, 1, 2, 3, 4, 5, 6, 9, 9, 9, 0, 0, 0, 0, 1])
    os2_rle24 = (
        b"BM" + struct.pack("<IHHI", 14 + 20 + len(os2_rle24_stream), 0, 0, 14 + 20)
        + os2_hdr20 + os2_rle24_stream
    )

    mp4 = (
        struct.pack(">I", 16) + b"ftypisom" + bytes(4)
        + struct.pack(">I", 8 + 8 + 20) + b"moov"
        + struct.pack(">I", 8 + 20) + b"mvhd"
        + b"\x00" + bytes(3) + bytes(8) + struct.pack(">II", 1000, 5000)
    )

    return [
        write_png(gray), write_png(rgb), png16,
        write_jpeg(gray), write_jpeg(rgb, subsample=True, restart=2),
        write_jpeg_lossless(gray, predictor=4, restart=5),
        write_jpeg_lossless(
            (gray.astype(np.uint16) * 257)[:4, :4], predictor=7
        ),
        ima, ms, pcm,
        bmp(3, 2, 24, bytes(12 * 2)), rle,
        os2_24, os2_rle24,
        mp4,
    ]


_FIXTURES = _codec_fixtures()


@given(
    fi=st.integers(min_value=0, max_value=len(_FIXTURES) - 1),
    data=st.data(),
)
@settings(max_examples=400, deadline=None)
def test_codec_mutation_fuzz_error_contract(fi, data):
    """Mutate a valid payload (flip bytes, truncate, or splice junk) and
    require the decode dispatcher to return a result or raise exactly
    the contractual exception types — mapInPandas batches die on
    anything else."""
    from mysense_spark.operators.multimodal import decode_media

    base = bytearray(_FIXTURES[fi])
    mode = data.draw(st.integers(min_value=0, max_value=2))
    if mode == 0:  # flip 1-4 bytes anywhere
        for _ in range(data.draw(st.integers(min_value=1, max_value=4))):
            i = data.draw(st.integers(min_value=0, max_value=len(base) - 1))
            base[i] ^= data.draw(st.integers(min_value=1, max_value=255))
    elif mode == 1:  # truncate
        base = base[: data.draw(st.integers(min_value=0, max_value=len(base)))]
    else:  # splice random junk at a random offset
        i = data.draw(st.integers(min_value=0, max_value=len(base)))
        junk = data.draw(st.binary(min_size=1, max_size=16))
        base = base[:i] + bytearray(junk) + base[i:]
    try:
        meta = decode_media(bytes(base))
        assert isinstance(meta, dict)
    except (ValueError, NotImplementedError):
        pass  # the contractual rejections


@given(payload=st.binary(min_size=0, max_size=64))
@settings(max_examples=300, deadline=None)
def test_codec_random_bytes_error_contract(payload):
    """Raw random bytes through every decoder entry point: succeed or
    raise the contractual types, nothing else."""
    from mysense_spark.operators.codecs import (
        decode_jpeg,
        decode_png,
        parse_mp4_header,
    )
    from mysense_spark.operators.multimodal import decode_bmp, decode_netpbm, decode_wav

    for fn in (decode_png, decode_jpeg, parse_mp4_header, decode_bmp,
               decode_netpbm, decode_wav):
        try:
            fn(payload)
        except (ValueError, NotImplementedError):
            pass


@given(
    arr=st.integers(min_value=1, max_value=12).flatmap(
        lambda h: st.integers(min_value=1, max_value=12).flatmap(
            lambda w: st.sampled_from([None, 1, 3, 4]).flatmap(
                lambda ch: st.binary(
                    min_size=h * w * (ch or 1), max_size=h * w * (ch or 1)
                ).map(
                    lambda raw: np.frombuffer(raw, dtype=np.uint8).reshape(
                        (h, w) if ch is None else (h, w, ch)
                    )
                )
            )
        )
    )
)
@settings(max_examples=200, deadline=None)
def test_png_roundtrip_any_shape(arr):
    """write_png -> decode_png is the identity for EVERY uint8 array
    shape the encoder accepts — including 1-pixel edges and shapes that
    straddle no particular alignment."""
    from mysense_spark.operators.codecs import decode_png, write_png

    meta, back = decode_png(write_png(arr))
    want = arr[:, :, 0] if arr.ndim == 3 and arr.shape[2] == 1 else arr
    assert np.array_equal(back, want)
    assert (meta["width"], meta["height"]) == (arr.shape[1], arr.shape[0])


@given(
    shape=st.tuples(
        st.integers(min_value=1, max_value=20), st.integers(min_value=1, max_value=20)
    ),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=100, deadline=None)
def test_jpeg_unit_quant_gray_roundtrip_any_shape(shape, seed):
    """Unit-quant grayscale JPEG round-trips within DCT float rounding
    (<=1 level) for ANY geometry, including 1xN strips and sizes that
    straddle MCU boundaries."""
    from mysense_spark.operators.codecs import decode_jpeg_pixels, write_jpeg

    arr = np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)
    _, back = decode_jpeg_pixels(write_jpeg(arr))
    assert back.shape == arr.shape
    assert int(np.abs(back.astype(int) - arr.astype(int)).max()) <= 1


# ---------------------------------------------------------------------------
# LoRa + XLSX error-contract fuzzing (r11, the VERDICT #6 battery): the
# two parse surfaces with media-codec-grade exposure that the r10
# battery did not cover. Same contract: decode or raise ValueError —
# never IndexError / struct.error / zipfile.BadZipFile / zlib.error /
# KeyError out of the quarantine path. Mutating VALID frames/workbooks
# reaches deeper than random bytes (which rarely survive magic checks);
# both strategies run.
# ---------------------------------------------------------------------------

_LORA_GOLDEN = [
    # (b64 payload, port) — the golden replay frames from
    # tests/test_lora_decode.py plus a Libelium port-10 capture
    ("hQAAAJsArgF4A3oD+gEOAJw=", 2),
    ("jwDcAV4BmoADeMctaQMPAIkANAF6A2ED/QEMAR8ATr4SAAj1GgAAAVw=", 4),
    ("BUwATsZmAAj46gAAAQs=", 3),
    ("AAEBQgIoBAETQKPzWkJ0fmv/////FAB4AVg=", 12),
    ("PD0+BjhPhxj9wzfe725vZGVfMDEj1TRgSs3MTL1MAADIQk16tMZHngAAAACfAAAAAKCEDQ8/nQicmpmZQA==", 10),
]


@given(
    fi=st.integers(min_value=0, max_value=len(_LORA_GOLDEN) - 1),
    data=st.data(),
)
@settings(max_examples=400, deadline=None)
def test_lora_mutation_fuzz_error_contract(fi, data):
    """Byte-flip/truncate/splice a GOLDEN LoRa frame and require
    decode_payload to return a dict or raise exactly ValueError (the
    quarantine type dead_letter_stream routes on)."""
    import base64

    from mysense_spark.sources.lora import decode_payload

    b64, port = _LORA_GOLDEN[fi]
    base = bytearray(base64.b64decode(b64))
    mode = data.draw(st.integers(min_value=0, max_value=2))
    if mode == 0:
        for _ in range(data.draw(st.integers(min_value=1, max_value=4))):
            i = data.draw(st.integers(min_value=0, max_value=len(base) - 1))
            base[i] ^= data.draw(st.integers(min_value=1, max_value=255))
    elif mode == 1:
        base = base[: data.draw(st.integers(min_value=0, max_value=len(base)))]
    else:
        i = data.draw(st.integers(min_value=0, max_value=len(base)))
        junk = data.draw(st.binary(min_size=1, max_size=12))
        base = base[:i] + bytearray(junk) + base[i:]
    try:
        out = decode_payload(base64.b64encode(bytes(base)).decode(), port)
        assert isinstance(out, dict)
    except ValueError:
        pass  # binascii.Error subclasses ValueError; the contract holds


@given(
    raw=st.binary(min_size=0, max_size=48),
    port=st.sampled_from([0, 2, 3, 4, 7, 10, 12]),
)
@settings(max_examples=400, deadline=None)
def test_lora_random_bytes_error_contract(raw, port):
    """Raw random bytes on every port: dict or ValueError, nothing
    else (200k-trial standalone sweep recorded zero violations)."""
    import base64

    from mysense_spark.sources.lora import decode_payload

    try:
        out = decode_payload(base64.b64encode(raw).decode(), port)
        assert isinstance(out, dict)
    except ValueError:
        pass


def _xlsx_fixture_bytes():
    import datetime
    import os
    import tempfile

    from mysense_spark.sources.xlsx import write_xlsx_sheets

    path = os.path.join(tempfile.mkdtemp(prefix="xlsx_fuzz"), "base.xlsx")
    write_xlsx_sheets(
        {
            "alpha": [{"a": 1, "b": "x", "c": 2.5}, {"a": 2, "b": "y", "c": None}],
            "beta": [{"d": datetime.datetime(2024, 3, 1, 12, 0), "e": True}],
        },
        path,
    )
    with open(path, "rb") as fh:
        return fh.read()


_XLSX_BASE = _xlsx_fixture_bytes()


@given(data=st.data())
@settings(max_examples=300, deadline=None)
def test_xlsx_mutation_fuzz_error_contract(data):
    """Byte-flip/truncate/splice a real workbook (and raw random bytes)
    through read_xlsx + list_sheets: rows or ValueError — the zip/zlib/
    XML layers' own exception types must never escape the quarantine
    normalization (each member of xlsx._MALFORMED was surfaced by this
    battery before the wrapper existed)."""
    import os
    import tempfile

    from mysense_spark.sources.xlsx import list_sheets, read_xlsx

    base = bytearray(_XLSX_BASE)
    mode = data.draw(st.integers(min_value=0, max_value=3))
    if mode == 0:
        for _ in range(data.draw(st.integers(min_value=1, max_value=4))):
            i = data.draw(st.integers(min_value=0, max_value=len(base) - 1))
            base[i] ^= data.draw(st.integers(min_value=1, max_value=255))
    elif mode == 1:
        base = base[: data.draw(st.integers(min_value=0, max_value=len(base)))]
    elif mode == 2:
        i = data.draw(st.integers(min_value=0, max_value=len(base)))
        junk = data.draw(st.binary(min_size=1, max_size=16))
        base = base[:i] + bytearray(junk) + base[i:]
    else:
        base = bytearray(data.draw(st.binary(min_size=0, max_size=64)))
    fd, path = tempfile.mkstemp(suffix=".xlsx")
    try:
        with os.fdopen(fd, "wb") as fh:
            fh.write(bytes(base))
        sheet = data.draw(st.sampled_from([0, 1, 5, "alpha", "nope"]))
        try:
            rows = read_xlsx(path, sheet=sheet)
            assert isinstance(rows, list)
            assert isinstance(list_sheets(path), list)
        except ValueError:
            pass
    finally:
        os.unlink(path)


def test_xlsx_missing_file_still_raises_oserror():
    """The quarantine wrapper must NOT swallow genuine I/O errors: a
    nonexistent path stays FileNotFoundError (caller bug), not a
    'malformed file' ValueError."""
    import pytest

    from mysense_spark.sources.xlsx import read_xlsx

    with pytest.raises(FileNotFoundError):
        read_xlsx("/nonexistent/dir/nope.xlsx")


# --- REST page coercion (late r12) ----------------------------------------

_json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(10**400), max_value=10**400),
    st.floats(allow_nan=True, allow_infinity=True, width=64),
    st.text(max_size=20),
    st.lists(st.integers(), max_size=3),
    st.dictionaries(st.text(max_size=5), st.integers(), max_size=3),
)


@given(
    cells=st.lists(_json_scalars, min_size=1, max_size=12),
    kind=st.sampled_from(
        ["double", "long", "string", "boolean", "decimal(20,0)", "decimal(10,2)"]
    ),
)
@settings(max_examples=400, deadline=None)
def test_rest_coercion_total_and_exact(cells, kind):
    """_coerce_to_schema invariants for ANY JSON-shaped cell mix (the
    late-r12 review found two violations by hand; this makes the class
    systematic): (a) coercion never raises — not for 400-digit ints,
    not for inf/NaN, not for containers; (b) every surviving value is
    of its column's Python type; (c) long columns preserve in-range
    ints EXACTLY (no float64 trip — the 2^53+1 corruption); (d)
    decimal columns preserve in-range ints exactly too; (e) everything
    that survives a long/decimal column was an int (never a guessed
    bool/string)."""
    import decimal

    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        DecimalType,
        DoubleType,
        LongType,
        StringType,
        StructField,
    )

    from mysense_spark.sources.rest import _coerce_to_schema

    # build the field directly: StructType.fromDDL needs a live JVM and
    # this module is deliberately Spark-free
    dtype = {
        "double": DoubleType(),
        "long": LongType(),
        "string": StringType(),
        "boolean": BooleanType(),
        "decimal(20,0)": DecimalType(20, 0),
        "decimal(10,2)": DecimalType(10, 2),
    }[kind]
    fields = [StructField("c", dtype)]
    pdf = pd.DataFrame({"c": pd.Series(cells, dtype=object)})
    out = _coerce_to_schema(pdf, fields)["c"]  # (a) no raise
    for orig, got in zip(cells, out.tolist()):
        if (
            got is None
            or got is pd.NA  # Int64 nullable columns yield pd.NA
            or (isinstance(got, float) and math.isnan(got))
        ):
            continue
        if kind == "long":
            assert isinstance(got, int) and not isinstance(got, bool)  # (b,e)
            assert isinstance(orig, int) and not isinstance(orig, bool)
            assert got == orig  # (c) exact
        elif kind == "double":
            assert isinstance(got, float)
        elif kind == "string":
            assert isinstance(got, str) and got == orig
        elif kind == "boolean":
            assert isinstance(got, bool) and got is orig
        else:  # decimals
            assert isinstance(got, decimal.Decimal)  # (b)
            assert isinstance(orig, (int, float)) and not isinstance(orig, bool)
            if kind == "decimal(20,0)" and isinstance(orig, int):
                assert int(got) == orig  # (d) exact
