"""Real multimodal codecs implementable without external media libs:
uncompressed 24-bit BMP (BITMAPINFOHEADER), 16-bit PCM WAV (RIFF), and
COMPRESSED 8-bit RGB PNG (zlib deflate + the five scanline filters),
all built from struct/zlib/numpy.

PNG is the compressed-codec path: encode applies a different scanline
filter per row (cycling None/Sub/Up/Average/Paeth) before deflate, so
a byte-exact decode proves chunk walking + CRC verification + inflate
+ full unfiltering, not just header parsing.  Genuinely external
decoders (JPEG/MP3/H.264) remain out of scope for this environment.

Encoding embeds an arbitrary byte payload into the pixel / PCM buffer
(zero-padded to capacity), so a decode that reproduces the exact
original bytes proves the full round trip: header parse, dimension /
sample-rate extraction, BMP 4-byte row-stride handling, numpy buffer
reconstruction.  UTF-8 text never contains 0x00, so stripping trailing
zero padding is unambiguous for text payloads.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# BMP: 14-byte file header + 40-byte BITMAPINFOHEADER + BGR rows,
# bottom-up, each row padded to a 4-byte boundary.
# ---------------------------------------------------------------------------

_BMP_FILE_HDR = "<2sIHHI"  # magic, file size, res1, res2, pixel offset
_BMP_INFO_HDR = "<IiiHHIIiiII"


def bmp_row_stride(width: int) -> int:
    return (width * 3 + 3) & ~3


def bmp_encode(payload: bytes, width: int, height: int) -> bytes:
    """Pack ``payload`` into the pixel buffer of a width x height
    24-bit BMP (zero-padded; payload must fit in width*height*3)."""
    capacity = width * height * 3
    if len(payload) > capacity:
        raise ValueError(f"payload {len(payload)}B > capacity {capacity}B")
    stride = bmp_row_stride(width)
    pixel_bytes = np.zeros(stride * height, dtype=np.uint8)
    rows = np.zeros((height, width * 3), dtype=np.uint8)
    flat = np.frombuffer(payload.ljust(capacity, b"\0"), dtype=np.uint8)
    rows[:] = flat.reshape(height, width * 3)
    pixel_bytes = np.zeros((height, stride), dtype=np.uint8)
    pixel_bytes[:, : width * 3] = rows
    data = pixel_bytes.tobytes()
    info = struct.pack(
        _BMP_INFO_HDR, 40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    offset = 14 + 40
    hdr = struct.pack(_BMP_FILE_HDR, b"BM", offset + len(data), 0, 0, offset)
    return hdr + info + data


def bmp_decode(blob: bytes) -> tuple[int, int, int, bytes]:
    """Parse a 24-bit uncompressed BMP -> (width, height, bits_per_px,
    pixel payload with row padding removed, rows in encode order)."""
    magic, _fsize, _r1, _r2, offset = struct.unpack_from(_BMP_FILE_HDR, blob, 0)
    if magic != b"BM":
        raise ValueError("not a BMP")
    (hdr_size, width, height, _planes, bpp, compression, _img_size,
     _xppm, _yppm, _clr, _clr_imp) = struct.unpack_from(_BMP_INFO_HDR, blob, 14)
    if hdr_size < 40 or compression != 0 or bpp != 24:
        raise ValueError(f"unsupported BMP variant (hdr={hdr_size}, "
                         f"comp={compression}, bpp={bpp})")
    stride = bmp_row_stride(width)
    n_rows = abs(height)
    arr = np.frombuffer(
        blob, dtype=np.uint8, count=stride * n_rows, offset=offset
    ).reshape(n_rows, stride)
    payload = arr[:, : width * 3].tobytes()
    return width, n_rows, bpp, payload


# ---------------------------------------------------------------------------
# WAV: RIFF/WAVE with fmt + data chunks, PCM 16-bit.
# ---------------------------------------------------------------------------


def wav_encode(payload: bytes, sample_rate: int = 16000,
               channels: int = 1) -> bytes:
    """Pack ``payload`` as the little-endian int16 PCM data of a WAV
    file (zero-padded to an even byte count)."""
    if len(payload) % 2:
        payload = payload + b"\0"
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, channels, sample_rate, byte_rate,
        channels * 2, 16,
    )
    data_hdr = struct.pack("<4sI", b"data", len(payload))
    riff = struct.pack(
        "<4sI4s", b"RIFF", 4 + len(fmt) + len(data_hdr) + len(payload),
        b"WAVE",
    )
    return riff + fmt + data_hdr + payload


def wav_decode(blob: bytes) -> tuple[int, int, int, int, bytes]:
    """Parse a PCM WAV -> (sample_rate, channels, bits, n_frames,
    raw PCM bytes). Walks the chunk list, so extra chunks (LIST etc.)
    between fmt and data are handled."""
    magic, _size, wave = struct.unpack_from("<4sI4s", blob, 0)
    if magic != b"RIFF" or wave != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = channels = bits = None
    data = None
    while pos + 8 <= len(blob):
        cid, csize = struct.unpack_from("<4sI", blob, pos)
        body = blob[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            (fmt_tag, channels, rate, _brate, _align, bits) = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if fmt_tag != 1:
                raise ValueError(f"not PCM (fmt tag {fmt_tag})")
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    n_frames = len(data) // (channels * (bits // 8))
    # int16 sample view (decoders hand samples, not bytes, to DSP)
    _samples = np.frombuffer(data[: n_frames * channels * 2], dtype="<i2")
    return rate, channels, bits, n_frames, data

# ---------------------------------------------------------------------------
# PNG: 8-byte signature + IHDR / IDAT* / IEND chunks (4-byte length,
# 4-byte type, data, CRC32 over type+data).  8-bit RGB (color type 2),
# scanlines prefixed with a filter-type byte, stream deflated with zlib.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_BPP = 3  # bytes per pixel for 8-bit RGB


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec 9.4), vectorized over int16+ arrays."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def png_encode(payload: bytes, width: int, height: int) -> bytes:
    """Pack ``payload`` into the RGB pixel buffer of a width x height
    8-bit-per-channel PNG (zero-padded; payload must fit in
    width*height*3).  Each scanline uses filter type ``row % 5`` so the
    deflated stream exercises every filter; IDAT is split into 4 KiB
    chunks so decoders must concatenate."""
    import zlib

    capacity = width * height * _PNG_BPP
    if len(payload) > capacity:
        raise ValueError(f"payload {len(payload)}B > capacity {capacity}B")
    rows = (
        np.frombuffer(payload.ljust(capacity, b"\0"), dtype=np.uint8)
        .reshape(height, width * _PNG_BPP)
        .astype(np.int16)
    )
    prev = np.zeros(width * _PNG_BPP, dtype=np.int16)
    out = bytearray()
    for r in range(height):
        raw = rows[r]
        left = np.concatenate([np.zeros(_PNG_BPP, dtype=np.int16),
                               raw[:-_PNG_BPP]])
        upleft = np.concatenate([np.zeros(_PNG_BPP, dtype=np.int16),
                                 prev[:-_PNG_BPP]])
        ftype = r % 5
        if ftype == 0:
            filt = raw
        elif ftype == 1:  # Sub
            filt = raw - left
        elif ftype == 2:  # Up
            filt = raw - prev
        elif ftype == 3:  # Average
            filt = raw - (left + prev) // 2
        else:  # Paeth
            filt = raw - _paeth(left, prev, upleft)
        out.append(ftype)
        out.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prev = raw
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    comp = zlib.compress(bytes(out), 6)
    idats = b"".join(
        _png_chunk(b"IDAT", comp[i : i + 4096])
        for i in range(0, max(len(comp), 1), 4096)
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + idats
        + _png_chunk(b"IEND", b"")
    )


def png_decode(blob: bytes) -> tuple[int, int, int, int, bytes]:
    """Parse an 8-bit RGB PNG -> (width, height, bit_depth, color_type,
    pixel payload).  Walks the chunk list verifying every CRC,
    concatenates IDATs, inflates, and reverses all five scanline
    filters byte-exactly."""
    import zlib

    if blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = bit_depth = color_type = None
    idat = bytearray()
    saw_iend = False
    while pos + 8 <= len(blob):
        (clen,) = struct.unpack_from(">I", blob, pos)
        # bounds-check BEFORE slicing: a blob truncated mid-chunk must
        # fail as ValueError (the documented contract), not struct.error
        if pos + 12 + clen > len(blob):
            raise ValueError("truncated PNG (chunk extends past blob end)")
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + clen]
        (crc,) = struct.unpack_from(">I", blob, pos + 8 + clen)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            (width, height, bit_depth, color_type, comp, filt,
             interlace) = struct.unpack(">IIBBBBB", data)
            if (bit_depth, color_type, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "unsupported PNG variant (need 8-bit RGB, deflate, "
                    f"adaptive filters, no interlace; got depth={bit_depth} "
                    f"color={color_type} comp={comp} filt={filt} "
                    f"interlace={interlace})"
                )
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            saw_iend = True
            break
        pos += 12 + clen
    if width is None:
        raise ValueError("missing IHDR chunk")
    if not saw_iend:
        raise ValueError("truncated PNG (missing IEND chunk)")
    stream = zlib.decompress(bytes(idat))
    stride = width * _PNG_BPP
    if len(stream) != (stride + 1) * height:
        raise ValueError("inflated stream length != (stride+1)*height")
    rows = np.frombuffer(stream, dtype=np.uint8).reshape(height, stride + 1)
    prev = np.zeros(stride, dtype=np.int16)
    out = np.empty((height, stride), dtype=np.uint8)
    for r in range(height):
        ftype = int(rows[r, 0])
        filt = rows[r, 1:].astype(np.int16)
        if ftype == 0:
            raw = filt
        elif ftype == 1:  # Sub: per-channel lane cumsum reverses the filter
            raw = np.cumsum(
                filt.reshape(-1, _PNG_BPP), axis=0, dtype=np.int64
            ).reshape(-1) & 0xFF
            raw = raw.astype(np.int16)
        elif ftype == 2:  # Up
            raw = (filt + prev) & 0xFF
        elif ftype == 3:  # Average: left dependency -> sequential per pixel
            raw = np.zeros(stride, dtype=np.int16)
            for i in range(stride):
                left = raw[i - _PNG_BPP] if i >= _PNG_BPP else 0
                raw[i] = (filt[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth: sequential per pixel
            raw = np.zeros(stride, dtype=np.int16)
            for i in range(stride):
                a = raw[i - _PNG_BPP] if i >= _PNG_BPP else 0
                c = prev[i - _PNG_BPP] if i >= _PNG_BPP else 0
                b = prev[i]
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                raw[i] = (filt[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype}")
        out[r] = raw.astype(np.uint8)
        prev = raw.astype(np.int16)
    return width, height, bit_depth, color_type, out.tobytes()
