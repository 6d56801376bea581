"""Real multimodal codecs implementable without external media libs:
uncompressed 24-bit BMP (BITMAPINFOHEADER) and 16-bit PCM WAV (RIFF).

These replace the decode STUB for formats whose byte layout is fully
specified by struct-packable headers + raw sample data — the honest
boundary in this environment: compressed codecs (JPEG/MP3/H.264) stay
behind the documented stub in ``multimodal._decode_stub`` because
their decoders genuinely need external libraries.

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
