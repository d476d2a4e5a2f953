"""Pure-numpy media codecs: 8-bit grayscale BMP, 16-bit PCM WAV, and
Y4M (YUV4MPEG2) raw video.

Deterministic, dependency-free (bytes + numpy only) so the multimodal
pipeline (multimodal.py) has a REAL end-to-end decode path in this
container — no PIL/torchaudio/ffmpeg needed. Production adds richer
codecs by injecting a ``decoder=`` into the multimodal operators; these
built-ins make BMP images, PCM WAV audio, and Y4M video first-class out
of the box.

Formats follow the public specs exactly:
  * BMP: BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER (40 B) + 256-entry
    grayscale palette, 8 bits/pixel, uncompressed, rows stored
    BOTTOM-UP and padded to 4-byte multiples.
  * WAV: RIFF/WAVE with a 16-byte 'fmt ' chunk (PCM, mono, 16-bit LE)
    and a 'data' chunk; the decoder walks chunks, so extra chunks
    (LIST/INFO) are tolerated.
  * Y4M: the YUV4MPEG2 stream header ("YUV4MPEG2 W.. H.. F.. ... Cmono")
    followed by per-frame "FRAME[ params]\\n" markers and raw planes;
    the mono colorspace (one 8-bit luma plane per frame) is used so a
    frame is exactly a (h, w) grayscale image. The decoder tolerates
    unknown header/frame parameters, per spec.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# BMP (8-bit grayscale, palettized)
# ---------------------------------------------------------------------------

_BMP_HEADER_SIZE = 14 + 40 + 256 * 4


def encode_bmp_gray(pixels: "np.ndarray") -> bytes:
    """(h, w) uint8 array → 8-bit palettized grayscale BMP bytes."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 2:
        raise ValueError(f"encode_bmp_gray expects a 2-D array, got shape {px.shape}")
    h, w = px.shape
    row_size = (w + 3) // 4 * 4  # rows padded to 4-byte multiples
    img_size = row_size * h
    file_size = _BMP_HEADER_SIZE + img_size
    out = bytearray()
    out += struct.pack("<2sIHHI", b"BM", file_size, 0, 0, _BMP_HEADER_SIZE)
    out += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, img_size, 2835, 2835, 256, 0)
    pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)  # B,G,R
    out += np.hstack([pal, np.zeros((256, 1), np.uint8)]).tobytes()
    padded = np.zeros((h, row_size), dtype=np.uint8)
    padded[:, :w] = px
    out += padded[::-1].tobytes()  # bottom-up row order
    return bytes(out)


def decode_bmp_gray(payload: bytes) -> "np.ndarray":
    """8-bit uncompressed BMP bytes → (h, w) uint8 array (top-down)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    header_size, w, h = struct.unpack_from("<Iii", payload, 14)
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    planes, bitcount, compression = struct.unpack_from("<HHI", payload, 26)
    if bitcount != 8 or compression != 0:
        raise NotImplementedError(
            f"only 8-bit uncompressed BMP supported (got {bitcount}-bit, "
            f"compression={compression})"
        )
    bottom_up = h > 0
    h = abs(h)
    row_size = (w + 3) // 4 * 4
    raw = np.frombuffer(payload, dtype=np.uint8, count=row_size * h, offset=data_offset)
    rows = raw.reshape(h, row_size)[:, :w]
    return rows[::-1].copy() if bottom_up else rows.copy()


# ---------------------------------------------------------------------------
# WAV (PCM 16-bit LE, mono)
# ---------------------------------------------------------------------------


def encode_wav_pcm16(samples: "np.ndarray", sample_rate: int = 8000) -> bytes:
    """1-D int16 array → RIFF/WAVE bytes (PCM, mono, 16-bit LE)."""
    s = np.asarray(samples, dtype="<i2").ravel()
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm16(payload: bytes) -> tuple["np.ndarray", int]:
    """RIFF/WAVE bytes → (1-D int16 sample array, sample_rate). Walks
    chunks, so payloads with extra LIST/INFO chunks decode fine."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise NotImplementedError(
                    f"only mono 16-bit PCM supported (fmt={audio_fmt}, "
                    f"ch={channels}, bits={bits})"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV payload missing fmt/data chunk")
    return np.frombuffer(data, dtype="<i2").copy(), rate


# ---------------------------------------------------------------------------
# Y4M / YUV4MPEG2 (mono: one 8-bit luma plane per frame)
# ---------------------------------------------------------------------------

_Y4M_MAGIC = b"YUV4MPEG2"


def encode_y4m_mono(frames: "np.ndarray", fps: tuple[int, int] = (25, 1)) -> bytes:
    """(n, h, w) uint8 array → YUV4MPEG2 bytes (Cmono: one luma plane
    per frame, no chroma)."""
    f = np.asarray(frames, dtype=np.uint8)
    if f.ndim != 3:
        raise ValueError(f"encode_y4m_mono expects an (n, h, w) array, got {f.shape}")
    n, h, w = f.shape
    out = bytearray()
    out += b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 Cmono\n" % (w, h, fps[0], fps[1])
    for i in range(n):
        out += b"FRAME\n"
        out += f[i].tobytes()
    return bytes(out)


def decode_y4m_mono(payload: bytes) -> tuple["np.ndarray", tuple[int, int]]:
    """YUV4MPEG2 (Cmono) bytes → ((n, h, w) uint8 array, (fps_num,
    fps_den)). Unknown stream/frame parameters are skipped per spec."""
    if not payload.startswith(_Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    w = h = None
    fps = (25, 1)
    cs = "420"  # the spec default when no C tag is present
    for tok in payload[len(_Y4M_MAGIC) : nl].split():
        tag, val = chr(tok[0]), tok[1:].decode("ascii")
        if tag == "W":
            w = int(val)
        elif tag == "H":
            h = int(val)
        elif tag == "F":
            num, den = val.split(":")
            fps = (int(num), int(den))
        elif tag == "C":
            cs = val
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    if cs != "mono":
        raise NotImplementedError(
            f"only Cmono Y4M supported in-container (got C{cs}); inject a "
            "decoder= for chroma-subsampled streams"
        )
    frame_size = w * h
    frames = []
    pos = nl + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        fnl = payload.index(b"\n", pos)  # frame params (if any) run to \n
        start = fnl + 1
        frames.append(
            np.frombuffer(payload, dtype=np.uint8, count=frame_size, offset=start).reshape(
                h, w
            )
        )
        pos = start + frame_size
    return (
        np.stack(frames) if frames else np.empty((0, h, w), dtype=np.uint8),
        fps,
    )
