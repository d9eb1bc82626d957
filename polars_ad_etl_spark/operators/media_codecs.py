"""Stdlib-only media codecs: real (not faked) encode/decode for WAV audio and
BMP images, plus PNG header parsing — no PIL/librosa/pyav required.

These back the real mode of the multimodal operators
(``operators/multimodal.py``): the container ships no codec libraries, but
WAV is fully parseable with ``wave`` + ``struct``, BMP with ``struct``
alone, MP4/ISO-BMFF container *metadata* (mvhd/tkhd/mdat) is a pure
length-prefixed box tree, uncompressed AVI carries DIB frame PIXELS in
RIFF chunks, and GIF's LZW is implemented here in pure Python — so image,
audio, video-metadata, AND video/animation frame-pixel pipelines are all
genuinely end-to-end executable with no external codec.

Reference parity note: the reference repo (pepsi-monster/polars-ad-etl) has
no media path at all — this module exists for the training-data-pipeline
surface the brief adds on top.
"""

from __future__ import annotations

import io
import struct
import wave
from dataclasses import dataclass

# --------------------------------------------------------------------- WAV


@dataclass(frozen=True)
class WavMeta:
    sample_rate: int
    n_channels: int
    sample_width: int  # bytes per sample
    n_frames: int

    @property
    def duration_ms(self) -> int:
        return self.n_frames * 1000 // self.sample_rate


def encode_wav(
    samples: list[int], sample_rate: int, n_channels: int = 1
) -> bytes:
    """PCM16 WAV encode via the stdlib ``wave`` writer. ``samples`` is the
    interleaved int16 sample sequence (len must be a multiple of
    n_channels)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(blob: bytes) -> tuple[WavMeta, list[int]]:
    """Parse a WAV container: header metadata + decoded int16 samples."""
    with wave.open(io.BytesIO(blob), "rb") as w:
        meta = WavMeta(
            sample_rate=w.getframerate(),
            n_channels=w.getnchannels(),
            sample_width=w.getsampwidth(),
            n_frames=w.getnframes(),
        )
        raw = w.readframes(meta.n_frames)
    if meta.sample_width != 2:
        raise ValueError(f"only PCM16 supported, got width={meta.sample_width}")
    n = len(raw) // 2
    return meta, list(struct.unpack(f"<{n}h", raw))


# --------------------------------------------------------------------- BMP
# 24-bit uncompressed BI_RGB, BITMAPINFOHEADER — the classic 54-byte-header
# layout. Rows are stored bottom-up and padded to 4-byte boundaries.


@dataclass(frozen=True)
class BmpMeta:
    width: int
    height: int
    bits_per_pixel: int


def encode_bmp(width: int, height: int, pixels: list[tuple[int, int, int]]) -> bytes:
    """24-bit BMP encode. ``pixels`` is row-major top-down [(r, g, b), ...]
    of length width*height."""
    if len(pixels) != width * height:
        raise ValueError("pixel count != width*height")
    row_pad = (-(width * 3)) % 4
    row_size = width * 3 + row_pad
    image_size = row_size * height
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + image_size, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up storage order
        row = bytearray()
        for x in range(width):
            r, g, b = pixels[y * width + x]
            row += bytes((b, g, r))  # BGR byte order
        row += bytes(row_pad)
        rows.append(bytes(row))
    return header + b"".join(rows)


def decode_bmp(blob: bytes) -> tuple[BmpMeta, list[tuple[int, int, int]]]:
    """Parse a 24-bit BI_RGB BMP: header metadata + row-major top-down RGB
    pixels (padding stripped, bottom-up order undone)."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP (missing BM magic)")
    data_offset = struct.unpack_from("<I", blob, 10)[0]
    hdr_size, width, height, _planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", blob, 14
    )
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={compression})")
    top_down = height < 0
    height = abs(height)
    row_size = (width * 3 + 3) & ~3
    pixels: list[tuple[int, int, int]] = [(0, 0, 0)] * (width * height)
    for row_idx in range(height):
        y = row_idx if top_down else height - 1 - row_idx
        base = data_offset + row_idx * row_size
        for x in range(width):
            b, g, r = blob[base + 3 * x : base + 3 * x + 3]
            pixels[y * width + x] = (r, g, b)
    return BmpMeta(width=width, height=height, bits_per_pixel=bpp), pixels


def resize_nearest(
    pixels: list[tuple[int, int, int]],
    src_w: int,
    src_h: int,
    dst_w: int,
    dst_h: int,
) -> list[tuple[int, int, int]]:
    """Nearest-neighbor resample (the real counterpart of the fake resizer)."""
    out: list[tuple[int, int, int]] = []
    for y in range(dst_h):
        sy = min(y * src_h // dst_h, src_h - 1)
        for x in range(dst_w):
            sx = min(x * src_w // dst_w, src_w - 1)
            out.append(pixels[sy * src_w + sx])
    return out


# --------------------------------------------------------------------- PNG


@dataclass(frozen=True)
class PngMeta:
    width: int
    height: int
    bit_depth: int
    color_type: int


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_png_header(blob: bytes) -> PngMeta:
    """Parse the IHDR chunk of a PNG (dimensions + depth); the full pixel
    decode (zlib inflate + scanline de-filtering) lives in
    :func:`decode_png` below."""
    if blob[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG (bad magic)")
    if len(blob) < 33:  # magic + complete IHDR chunk
        raise ValueError("truncated PNG (incomplete IHDR)")
    length, ctype = struct.unpack_from(">I4s", blob, 8)
    if ctype != b"IHDR" or length != 13:
        raise ValueError("PNG missing IHDR as first chunk")
    width, height, bit_depth, color_type = struct.unpack_from(">IIBB", blob, 16)
    return PngMeta(width, height, bit_depth, color_type)


def sniff_media_container(blob: bytes) -> str:
    """Container detection from magic bytes (the real-world dispatch step)."""
    if blob[:2] == b"BM":
        return "bmp"
    if blob[:8] == _PNG_MAGIC:
        return "png"
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return "wav"
    if blob[:4] == b"RIFF" and blob[8:12] == b"AVI ":
        return "avi"
    if blob[:4] == b"GIF8":
        return "gif"
    if blob[4:8] == b"ftyp":
        return "mp4"
    return "unknown"


# --------------------------------------------------------------------- AVI
# RIFF 'AVI ' with uncompressed 24-bit DIB frames in '00db' chunks — the one
# VIDEO format whose frame PIXELS are decodable with struct alone (each frame
# is a BMP-style BGR24 bottom-up padded bitmap). This closes the last
# multimodal stub: real frame-pixel decode with no codec library.
#
# Layout (verbatim from the public AVI RIFF spec):
#   RIFF('AVI ')
#     LIST('hdrl')
#       'avih' 56-byte main header (usec/frame, total frames, streams, w, h)
#       LIST('strl')
#         'strh' 56-byte stream header (fccType='vids', handler='DIB ',
#                scale/rate = frame timing, length = frame count)
#         'strf' 40-byte BITMAPINFOHEADER (bpp=24, compression=BI_RGB)
#     LIST('movi')
#       '00db' uncompressed frame  (x n_frames)
#     'idx1' 16-byte entry per frame


@dataclass(frozen=True)
class AviMeta:
    width: int
    height: int
    n_frames: int
    usec_per_frame: int

    @property
    def duration_ms(self) -> int:
        return self.n_frames * self.usec_per_frame // 1000


def _riff_chunk(tag: bytes, payload: bytes) -> bytes:
    # RIFF chunks are word-aligned: odd payloads get a pad byte not counted
    # in the declared size.
    return tag + struct.pack("<I", len(payload)) + payload + (b"\0" if len(payload) % 2 else b"")


def _riff_list(kind: bytes, payload: bytes) -> bytes:
    return _riff_chunk(b"LIST", kind + payload)


def _pack_dib_frame(width: int, height: int, pixels: list[tuple[int, int, int]]) -> bytes:
    row_pad = (-(width * 3)) % 4
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(width):
            r, g, b = pixels[y * width + x]
            row += bytes((b, g, r))
        row += bytes(row_pad)
        rows.append(bytes(row))
    return b"".join(rows)


def _unpack_dib_frame(
    buf: bytes, width: int, height: int
) -> list[tuple[int, int, int]]:
    row_size = (width * 3 + 3) & ~3
    pixels: list[tuple[int, int, int]] = [(0, 0, 0)] * (width * height)
    for row_idx in range(height):
        y = height - 1 - row_idx
        base = row_idx * row_size
        for x in range(width):
            b, g, r = buf[base + 3 * x : base + 3 * x + 3]
            pixels[y * width + x] = (r, g, b)
    return pixels


def encode_avi(
    width: int,
    height: int,
    frames: list[list[tuple[int, int, int]]],
    usec_per_frame: int = 100_000,
) -> bytes:
    """Uncompressed 24-bit AVI encode. Each frame is row-major top-down
    [(r, g, b), ...] of length width*height."""
    for f in frames:
        if len(f) != width * height:
            raise ValueError("frame pixel count != width*height")
    frame_bufs = [_pack_dib_frame(width, height, f) for f in frames]
    frame_size = len(frame_bufs[0]) if frame_bufs else 0
    avih = _riff_chunk(
        b"avih",
        struct.pack(
            "<14I",
            usec_per_frame, frame_size * 10, 0, 0x10,  # usec, maxbytes/s, pad, HASINDEX
            len(frames), 0, 1, frame_size,             # frames, initial, streams, bufsize
            width, height, 0, 0, 0, 0,                 # w, h, reserved[4]
        ),
    )
    strh = _riff_chunk(
        b"strh",
        b"vids" + b"DIB "
        + struct.pack(
            "<IHHIIIIIIII",
            0, 0, 0, 0,                         # flags, prio, lang, initialframes
            usec_per_frame, 1_000_000,          # scale, rate -> fps = rate/scale
            0, len(frames), frame_size, 0, 0,   # start, length, bufsize, quality, samplesize
        )
        + struct.pack("<4H", 0, 0, width, height),
    )
    strf = _riff_chunk(
        b"strf",
        struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 24, 0, frame_size, 0, 0, 0, 0
        ),
    )
    hdrl = _riff_list(b"hdrl", avih + _riff_list(b"strl", strh + strf))
    movi_payload = b"".join(_riff_chunk(b"00db", fb) for fb in frame_bufs)
    movi = _riff_list(b"movi", movi_payload)
    idx_entries, off = [], 4  # offsets are relative to the 'movi' fourcc
    for fb in frame_bufs:
        idx_entries.append(struct.pack("<4sIII", b"00db", 0x10, off, len(fb)))
        off += 8 + len(fb) + (len(fb) % 2)
    idx1 = _riff_chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_riff(blob: bytes, start: int, end: int):
    off = start
    while off + 8 <= end:
        tag, size = struct.unpack_from("<4sI", blob, off)
        if off + 8 + size > end:
            raise ValueError(f"corrupt RIFF chunk {tag!r} at {off}")
        yield tag, off + 8, off + 8 + size
        off += 8 + size + (size % 2)  # word alignment


def decode_avi(blob: bytes) -> tuple[AviMeta, list[list[tuple[int, int, int]]]]:
    """Parse an uncompressed 24-bit AVI: header metadata + the decoded RGB
    pixels of EVERY frame (row-major top-down, bottom-up storage undone)."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not an AVI (bad RIFF magic)")
    width = height = n_frames = usec = None
    bpp = compression = None
    frames: list[list[tuple[int, int, int]]] = []
    movi_spans: list[tuple[int, int]] = []
    # clamp to the actual buffer so truncated blobs fail the walk's bounds
    # check (ValueError) instead of an out-of-range struct read
    end = min(8 + struct.unpack_from("<I", blob, 4)[0], len(blob))
    for tag, body, bend in _walk_riff(blob, 12, end):
        if tag != b"LIST":
            continue
        kind = blob[body : body + 4]
        if kind == b"hdrl":
            for t2, b2, e2 in _walk_riff(blob, body + 4, bend):
                if t2 == b"avih":
                    vals = struct.unpack_from("<14I", blob, b2)
                    usec, n_frames, width, height = vals[0], vals[4], vals[8], vals[9]
                elif t2 == b"LIST" and blob[b2 : b2 + 4] == b"strl":
                    for t3, b3, _e3 in _walk_riff(blob, b2 + 4, e2):
                        if t3 == b"strf":
                            _sz, _w, _h, _pl, bpp, compression = struct.unpack_from(
                                "<IiiHHI", blob, b3
                            )
        elif kind == b"movi":
            for t2, b2, e2 in _walk_riff(blob, body + 4, bend):
                if t2 in (b"00db", b"00dc"):
                    movi_spans.append((b2, e2))
    if None in (width, height, n_frames, usec):
        raise ValueError("AVI missing avih header")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB AVI supported (bpp={bpp}, comp={compression})")
    for b2, e2 in movi_spans:
        frames.append(_unpack_dib_frame(blob[b2:e2], width, height))
    if len(frames) != n_frames:
        raise ValueError(f"frame count mismatch: header {n_frames}, movi {len(frames)}")
    return AviMeta(width, height, n_frames, usec), frames


# --------------------------------------------------------------------- MP4
# ISO BMFF is a pure length-prefixed box tree, so container METADATA is
# fully parseable with struct alone: mvhd carries timescale+duration, tkhd
# carries the track's 16.16 fixed-point width/height, mdat the payload.
# Frame PIXEL decode genuinely needs a video codec and stays stubbed — but
# the container walk below is real parsing, not a fake.


@dataclass(frozen=True)
class Mp4Meta:
    width: int
    height: int
    timescale: int
    duration_units: int

    @property
    def duration_ms(self) -> int:
        return self.duration_units * 1000 // self.timescale


def _box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + tag + payload


_MATRIX = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def encode_mp4(
    width: int, height: int, duration_units: int,
    payload: bytes = b"", timescale: int = 600,
) -> bytes:
    """Minimal valid ISO BMFF: ftyp + moov(mvhd, trak(tkhd)) + mdat."""
    mvhd = _box(
        b"mvhd",
        struct.pack(">II", 0, 0)            # version/flags, ctime
        + struct.pack(">I", 0)              # mtime
        + struct.pack(">II", timescale, duration_units)
        + struct.pack(">I", 0x00010000)     # rate 1.0
        + struct.pack(">H", 0x0100)         # volume 1.0
        + b"\0" * 10                        # reserved
        + _MATRIX
        + b"\0" * 24                        # pre_defined
        + struct.pack(">I", 2),             # next_track_id
    )
    tkhd = _box(
        b"tkhd",
        struct.pack(">I", 7)                # version 0, flags enabled
        + struct.pack(">II", 0, 0)          # ctime, mtime
        + struct.pack(">II", 1, 0)          # track_id, reserved
        + struct.pack(">I", duration_units)
        + b"\0" * 8                         # reserved
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer, alt_group, volume, rsvd
        + _MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    return ftyp + _box(b"moov", mvhd + _box(b"trak", tkhd)) + _box(b"mdat", payload)


def _walk_boxes(blob: bytes, start: int, end: int):
    off = start
    while off + 8 <= end:
        size, tag = struct.unpack_from(">I4s", blob, off)
        if size < 8 or off + size > end:
            raise ValueError(f"corrupt box {tag!r} at {off}")
        yield tag, off + 8, off + size
        off += size


def decode_mp4(blob: bytes) -> tuple[Mp4Meta, bytes]:
    """Parse the box tree: (Mp4Meta from mvhd+tkhd, raw mdat payload)."""
    timescale = duration = width = height = None
    payload = b""
    for tag, body, bend in _walk_boxes(blob, 0, len(blob)):
        if tag == b"moov":
            for t2, b2, e2 in _walk_boxes(blob, body, bend):
                if t2 == b"mvhd":
                    timescale, duration = struct.unpack_from(">II", blob, b2 + 12)
                elif t2 == b"trak":
                    for t3, b3, e3 in _walk_boxes(blob, b2, e2):
                        if t3 == b"tkhd":
                            w16, h16 = struct.unpack_from(">II", blob, e3 - 8)
                            width, height = w16 >> 16, h16 >> 16
        elif tag == b"mdat":
            payload = blob[body:bend]
    if None in (timescale, duration, width, height):
        raise ValueError("missing mvhd/tkhd metadata")
    return Mp4Meta(width, height, timescale, duration), payload


# --------------------------------------------------------------------- GIF
# GIF89a with REAL LZW compression, pure Python — the second video/animation
# format with full frame-PIXEL decode (AVI above is uncompressed; this one
# exercises an actual compression codec round-trip). Global color table,
# full-frame images, no interlace/transparency. LZW uses GIF's "late change"
# code-size timing: the decoder grows its code size when its next slot hits
# the current max; the encoder mirrors that one step later (its dictionary
# is one entry ahead of the decoder at emit time), and both reset via an
# explicit CLEAR when the 12-bit table fills.


@dataclass(frozen=True)
class GifMeta:
    width: int
    height: int
    n_frames: int
    delay_cs: int  # centiseconds per frame

    @property
    def duration_ms(self) -> int:
        return self.n_frames * self.delay_cs * 10


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, size: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += size
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    bw = _BitWriter()

    def reset():
        return {(i,): i for i in range(clear)}, end + 1, min_code_size + 1

    table, next_code, code_size = reset()
    bw.write(clear, code_size)
    w: tuple[int, ...] = ()
    for k in indices:
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        bw.write(table[w], code_size)
        table[wk] = next_code
        next_code += 1
        # late change: the decoder's slot counter trails ours by one
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        if next_code == 4097:  # 12-bit table full -> explicit CLEAR
            bw.write(clear, code_size)
            table, next_code, code_size = reset()
        w = (k,)
    if w:
        bw.write(table[w], code_size)
    bw.write(end, code_size)
    return bw.finish()


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    pos = 0  # bit position

    def read(size: int) -> int:
        nonlocal pos
        out = 0
        for b in range(size):
            byte = data[(pos + b) >> 3]
            out |= ((byte >> ((pos + b) & 7)) & 1) << b
        pos += size
        return out

    table: dict[int, tuple[int, ...]] = {}
    code_size = min_code_size + 1
    next_code = end + 1
    prev: tuple[int, ...] | None = None
    out: list[int] = []
    total_bits = len(data) * 8
    while pos + code_size <= total_bits:
        code = read(code_size)
        if code == clear:
            table = {i: (i,) for i in range(clear)}
            code_size = min_code_size + 1
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < next_code:
            entry = table[code] if code < clear else table[code]
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        elif code == next_code:
            entry = prev + (prev[0],)
            table[next_code] = entry
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        else:
            raise ValueError(f"corrupt LZW stream: code {code} > {next_code}")
        out.extend(entry)
        prev = entry
    return out


def _sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    width: int,
    height: int,
    frames: list[list[tuple[int, int, int]]],
    delay_cs: int = 10,
) -> bytes:
    """GIF89a encode: global color table from the union palette (<= 256
    colors), one full-frame image per frame, real LZW compression."""
    palette: list[tuple[int, int, int]] = []
    index: dict[tuple[int, int, int], int] = {}
    for f in frames:
        if len(f) != width * height:
            raise ValueError("frame pixel count != width*height")
        for px in f:
            if px not in index:
                index[px] = len(palette)
                palette.append(px)
    if len(palette) > 256:
        raise ValueError("more than 256 distinct colors")
    depth = max(2, 1 << max(1, (len(palette) - 1).bit_length()))
    gct_bits = depth.bit_length() - 1  # depth = 2^gct_bits
    out = bytearray(b"GIF89a")
    out += struct.pack(
        "<HHBBB", width, height, 0x80 | ((gct_bits - 1) & 7), 0, 0
    )
    for i in range(depth):
        out += bytes(palette[i] if i < len(palette) else (0, 0, 0))
    min_code = max(2, gct_bits)
    for f in frames:
        out += b"\x21\xf9" + bytes((4, 0)) + struct.pack("<H", delay_cs) + b"\0\0"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out.append(min_code)
        out += _sub_blocks(_lzw_encode([index[px] for px in f], min_code))
    out += b"\x3b"
    return bytes(out)


def decode_gif(blob: bytes) -> tuple[GifMeta, list[list[tuple[int, int, int]]]]:
    """GIF89a/87a parse: global color table + per-frame LZW decode back to
    row-major RGB pixels."""
    if blob[:4] != b"GIF8":
        raise ValueError("not a GIF (bad magic)")
    width, height, packed, _bg, _ar = struct.unpack_from("<HHBBB", blob, 6)
    off = 13
    palette: list[tuple[int, int, int]] = []
    if packed & 0x80:
        n = 2 << (packed & 7)
        for i in range(n):
            palette.append(tuple(blob[off + 3 * i : off + 3 * i + 3]))
        off += 3 * n
    frames: list[list[tuple[int, int, int]]] = []
    delay_cs = 0
    while off < len(blob):
        marker = blob[off]
        off += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension
            label = blob[off]
            off += 1
            if label == 0xF9:  # graphic control: read the frame delay
                size = blob[off]
                delay_cs = struct.unpack_from("<H", blob, off + 2)[0]
            while True:  # skip sub-blocks
                size = blob[off]
                off += 1 + size
                if size == 0:
                    break
            continue
        if marker == 0x2C:  # image descriptor
            _l, _t, w, h, ipacked = struct.unpack_from("<HHHHB", blob, off)
            off += 9
            if ipacked & 0x80:
                raise ValueError("local color tables not supported")
            if ipacked & 0x40:
                raise ValueError("interlaced GIF not supported")
            min_code = blob[off]
            off += 1
            data = bytearray()
            while True:
                size = blob[off]
                off += 1
                data += blob[off : off + size]
                off += size
                if size == 0:
                    break
            idx = _lzw_decode(bytes(data), min_code)
            if len(idx) != w * h:
                raise ValueError(
                    f"frame decoded {len(idx)} pixels, expected {w * h}"
                )
            frames.append([palette[i] for i in idx])
            continue
        raise ValueError(f"unknown GIF block marker 0x{marker:02x} at {off - 1}")
    return GifMeta(width, height, len(frames), delay_cs), frames


# ----------------------------------------------------------- PNG (pixels)
# Full truecolor PNG decode — zlib inflate IS stdlib, so the only real work
# is scanline de-filtering (None/Sub/Up/Average/Paeth). The encoder can
# emit any of the five filters per row; the decoder reverses all of them —
# encoding the same image under every filter and getting identical pixels
# back is the internal-consistency proof the tests run. 8-bit RGB (color
# type 2), no interlace, no palette.


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload))
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(
    width: int,
    height: int,
    pixels: list[tuple[int, int, int]],
    filter_type: int = 0,
) -> bytes:
    """Truecolor 8-bit PNG encode with the chosen per-row filter (0-4) and
    real zlib compression. ``pixels`` is row-major top-down."""
    import zlib

    if len(pixels) != width * height:
        raise ValueError("pixel count != width*height")
    if not 0 <= filter_type <= 4:
        raise ValueError(f"invalid filter {filter_type}")
    bpp = 3
    raw = bytearray()
    prev_row = bytes(width * bpp)
    for y in range(height):
        row = bytearray()
        for x in range(width):
            row += bytes(pixels[y * width + x])
        filt = bytearray([filter_type])
        for i in range(len(row)):
            a = row[i - bpp] if i >= bpp else 0
            b = prev_row[i]
            c = prev_row[i - bpp] if i >= bpp else 0
            if filter_type == 0:
                v = row[i]
            elif filter_type == 1:
                v = (row[i] - a) & 0xFF
            elif filter_type == 2:
                v = (row[i] - b) & 0xFF
            elif filter_type == 3:
                v = (row[i] - ((a + b) >> 1)) & 0xFF
            else:
                v = (row[i] - _paeth(a, b, c)) & 0xFF
            filt.append(v)
        raw += filt
        prev_row = bytes(row)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(blob: bytes) -> tuple[PngMeta, list[tuple[int, int, int]]]:
    """Full truecolor PNG decode: inflate IDAT, reverse per-row filters,
    return row-major top-down RGB pixels."""
    import zlib

    meta = decode_png_header(blob)
    if meta.bit_depth != 8 or meta.color_type != 2:
        raise ValueError(
            f"only 8-bit truecolor supported (depth={meta.bit_depth}, "
            f"color_type={meta.color_type})"
        )
    interlace = blob[16 + 12]
    if interlace:
        raise ValueError("interlaced PNG not supported")
    idat = bytearray()
    off = 8
    while off + 8 <= len(blob):
        length, tag = struct.unpack_from(">I4s", blob, off)
        body = blob[off + 8 : off + 8 + length]
        if tag == b"IDAT":
            idat += body
        off += 12 + length
        if tag == b"IEND":
            break
    raw = zlib.decompress(bytes(idat))
    bpp = 3
    stride = meta.width * bpp
    if len(raw) != meta.height * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out: list[tuple[int, int, int]] = []
    prev = bytearray(stride)
    pos = 0
    for _y in range(meta.height):
        ftype = raw[pos]
        pos += 1
        row = bytearray(raw[pos : pos + stride])
        pos += stride
        for i in range(stride):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ftype == 0:
                pass
            elif ftype == 1:
                row[i] = (row[i] + a) & 0xFF
            elif ftype == 2:
                row[i] = (row[i] + b) & 0xFF
            elif ftype == 3:
                row[i] = (row[i] + ((a + b) >> 1)) & 0xFF
            elif ftype == 4:
                row[i] = (row[i] + _paeth(a, b, c)) & 0xFF
            else:
                raise ValueError(f"unknown PNG filter {ftype}")
        for x in range(meta.width):
            out.append(tuple(row[x * bpp : x * bpp + bpp]))
        prev = row
    return meta, out
