"""Dependency-free GIF codec (pure numpy + python LZW).

Round 6: with PPM/BMP (`imagecodec.py`), baseline+progressive JPEG
(`jpegcodec.py`/`jpegprogressive.py`) and PNG (`pngcodec.py`), GIF
closes out the still-image formats a web corpus actually contains —
all implemented from the public specs (GIF87a/89a), no PIL.

Coverage, stated honestly:
- decode: GIF87a + GIF89a, global and local color tables, interlaced
  images (the 4-pass row order), full LZW with clear-code resets and
  variable code widths up to 12 bits. Animations composite fully
  (round 7): :func:`decode_gif_frames` honors the Graphic Control
  Extension's transparency and disposal methods 1/2/3 per GIF89a §23
  and emits one canvas snapshot per frame (bounded by an absolute
  decode-bytes budget); :func:`decode_gif` returns the first frame,
  :func:`gif_frame_count` counts structurally. Alpha is dropped
  (same contract as the other codecs) — transparency only controls
  which canvas pixels a frame leaves untouched.
- encode: :func:`encode_gif_frames` writes multi-frame GIF89a with
  per-frame GCEs (disposal/transparency/interlace);
  :func:`encode_gif` is its single-frame wrapper. Exact palette from
  the image's colors (raises past 256 — these encoders exist for
  roundtrip oracles, not for quantizing photos), standard LZW with
  dictionary resets at 4096 codes.

Executor-side kernel for Arrow-batched ``mapInPandas`` stages; LZW is
scalar Python (the honest cost of a dependency-free entropy layer,
same stance as the JPEG Huffman coder).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_gif",
    "encode_gif",
    "decode_gif_frames",
    "encode_gif_frames",
    "gif_frame_count",
]


# --------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, variable width 3..12)
# --------------------------------------------------------------------------
def _lzw_encode(indices, mcs: int) -> bytes:
    clear = 1 << mcs
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    # Width growth follows the giflib/ncompress convention the real
    # world writes and expects: after EMITTING a code (and before
    # assigning this miss's new entry), grow when the next code to
    # assign has reached 2^width; the decoder mirrors it by counting
    # every code it reads. (The ±1 "early change" variant is TIFF's,
    # not GIF's.)
    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    width = mcs + 1
    emit(clear, width)
    buf: tuple = ()

    def bump() -> None:
        nonlocal width
        if next_code >= (1 << width) and width < 12:
            width += 1

    for sym in indices:
        cand = buf + (int(sym),)
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        bump()
        if next_code >= 4095:  # stay inside every decoder's 12-bit cap
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = mcs + 1
        else:
            table[cand] = next_code
            next_code += 1
        buf = (int(sym),)
    if buf:
        emit(table[buf], width)
        bump()
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, mcs: int, expected: int) -> np.ndarray:
    clear = 1 << mcs
    end = clear + 1
    pos = 0
    acc = 0
    nbits = 0

    def read(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        v = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return v

    # Allocation sanity (review r6 fuzz): one LZW code is ≥ 3 bits
    # and emits ≤ 4096 pixels, so data shorter than expected/10923
    # bytes cannot be legitimate — reject corrupt dimensions before
    # attempting a multi-GB buffer.
    if expected > max(1, len(data)) * 10923:
        raise ValueError(
            f"GIF declares {expected} pixels but carries only "
            f"{len(data)} LZW bytes"
        )
    out = np.empty(expected, dtype=np.uint8)
    n = 0
    table: list = [bytes((i,)) for i in range(clear)] + [b"", b""]
    width = mcs + 1
    running = clear + 2  # giflib sync: counts EVERY code read
    prev: bytes | None = None
    while n < expected:
        code = read(width)
        if running < 4097:
            running += 1
            if running > (1 << width) and width < 12:
                width += 1
        if code == clear:
            table = [bytes((i,)) for i in range(clear)] + [b"", b""]
            width = mcs + 1
            running = clear + 2
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        take = min(len(entry), expected - n)
        out[n : n + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n += take
        prev = entry
    if n < expected:
        raise ValueError(
            f"GIF pixel data ended early: {n} of {expected}"
        )
    return out


# --------------------------------------------------------------------------
# container
# --------------------------------------------------------------------------
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))

# Absolute budget for a composited animation's decoded bytes (the
# same shape as tiffcodec's page budget): ~620 VGA frames / a 25 s
# 25 fps clip — generous for real corpora, refusing the multi-GB
# crafted amplification payloads (review r7, 4th pass).
_MAX_DECODED_BYTES = 1 << 29


def encode_gif(arr: np.ndarray, interlace: bool = False) -> bytes:
    """(H, W, 3) uint8 RGB → single-frame GIF89a bytes. The palette
    is the image's exact color set (≤ 256, else ValueError).
    Delegates to :func:`encode_gif_frames` (review r7: the container
    layout lived twice); a GCE-less single frame, so the byte layout
    matches the classic single-frame form."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3), got {a.shape}")
    h, w, _ = a.shape
    palette, indices = np.unique(
        a.reshape(-1, 3), axis=0, return_inverse=True
    )
    if len(palette) > 256:
        raise ValueError(
            f"{len(palette)} distinct colors: this roundtrip encoder "
            "does not quantize (max 256)"
        )
    return encode_gif_frames(
        (w, h),
        palette,
        [(0, 0, indices.reshape(h, w), 0, None, interlace)],
    )


def _parse_frames(payload: bytes, first_only: bool):
    """Decoded (H, W, 3) frames in stream order. Truncation anywhere
    (mid-sub-block, mid-descriptor) surfaces as ValueError — the
    documented malformed-payload contract, not IndexError/struct.error
    (review r6)."""
    try:
        return _parse_frames_unchecked(payload, first_only)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated GIF stream: {exc}") from exc


def _parse_frames_unchecked(payload: bytes, first_only: bool):
    d = payload
    if d[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (missing GIF87a/89a)")
    w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", d, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 1 << ((packed & 0x07) + 1)
        gct = np.frombuffer(d, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    frames = []
    gce = None  # (disposal, transparent index | None) — one-shot
    while pos < len(d):
        block = d[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            label = d[pos]
            pos += 1
            first_sub = None
            while d[pos] != 0:
                ln = d[pos]
                if first_sub is None:
                    first_sub = d[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            if label == 0xF9 and first_sub and len(first_sub) >= 4:
                # Graphic Control Extension: packed(disposal bits
                # 2-4, transparency flag bit 0), delay, trans index.
                # Applies to the NEXT image block only (GIF89a §23).
                gpk = first_sub[0]
                gce = (
                    (gpk >> 2) & 0x7,
                    first_sub[3] if gpk & 0x1 else None,
                )
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, fw, fh, ipk = struct.unpack_from("<HHHHB", d, pos)
        pos += 9
        ct = gct
        if ipk & 0x80:  # local color table
            n = 1 << ((ipk & 0x07) + 1)
            ct = np.frombuffer(d, np.uint8, n * 3, pos).reshape(-1, 3)
            pos += n * 3
        if ct is None:
            raise ValueError("GIF image with no color table")
        mcs = d[pos]
        pos += 1
        data = bytearray()
        while d[pos] != 0:
            ln = d[pos]
            data += d[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(bytes(data), mcs, fw * fh).reshape(fh, fw)
        if ipk & 0x40:  # interlaced: invert the 4-pass row order
            order = [
                y
                for start, step in _INTERLACE_PASSES
                for y in range(start, fh, step)
            ]
            un = np.empty_like(idx)
            un[order] = idx
            idx = un
        if int(idx.max(initial=0)) >= len(ct):
            raise ValueError("GIF index out of color-table range")
        disposal, trans = gce if gce is not None else (0, None)
        gce = None
        tmask = (idx == trans) if trans is not None else None
        frames.append((left, top, fw, fh, ct[idx], disposal, tmask))
        if first_only:
            break
    if not frames:
        raise ValueError("GIF stream has no image block")
    return (w, h), frames


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes → (H, W, 3) uint8 RGB of the FIRST frame, placed on
    a black canvas when the frame is smaller than the logical
    screen."""
    (w, h), frames = _parse_frames(payload, first_only=True)
    left, top, fw, fh, px = frames[0][:5]
    if (left, top, fw, fh) == (0, 0, w, h):
        return px.copy()
    if w * h > 1 << 26:  # corrupt LSD could demand a multi-GB canvas
        raise ValueError(
            f"implausible GIF logical screen {w}x{h} for a "
            f"{fw}x{fh} frame"
        )
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    canvas[top : top + fh, left : left + fw] = px
    return canvas


def decode_gif_frames(payload: bytes) -> np.ndarray:
    """GIF bytes → (n_frames, H, W, 3) uint8 RGB: the full animation
    COMPOSITED per GIF89a §23 (round 7 — frames get the same one-row-
    per-frame sampling path as video). Semantics implemented:

    - each frame draws its sub-rectangle onto the running canvas;
      pixels whose index equals the Graphic Control Extension's
      transparent index leave the canvas unchanged;
    - disposal 0/1 (unspecified / do not dispose): the drawn frame
      stays; 2 (restore to background): the frame's rectangle is
      cleared to black after display (the alpha-less reading every
      corpus decoder uses — the logical "background color" is only
      meaningful with a transparency channel we deliberately drop);
      3 (restore to previous): the rectangle reverts to its
      pre-draw contents.

    The emitted array per frame is the canvas SNAPSHOT after that
    frame's draw — what a player displays. Starts from a black
    canvas, same contract as :func:`decode_gif`."""
    (w, h), frames = _parse_frames(payload, first_only=False)
    # JOINT output bound (review r7, 4th pass): the output is
    # n_frames canvas COPIES, so a tiny payload with many frames on a
    # big screen amplifies enormously. The bound is an absolute
    # decoded-bytes budget, NOT an amplification ratio — legitimate
    # long animations amplify hugely too (a 20 s VGA GIF is ~600 MB
    # decoded), so the budget admits those while refusing the
    # multi-GB shapes only crafted payloads produce.
    if 3 * w * h * max(len(frames), 1) > _MAX_DECODED_BYTES:
        raise ValueError(
            f"GIF animation too large to composite: {len(frames)} "
            f"frames on a {w}x{h} screen exceeds the "
            f"{_MAX_DECODED_BYTES >> 20} MiB decode budget"
        )
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    out = []
    for left, top, fw, fh, px, disposal, tmask in frames:
        if top + fh > h or left + fw > w:
            raise ValueError(
                f"GIF frame {fw}x{fh}@({left},{top}) exceeds the "
                f"{w}x{h} logical screen"
            )
        region = canvas[top : top + fh, left : left + fw]
        saved = region.copy() if disposal == 3 else None
        if tmask is None:
            region[:] = px
        else:
            keep = ~tmask
            region[keep] = px[keep]
        out.append(canvas.copy())
        if disposal == 2:
            region[:] = 0
        elif disposal == 3:
            region[:] = saved
    return np.stack(out)


def encode_gif_frames(
    size: tuple,
    palette: np.ndarray,
    frames,
) -> bytes:
    """Multi-frame GIF89a encoder for the animation roundtrip oracle.

    ``size``: (W, H) logical screen; ``palette``: (N ≤ 256, 3) uint8
    global color table; ``frames``: iterable of
    ``(left, top, idx2d, disposal, transparent_index | None
    [, interlace])`` — an image block gets a Graphic Control
    Extension only when it needs one (disposal != 0 or transparency),
    so a plain single frame encodes byte-identically to the classic
    :func:`encode_gif` layout. Indices must be < N."""
    w, h = size
    pal = np.asarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or len(pal) > 256:
        raise ValueError(f"bad palette shape {pal.shape}")
    n_field = 0
    while (1 << (n_field + 1)) < len(pal):
        n_field += 1
    table = np.zeros((1 << (n_field + 1), 3), dtype=np.uint8)
    table[: len(pal)] = pal
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (0x7 << 4) | n_field, 0, 0)
    out += table.tobytes()
    mcs = max(2, n_field + 1)
    for spec in frames:
        left, top, idx2d, disposal, trans = spec[:5]
        interlace = bool(spec[5]) if len(spec) > 5 else False
        idx = np.asarray(idx2d)
        fh, fw = idx.shape
        if top + fh > h or left + fw > w:
            raise ValueError(
                f"frame {fw}x{fh}@({left},{top}) exceeds {w}x{h}"
            )
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("frame index out of color-table range")
        if disposal or trans is not None:
            gpk = ((disposal & 0x7) << 2) | (
                1 if trans is not None else 0
            )
            out += b"\x21\xf9\x04" + bytes(
                (gpk, 0, 0, trans if trans is not None else 0)
            ) + b"\x00"
        out += b"\x2c" + struct.pack(
            "<HHHHB", left, top, fw, fh, 0x40 if interlace else 0
        )
        if interlace:
            order = [
                y
                for start, step in _INTERLACE_PASSES
                for y in range(start, fh, step)
            ]
            idx = idx[order]
        out.append(mcs)
        lzw = _lzw_encode(idx.reshape(-1), mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # image-data sub-block terminator
    out += b"\x3b"
    return bytes(out)


def gif_frame_count(payload: bytes) -> int:
    """Number of image blocks in the stream (animation length) — a
    pure STRUCTURAL walk (length-prefixed sub-blocks skipped, no LZW
    decode), so counting a long animation costs O(bytes) and corrupt
    pixel data inside an intact block structure still counts (review
    r6: the old implementation fully decoded every frame)."""
    try:
        return _count_image_blocks(payload)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated GIF stream: {exc}") from exc


def _count_image_blocks(payload: bytes) -> int:
    d = payload
    if d[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (missing GIF87a/89a)")
    _w, _h, packed, _bg, _ar = struct.unpack_from("<HHBBB", d, 6)
    pos = 13
    if packed & 0x80:
        pos += 3 * (1 << ((packed & 0x07) + 1))
    n = 0
    while pos < len(d):
        block = d[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            pos += 1
            while d[pos] != 0:
                pos += 1 + d[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        ipk = d[pos + 8]
        pos += 9
        if ipk & 0x80:
            pos += 3 * (1 << ((ipk & 0x07) + 1))
        pos += 1  # LZW min code size
        while d[pos] != 0:
            pos += 1 + d[pos]
        pos += 1
        n += 1
    if n == 0:
        raise ValueError("GIF stream has no image block")
    return n
