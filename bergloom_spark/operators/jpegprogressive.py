"""Progressive JPEG (SOF2) codec — pure numpy, no dependencies.

VERDICT r5 #8 (stretch): the remaining JPEG variant real web corpora
contain. Implements ITU-T T.81 Annex G — spectral selection +
successive approximation — in BOTH directions, so the same
encode→decode roundtrip oracle used for the baseline codec
(``jpegcodec.py``) pins the progressive entropy layer too, and no
table is ever transcribed from another implementation: the decoder
builds everything from the stream's own DQT/DHT/SOF2/SOS segments.

Decoder scope (honest):
- 8-bit, 1–3 components, sampling factors 1–2 (interleaved DC scans
  walk MCUs exactly like the baseline decoder; AC scans are
  single-component per the spec, walking the component's TRUE block
  grid — G.1.2 / A.2.2).
- DC first + refinement (arithmetic point transform, bit OR-in), AC
  first + refinement (sign-magnitude point transform, EOB runs,
  correction bits — the full Figure G.7 machinery), restart markers
  (reset predictors + EOB run per interval).
- Arithmetic coding and 12-bit precision raise, as in the baseline.

Encoder scope: 4:4:4 (no subsampling, same as the baseline encoder),
the standard 10-scan script shape (DC first/refine for all
components; per-component AC first, an extra successive-approximation
level for luma, and final refinements), and deliberately FLAT
canonical Huffman tables — every symbol at one code length. Flat
tables are spec-legal (Kraft-complete, no all-ones code), cost only
compression ratio, and remove the optimal-table pass (K.2) that a
production encoder would run; the decoder cannot tell the difference
because it reads DHT from the stream.

Like the baseline codec this is an executor-side kernel for
Arrow-batched ``mapInPandas`` stages; the entropy loops are scalar
Python over ~bounded-size thumbnails, the block transforms are numpy
matmuls.
"""

from __future__ import annotations

import struct

import numpy as np

from bergloom_spark.operators.jpegcodec import (
    _DCT,
    _Q_CHROM,
    _Q_LUM,
    _ZIGZAG,
    _BitReader,
    _BitWriter,
    _canonical_codes,
    _extend,
    _magnitude,
    _prefix_table,
    _rgb_to_ycbcr,
    _scaled_quant,
)

__all__ = ["decode_jpeg_progressive", "encode_jpeg_progressive"]


# Flat canonical tables (see module doc): 12 DC categories at 5 bits
# (Kraft 12/32); all 256 possible RS bytes — 255 at 9 bits plus one
# at 10 (a DHT BITS entry is a single byte, so one length holds at
# most 255 codes; Kraft 255/512 + 1/1024 < 1).
_DC_FLAT = ([0, 0, 0, 0, 12] + [0] * 11, list(range(12)))
_AC_FLAT = ([0] * 8 + [255, 1] + [0] * 6, list(range(256)))


def _scan_script(ncomp: int) -> list:
    """(component indices, ss, se, ah, al) per scan — the libjpeg
    default progressive script shape."""
    if ncomp == 1:
        return [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    return [
        ([0, 1, 2], 0, 0, 0, 1),  # DC first, interleaved
        ([0], 1, 5, 0, 2),
        ([2], 1, 63, 0, 1),
        ([1], 1, 63, 0, 1),
        ([0], 6, 63, 0, 2),
        ([0], 1, 63, 2, 1),  # luma AC refine 2→1
        ([0, 1, 2], 0, 0, 1, 0),  # DC refine
        ([2], 1, 63, 1, 0),
        ([1], 1, 63, 1, 0),
        ([0], 1, 63, 1, 0),
    ]


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------
class _ScanWriter:
    """Progressive AC-scan entropy state: EOB-run accumulation plus
    the correction bits buffered behind it (Figure G.7's BE/BR)."""

    def __init__(self, bw: _BitWriter, ac_codes: dict):
        self.bw = bw
        self.ac = ac_codes
        self.eobrun = 0
        self.pending_bits: list[int] = []

    def symbol(self, rs: int) -> None:
        code, ln = self.ac[rs]
        self.bw.write(code, ln)

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            self.symbol(r << 4)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.pending_bits:
            self.bw.write(b, 1)
        self.pending_bits = []


def encode_jpeg_progressive(
    arr: np.ndarray, quality: int = 90, restart_interval: int = 0
) -> bytes:
    """(H, W, 3) uint8 RGB (or (H, W) grayscale) → progressive (SOF2)
    JFIF bytes, 4:4:4, Annex K quant tables at ``quality``.

    ``restart_interval`` > 0 emits DRI + RSTn markers every N units
    (MCUs in DC scans, blocks in AC scans), closing the pending EOB
    run and byte-aligning first — exists mainly so the DECODER's
    restart path (predictor + EOB-run reset) is roundtrip-pinned."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError(f"expected (H, W, 3) or (H, W), got {a.shape}")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    planes = (
        [a.astype(np.float64)]
        if gray
        else list(np.moveaxis(_rgb_to_ycbcr(a), -1, 0))
    )
    ncomp = 1 if gray else 3
    qlum = _scaled_quant(_Q_LUM, quality)
    qchrom = _scaled_quant(_Q_CHROM, quality)
    quants = [qlum] + ([qchrom, qchrom] if not gray else [])

    # quantized zigzag coefficients per component: (bh, bw, 64)
    bh, bwid = (h + 7) // 8, (w + 7) // 8
    coefs = []
    for ci in range(ncomp):
        padded = np.pad(
            planes[ci], ((0, bh * 8 - h), (0, bwid * 8 - w)), mode="edge"
        )
        cz = np.empty((bh, bwid, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bwid):
                block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = _DCT @ (block - 128.0) @ _DCT.T
                cz[by, bx] = np.round(
                    coef.reshape(64) / quants[ci]
                ).astype(np.int64)[_ZIGZAG]
        coefs.append(cz)

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(
        ">H5sBBBHHBB", 16, b"JFIF\x00", 1, 1, 0, 1, 1, 0, 0
    )
    for tid, q in enumerate(quants[: 2 if not gray else 1]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(q[i]) for i in _ZIGZAG)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        out += struct.pack("BBB", ci + 1, 0x11, 0 if ci == 0 else 1)
    for tc_th, (bits, values) in ((0x00, _DC_FLAT), (0x10, _AC_FLAT)):
        out += b"\xff\xc4" + struct.pack(
            ">HB", 3 + 16 + len(values), tc_th
        ) + bytes(bits) + bytes(values)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    dc_codes = _canonical_codes(*_DC_FLAT)
    ac_codes = _canonical_codes(*_AC_FLAT)

    for comp_idx, ss, se, ah, al in _scan_script(ncomp):
        ns = len(comp_idx)
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns)
        for ci in comp_idx:
            out += struct.pack("BB", ci + 1, 0x00)
        out += struct.pack("BBB", ss, se, (ah << 4) | al)
        bw = _BitWriter()
        rst = [0, 0]  # (units emitted, next RST index)

        def _restart(sw=None) -> bool:
            """Byte-align and emit RSTn at an interval boundary;
            True when a marker was emitted (caller resets DC preds —
            the EOB run is closed here since it cannot span a
            restart)."""
            emitted = False
            if (
                restart_interval
                and rst[0]
                and rst[0] % restart_interval == 0
            ):
                if sw is not None:
                    sw.flush_eobrun()
                bw.flush()
                bw.buf += bytes((0xFF, 0xD0 + rst[1]))
                rst[1] = (rst[1] + 1) % 8
                emitted = True
            rst[0] += 1
            return emitted

        if ss == 0:  # DC scan (refine when ah > 0)
            pred = [0] * ncomp
            for by in range(bh):
                for bx in range(bwid):
                    if _restart():
                        pred = [0] * ncomp
                    for ci in comp_idx:
                        dc = int(coefs[ci][by, bx, 0])
                        if ah == 0:
                            t = dc >> al  # arithmetic point transform
                            diff = t - pred[ci]
                            pred[ci] = t
                            cat, bits_ = _magnitude(diff)
                            code, ln = dc_codes[cat]
                            bw.write(code, ln)
                            if cat:
                                bw.write(bits_, cat)
                        else:
                            bw.write((dc >> al) & 1, 1)
        else:  # AC scan, single component
            (ci,) = comp_idx
            sw = _ScanWriter(bw, ac_codes)
            for by in range(bh):
                for bx in range(bwid):
                    _restart(sw)
                    zz = coefs[ci][by, bx]
                    if ah == 0:
                        _encode_ac_first(sw, zz, ss, se, al)
                    else:
                        _encode_ac_refine(sw, zz, ss, se, al)
            sw.flush_eobrun()
        bw.flush()
        out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


def _encode_ac_first(sw: _ScanWriter, zz, ss, se, al) -> None:
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = (v >> al) if v >= 0 else -((-v) >> al)  # sign-magnitude
        if t == 0:
            r += 1
            continue
        sw.flush_eobrun()
        while r > 15:
            sw.symbol(0xF0)
            r -= 16
        cat, bits_ = _magnitude(t)
        sw.symbol((r << 4) | cat)
        sw.bw.write(bits_, cat)
        r = 0
    if r:  # band has trailing zeros → this block joins the EOB run
        sw.eobrun += 1
        if sw.eobrun == 0x7FFF:
            sw.flush_eobrun()


def _encode_ac_refine(sw: _ScanWriter, zz, ss, se, al) -> None:
    """Figure G.7: newly-nonzero coefficients emit (r, 1)+sign;
    history-nonzero ones emit buffered correction bits attached to
    the NEXT emitted symbol (or the pending EOB run)."""
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob = -1  # band-relative index of the last NEWLY-nonzero coef
    for i, t in enumerate(absv):
        if t == 1:
            eob = i
    r = 0
    br_bits: list[int] = []
    for i, t in enumerate(absv):
        if t == 0:
            r += 1
            continue
        while r > 15 and i <= eob:
            sw.flush_eobrun()
            sw.symbol(0xF0)
            r -= 16
            for b in br_bits:
                sw.bw.write(b, 1)
            br_bits = []
        if t > 1:  # history-nonzero: one correction bit, run untouched
            br_bits.append(t & 1)
            continue
        sw.flush_eobrun()
        sw.symbol((r << 4) | 1)
        sw.bw.write(1 if int(zz[ss + i]) >= 0 else 0, 1)
        for b in br_bits:
            sw.bw.write(b, 1)
        br_bits = []
        r = 0
    if r > 0 or br_bits:
        sw.eobrun += 1
        sw.pending_bits.extend(br_bits)
        if sw.eobrun == 0x7FFF:
            sw.flush_eobrun()


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------
def _next_marker(d: bytes, p: int) -> int:
    """Advance to the next non-RST, non-stuffing marker at/after p."""
    while p + 1 < len(d):
        if d[p] != 0xFF:
            p += 1
            continue
        nxt = d[p + 1]
        if nxt == 0x00 or nxt == 0xFF or 0xD0 <= nxt <= 0xD7:
            p += 2 if nxt == 0x00 else 1
            continue
        return p
    raise ValueError("truncated JPEG stream (no trailing marker)")


def decode_jpeg_progressive(payload: bytes) -> np.ndarray:
    """Progressive (SOF2) JFIF/JPEG bytes → (H, W, 3) uint8 RGB
    (grayscale replicates to 3 channels). Malformed payloads raise
    ValueError — never struct/Index/KeyError (corpus-decode contract,
    review r6)."""
    try:
        return _decode_jpeg_progressive(payload)
    except (struct.error, IndexError, KeyError) as exc:
        raise ValueError(f"malformed JPEG stream: {exc!r}") from exc


def _decode_jpeg_progressive(payload: bytes) -> np.ndarray:
    d = payload
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    coefs: list | None = None
    geom = None
    restart_interval = 0
    while True:
        if pos + 2 > len(d):
            raise ValueError("truncated JPEG stream")
        if d[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        while d[pos + 1] == 0xFF:  # T.81 B.1.1.2 fill bytes
            pos += 1
            if pos + 2 > len(d):
                raise ValueError("truncated JPEG stream")
        marker = d[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(d):
            raise ValueError("truncated JPEG stream")
        seglen = struct.unpack_from(">H", d, pos)[0]
        seg = d[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tz = np.frombuffer(
                    seg[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int64)
                nat = np.empty(64, dtype=np.int64)
                nat[_ZIGZAG] = tz
                qtables[tq] = nat
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nvals = sum(bits)
                values = list(seg[p + 17 : p + 17 + nvals])
                if len(bits) < 16 or len(values) < nvals:
                    raise ValueError("truncated DHT segment")
                codes = _canonical_codes(bits, values)
                htables[(tc, th)] = {
                    (ln, code): sym for sym, (code, ln) in codes.items()
                }
                p += 17 + nvals
        elif marker == 0xC2:  # SOF2
            prec, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"{prec}-bit precision unsupported")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = struct.unpack_from("BBB", seg, 6 + 3 * i)
                if not (1 <= hv >> 4 <= 4 and 1 <= (hv & 0x0F) <= 4):
                    # spec bound (B.2.2); 0 would divide-by-zero in
                    # the upsample step (fuzz r9)
                    raise ValueError(
                        f"invalid sampling factors 0x{hv:02x}"
                    )
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
            geom = _geometry(frame)
            # allocation sanity before the coefficient buffers (same
            # ≥1-bit-per-block argument as the baseline decoder)
            blocks = sum(
                bhp * bwp for (bhp, bwp, _, _) in geom["per_comp"]
            )
            if blocks > 8 * len(d):
                raise ValueError(
                    f"frame declares {blocks} blocks but the payload "
                    f"has only {len(d)} bytes"
                )
            coefs = [
                np.zeros((bhp, bwp, 64), dtype=np.int64)
                for (bhp, bwp, _, _) in geom["per_comp"]
            ]
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                f"SOF{marker - 0xC0} inside decode_jpeg_progressive "
                "(use decode_jpeg_baseline for SOF0/1)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None or coefs is None:
                raise ValueError("SOS before SOF2")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                ci = next(
                    (
                        j
                        for j, c in enumerate(frame["comps"])
                        if c["id"] == cs
                    ),
                    None,
                )
                if ci is None:
                    raise ValueError(
                        f"SOS names component {cs} absent from SOF2"
                    )
                scan.append((ci, tdta >> 4, tdta & 0x0F))
            ss, se, ahl = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahl >> 4, ahl & 0x0F
            pos = _decode_prog_scan(
                d, pos + seglen, frame, geom, coefs, scan,
                ss, se, ah, al, htables, restart_interval,
            )
            continue
        pos += seglen
    if frame is None or coefs is None:
        raise ValueError("no SOF2 frame in stream")
    return _reconstruct(frame, geom, coefs, qtables)


def _geometry(frame) -> dict:
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        raise ValueError("sampling factors beyond 2 unsupported")
    h, w = frame["h"], frame["w"]
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    per_comp = []
    for c in frame["comps"]:
        # padded-to-MCU grid (interleaved scans) and TRUE block grid
        # (non-interleaved scans, T.81 A.2.2)
        bhp, bwp = mcuy * c["v"], mcux * c["h"]
        cw = (w * c["h"] + hmax - 1) // hmax
        ch = (h * c["v"] + vmax - 1) // vmax
        per_comp.append((bhp, bwp, (ch + 7) // 8, (cw + 7) // 8))
    return {
        "hmax": hmax, "vmax": vmax, "mcux": mcux, "mcuy": mcuy,
        "per_comp": per_comp,
    }


def _huff(br: _BitReader, lut) -> int:
    hit = lut[br.peek16()]
    if hit is None:
        raise ValueError("invalid Huffman code")
    br.skip(hit[1])
    return hit[0]


def _decode_prog_scan(
    d, pos, frame, geom, coefs, scan, ss, se, ah, al, htables,
    restart_interval,
) -> int:
    """Decode one progressive scan's entropy data; return the stream
    position of the next marker."""
    br = _BitReader(d, pos)
    if ss == 0:
        if se != 0:
            raise ValueError("DC scan must have Se=0")
        _decode_dc_scan(br, frame, geom, coefs, scan, ah, al,
                        htables, restart_interval)
    else:
        if len(scan) != 1:
            raise ValueError("AC progressive scan must be single-component")
        if se > 63 or ss > se:
            raise ValueError(f"bad spectral band {ss}..{se}")
        _decode_ac_scan(br, geom, coefs, scan[0], ss, se, ah, al,
                        htables, restart_interval)
    return _next_marker(d, br.pos)


def _decode_dc_scan(
    br, frame, geom, coefs, scan, ah, al, htables, restart_interval
):
    luts = {}
    if ah == 0:
        for _, td, _ in scan:
            t = htables.get((0, td))
            if t is None:
                raise ValueError("missing DC Huffman table")
            luts[td] = _prefix_table(t)
    pred = {ci: 0 for ci, _, _ in scan}
    mcu_count = 0

    def unit(ci, td, by, bx):
        block = coefs[ci][by, bx]
        if ah == 0:
            cat = _huff(br, luts[td])
            if cat > 15:
                # spec bound on DC categories — a corrupt DHT symbol
                # would otherwise build a huge Python int that
                # overflows the int64 coefficient store (fuzz r9)
                raise ValueError(f"invalid DC category {cat}")
            diff = _extend(br.bits(cat), cat) if cat else 0
            pred[ci] += diff
            block[0] = pred[ci] << al
        else:
            if br.bit():
                block[0] |= 1 << al

    if len(scan) > 1:  # interleaved MCU walk (same order as baseline)
        for my in range(geom["mcuy"]):
            for mx in range(geom["mcux"]):
                if restart_interval and mcu_count and (
                    mcu_count % restart_interval == 0
                ):
                    br.restart()
                    for k in pred:
                        pred[k] = 0
                mcu_count += 1
                for ci, td, _ in scan:
                    c = frame["comps"][ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            unit(
                                ci, td,
                                my * c["v"] + by, mx * c["h"] + bx,
                            )
    else:
        ci, td, _ = scan[0]
        _, _, bht, bwt = geom["per_comp"][ci]
        for by in range(bht):
            for bx in range(bwt):
                if restart_interval and mcu_count and (
                    mcu_count % restart_interval == 0
                ):
                    br.restart()
                    pred[ci] = 0
                mcu_count += 1
                unit(ci, td, by, bx)


def _decode_ac_scan(
    br, geom, coefs, comp_scan, ss, se, ah, al, htables,
    restart_interval,
):
    ci, _, ta = comp_scan
    t = htables.get((1, ta))
    if t is None:
        raise ValueError("missing AC Huffman table")
    lut = _prefix_table(t)
    _, _, bht, bwt = geom["per_comp"][ci]
    eobrun = 0
    block_count = 0
    for by in range(bht):
        for bx in range(bwt):
            if restart_interval and block_count and (
                block_count % restart_interval == 0
            ):
                br.restart()
                eobrun = 0
            block_count += 1
            zz = coefs[ci][by, bx]
            if ah == 0:
                eobrun = _ac_first_block(br, lut, zz, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine_block(br, lut, zz, ss, se, al, eobrun)


def _ac_first_block(br, lut, zz, ss, se, al, eobrun) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff(br, lut)
        r, s = rs >> 4, rs & 0x0F
        if s:
            k += r
            if k > se:
                raise ValueError("AC index overflow")
            zz[k] = _extend(br.bits(s), s) << al
            k += 1
        else:
            if r < 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.bits(r)
                break
            k += 16  # ZRL
    return eobrun


def _ac_refine_block(br, lut, zz, ss, se, al, eobrun) -> int:
    """G.1.2.3 / Figure G.7 inverse: corrections for history-nonzero
    coefficients, ±1<<al insertions for newly-nonzero ones."""
    p1 = 1 << al
    m1 = -(1 << al)

    def correct(k):
        if br.bit() and (int(zz[k]) & p1) == 0:
            zz[k] += p1 if int(zz[k]) >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff(br, lut)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s:
                if s != 1:
                    raise ValueError("AC refinement magnitude must be 1")
                newval = p1 if br.bit() else m1
            else:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.bits(r)
                    break
                # r == 15: ZRL — skip 16 zero-history positions
            while k <= se:
                if int(zz[k]):
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                zz[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if int(zz[k]):
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct(frame, geom, coefs, qtables) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    idct = _DCT.T
    full = []
    for ci, c in enumerate(frame["comps"]):
        q = qtables.get(c["tq"])
        if q is None:
            raise ValueError(f"missing quant table {c['tq']}")
        bhp, bwp, _, _ = geom["per_comp"][ci]
        plane = np.empty((bhp * 8, bwp * 8), dtype=np.float64)
        qzz = q[_ZIGZAG]
        for by in range(bhp):
            for bx in range(bwp):
                nat = np.empty(64, dtype=np.float64)
                nat[_ZIGZAG] = coefs[ci][by, bx] * qzz
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    idct @ nat.reshape(8, 8) @ _DCT + 128.0
                )
        ry = geom["vmax"] // c["v"]
        rx = geom["hmax"] // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        y = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    if len(full) != 3:
        raise ValueError(f"{len(full)}-component frames unsupported")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)
