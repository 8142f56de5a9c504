"""Baseline JPEG codec in pure stdlib + numpy (extension scope:
multimodal decode tier — closes the jpeg third of the jpeg/png/mp4
codec gap; no PIL/libjpeg/ffmpeg in this container).

Decoder: ITU-T T.81 BASELINE SEQUENTIAL DCT plus PROGRESSIVE
(SOF2, Annex G: spectral selection + successive approximation —
the web's second-most-common profile), EXTENDED SEQUENTIAL 12-bit
(SOF1, uint16 output — scanned/medical corpora, r11), and LOSSLESS
(SOF3, Annex H: Huffman-coded prediction differences over the 7
spatial predictors, modulo-65536 reconstruction, point transform,
2-16 bit — the DNG/DICOM shape, r11), plus ARITHMETIC-coded
sequential (SOF9 + DAC, r12: the Annex D QM-coder with the §F.2.4
DC/AC conditioning contexts — the scanned-document shape, 8- and
12-bit) and ARITHMETIC-coded progressive (SOF10, G.2: the same
spectral-selection / successive-approximation scan scripts with
every entropy decision through the QM coder). Supports grayscale
and 3-component images at integer-ratio
sampling factors (4:4:4, 4:2:2, 4:2:0, 4:1:1 — universal in
practice), multi-scan SEQUENTIAL streams (per-component scans,
T.81 A.2.2), multiple DQT/DHT tables (redefinable between scans),
restart markers, 0xFF00 byte stuffing, and fill bytes
before markers (header and scan). Four-component Adobe CMYK/YCCK
(APP14 transform tag, inverted-ink convention, naive separation
inverse → RGB), Adobe transform-0 RGB decode (r12), 4-component
LOSSLESS (raw stored planes, the DNG convention, r13), ARITHMETIC
LOSSLESS (SOF11, r13: the H.1.2.2 two-gradient QM conditioning
model — see ``_decode_lossless_arith``), and HIERARCHICAL mode
(Annex J, r13: DHP pyramids with EXP reference expansion, ANY
non-differential first frame — sequential/progressive/lossless,
either entropy coder — then differential sequential SOF5/SOF13,
differential PROGRESSIVE SOF6/SOF14, and differential lossless
SOF7/SOF15 frames; subsampled (e.g. 4:2:0) and 4-component CMYK
pyramids included — see ``_decode_hierarchical``). Every T.81
frame type now decodes in-container; the remaining JPEG seam is
exactly: subsampled LOSSLESS frames, non-integer-ratio sampling
factors, and partially-interleaved (2-of-3-component) sequential
scans — all raise ``NotImplementedError`` for the injected-decoder
path.

Encoder: a minimal baseline encoder (gray / 4:4:4 / 4:2:0, fixed-
length Huffman tables carried in DHT, optional restart markers,
8- or 12-bit precision, ``arithmetic=True`` for the QM-coded form),
a progressive encoder
(``encode_jpeg_progressive``) whose scan script exercises every
Annex-G decode path, and a lossless encoder
(``encode_jpeg_lossless``). They exist so tests can ROUND-TRIP real
JPEG bitstreams in-container — the same reason
tests/test_extensions.py carries a PNG encoder — and double as the
write side of a media re-encode stage. With an all-ones quant table
the DCT round trip is exact up to rounding (max ±2 per pixel),
progressive decode is bit-identical to baseline decode of the same
image (same coefficients), and lossless decode is bit-identical to
the input — all pinned in tests.

Scale posture: decode runs per-image inside Arrow ``mapInPandas``
batches (operators/multimodal.py), so cost is bounded by image size,
not partition size. The per-bit Python Huffman loop is the
correctness tier (~MB/s); production throughput injects a native
codec through the same ``decoder=`` seam — the bitstream semantics
pinned here are what such a codec must reproduce.

Reference parity note: the reference pipeline (etl_job.py) has no
media surface; this module is extension scope per SURVEY.md §2's
LLM-data-pipeline additions (multimodal columns).
"""

from __future__ import annotations

import struct
import threading

import numpy as np


def _zigzag_pairs() -> list[tuple[int, int]]:
    out = []
    for s in range(15):
        rng = list(range(max(0, s - 7), min(s, 7) + 1))
        for r in (rng if s % 2 else reversed(rng)):
            out.append((r, s - r))
    return out


#: ZIGZAG[k] = flat (row-major) index of the k-th zigzag coefficient
ZIGZAG = np.array([r * 8 + c for r, c in _zigzag_pairs()], dtype=np.int64)

#: orthonormal 8-point DCT-II basis: F = M @ f @ M.T, f = M.T @ F @ M
_M = np.array([[0.5 * (np.sqrt(0.5) if u == 0 else 1.0)
                * np.cos((2 * x + 1) * u * np.pi / 16)
                for x in range(8)] for u in range(8)])


# --------------------------------------------------------------------------
# bit I/O
# --------------------------------------------------------------------------

class _BitReader:
    """MSB-first bit reader over de-stuffed entropy bytes, with a
    16-bit peek for LUT-based Huffman decode. Reads past the end pad
    with zero bits (safe: the MCU count bounds real reads)."""

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.pos = 0
        self.acc = 0
        self.bits = 0

    def _fill(self, need: int) -> None:
        while self.bits < need:
            b = self.data[self.pos] if self.pos < self.n else 0
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.bits += 8

    def receive(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        self._fill(nbits)
        self.bits -= nbits
        v = (self.acc >> self.bits) & ((1 << nbits) - 1)
        self.acc &= (1 << self.bits) - 1
        return v

    def peek16(self) -> int:
        self._fill(16)
        return (self.acc >> (self.bits - 16)) & 0xFFFF

    def skip(self, nbits: int) -> None:
        self.bits -= nbits
        self.acc &= (1 << self.bits) - 1


class _BitWriter:
    """MSB-first bit writer with JPEG 0xFF00 byte stuffing."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # stuff
                self.acc = 0
                self.n = 0

    def pad_to_byte(self) -> None:
        while self.n:
            self.write(1, 1)  # pad bits are 1s (T.81 F.1.2.3)


# --------------------------------------------------------------------------
# Huffman
# --------------------------------------------------------------------------

_FAST_LUT_CACHE: dict = {}  # (counts, symbols) → 65536-entry peek table
_FAST_LUT_LOCK = threading.Lock()  # executor threads share this module
_FAST_LUT_CACHE_MAX = 64    # ~0.5 MB/entry; real-world JPEGs carry
#                             per-image optimized DHTs, so the cache
#                             must be bounded on long-lived executors


def _build_decode_lut(counts: list[int], symbols: bytes) -> list:
    """Canonical JPEG Huffman as a flat 16-bit PEEK table:
    lut[next16bits] = (symbol, code_length). Every 16-bit value
    sharing a code's prefix maps to that code, so one list index
    replaces the per-bit tree walk — the decoder's hot loop. Cached
    by table content (bounded FIFO): fixed encoder tables and
    repeated images hit the cache, per-image optimized tables churn
    through it without growing executor memory."""
    key = (bytes(counts), bytes(symbols))
    lut = _FAST_LUT_CACHE.get(key)
    if lut is not None:
        return lut
    lut = [None] * 65536
    code, k = 0, 0
    for ln in range(1, 17):
        span = 1 << (16 - ln)
        for _ in range(counts[ln - 1]):
            base = code << (16 - ln)
            if base + span > 65536:
                raise ValueError(
                    "corrupt JPEG DHT: code space overflows at "
                    f"length {ln}")
            lut[base:base + span] = [(symbols[k], ln)] * span
            k += 1
            code += 1
        code <<= 1
    # Eviction + insert under a lock: concurrent decode threads in one
    # executor process can otherwise race between iter() and pop().
    with _FAST_LUT_LOCK:
        while len(_FAST_LUT_CACHE) >= _FAST_LUT_CACHE_MAX:
            _FAST_LUT_CACHE.pop(next(iter(_FAST_LUT_CACHE)))
        _FAST_LUT_CACHE[key] = lut
    return lut


def _build_encode_lut(counts: list[int], symbols: bytes) -> dict:
    """symbol → (code, length), same canonical assignment."""
    lut, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            lut[symbols[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return lut


def _decode_symbol(br: _BitReader, lut: list) -> int:
    hit = lut[br.peek16()]
    if hit is None:
        raise ValueError("invalid Huffman code in JPEG entropy stream")
    br.skip(hit[1])
    return hit[0]


def _extend(value: int, nbits: int) -> int:
    """T.81 EXTEND: map the received magnitude bits to a signed value."""
    if nbits == 0:
        return 0
    if value < (1 << (nbits - 1)):
        return value - (1 << nbits) + 1
    return value


def _category(value: int) -> int:
    """Bit length of |value| — the DC/AC size category."""
    return int(abs(value)).bit_length()


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

def _split_scan(payload: bytes, pos: int) -> tuple[list[bytes], int]:
    """Collect entropy-coded data from ``pos``: undo 0xFF00 stuffing,
    split at RSTn markers (one de-stuffed segment per restart
    interval), stop at any other marker. Returns (segments, pos of the
    terminating 0xFF)."""
    segments, cur = [], bytearray()
    i = int(pos)
    n = len(payload)
    while i < n:
        j = payload.find(b"\xff", i)  # copy marker-free spans wholesale
        if j < 0:
            cur += payload[i:]
            i = n
            break
        nxt = payload[j + 1] if j + 1 < n else 0xD9
        if nxt == 0x00:
            cur += payload[i:j + 1]  # keep the 0xFF, drop the stuffed 0x00
            i = j + 2
        elif nxt == 0xFF:
            # fill byte before a marker (T.81 B.1.1.2): entropy data
            # never contains bare FF FF (a data FF is always stuffed
            # to FF 00), so the first FF is padding — drop it
            cur += payload[i:j]
            i = j + 1
        elif 0xD0 <= nxt <= 0xD7:  # RSTn
            cur += payload[i:j]
            segments.append(bytes(cur))
            cur = bytearray()
            i = j + 2
        else:
            cur += payload[i:j]
            i = j
            break
    segments.append(bytes(cur))
    return segments, i


# --------------------------------------------------------------------------
# arithmetic entropy coding (T.81 Annex D QM-coder + §F.1.4/F.2.4)
# --------------------------------------------------------------------------
#
# SOF9 extended-sequential arithmetic JPEG (r12 — VERDICT r11 item 5):
# the QM-coder is the pure-integer binary arithmetic coder of T.81
# Annex D (public spec; the probability-estimation state machine is
# Table D.3), and the JPEG layer maps DC diffs / AC coefficients onto
# binary decisions with the conditioning contexts of Tables F.4/F.5:
# DC statistics areas of 49 bins per table (4 bins x 5 previous-diff
# classes, 15 magnitude-category bins at X1=20, 14 mantissa bins at
# +14), AC areas of 245 bins (3 bins per zigzag index k: EOB /
# nonzero / first-magnitude, plus two 14+14 X/M chains at 189 and 217
# selected by the Kx conditioning split), a fixed non-adaptive bin
# for AC signs. Conditioning defaults L=0, U=1, Kx=5; DAC (0xCC)
# overrides. Per-bin state packs (index | MPS<<7) in one byte.
#
# Parity posture: encoder and decoder are exact inverses by
# construction and are pinned by exhaustive round-trip tests (the
# SOF1/SOF3 pattern — no arithmetic-JPEG sample files or external
# codecs exist in this container, so bitstream-level parity against
# other implementations is untested; the Qe table, context layout,
# byte stuffing and carry conventions follow the public spec).

#: Decode-DoS bound for arithmetic scans, in coded units per entropy
#: byte. Format floor: the cheapest QM decision is an MPS at
#: Qe=0x0001 (~1/32767 bit amortized per renormalization), and a
#: coded unit needs >= 1 decision, so a legal stream never exceeds
#: 8 * 32767 units/byte. Anything above that is a corrupt-SOF
#: dimension bomb; anything at or below can be a legal flat image.
_ARITH_UNITS_PER_BYTE = 8 * 32767

#: Absolute per-scan coded-unit ceiling, the DEFLATE_BLOCK_CAP
#: posture: the ratio bound above is format-exact but admits ~262k
#: units of WORK per entropy byte — a ~300-byte crafted stream can
#: declare a 65535x65535 frame (67M units) that sits UNDER the ratio
#: bound and spins the pure-python decoder for hours (r13, found
#: converting the r12-advice bound fix). 2^19 units is ~33 Mpixel
#: for a one-component scan (an 8K video frame fits); a single JPEG
#: payload declaring more is decode-bombing a corpus task, not a
#: crawl image, and dead-letters. Production beyond this size
#: injects a native decoder at the multimodal seam.
_MAX_SCAN_UNITS = 1 << 19


def _check_scan_units(declared: int, format_avail: int, cap: int,
                      what: str = "coded units") -> None:
    """O(1) scan admission with honest exception classes (r13
    self-review): declared work beyond what the entropy data could
    LEGALLY carry is corruption — ValueError, the dead-letter
    contract; declared work that is format-plausible but beyond the
    pure-python throughput ceiling is a LEGAL over-size image (a
    48-Mpixel camera JPEG is not malformed) — NotImplementedError,
    the injected-decoder route (multimodal's decode seam). The
    r12-advice fix closed the same self-rejection class for the
    ratio bound; this closes it for the absolute cap."""
    if declared > format_avail:
        raise ValueError(
            f"JPEG scan declares more {what} than its entropy "
            "data can carry")
    if declared > cap:
        raise NotImplementedError(
            f"JPEG scan declares {declared} {what} — beyond the "
            f"pure-python decode ceiling ({cap}); inject a native "
            "decoder at the multimodal seam")

#: T.81 Table D.3 (Qe, NMPS, NLPS, SWITCH); index 113 is the fixed
#: ~equiprobable bin (never adapts) used for AC coefficient signs.
_QE = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1),
    (0x5A1D, 113, 113, 0),
)

_AC_SIGN_BIN = 113  # the fixed bin's table index


class _QmEncoder:
    """QM-coder encode side (T.81 D.1): A in [0x8000, 0x10000) after
    renormalization, MPS coded in the bottom subinterval with
    conditional exchange, byte out every 8 renorm shifts with carry
    propagated directly into the emitted buffer (equivalent to the
    spec's stacked-0xFF handling — mutating the list replaces the
    deferral). Output is RAW coder bytes; the caller applies JPEG
    0xFF00 stuffing before embedding in a scan."""

    __slots__ = ("a", "c", "ct", "out")

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.out = bytearray()

    def _byte_out(self) -> None:
        t = self.c >> 19
        if t > 0xFF:                   # carry into emitted bytes
            i = len(self.out) - 1
            while i >= 0 and self.out[i] == 0xFF:
                self.out[i] = 0x00
                i -= 1
            if i >= 0:
                self.out[i] += 1
            # a carry past the stream start is impossible: the code
            # value always stays below the total interval
            self.out.append(t & 0xFF)
        else:
            self.out.append(t)
        self.c &= 0x7FFFF
        self.ct = 8

    def encode(self, bit: int, st: bytearray, i: int) -> None:
        sv = st[i]
        idx, mps = sv & 0x7F, sv >> 7
        qe, nmps, nlps, switch = _QE[idx]
        self.a -= qe
        if bit == mps:
            if self.a & 0x8000:
                return                 # no renorm, no state change
            if self.a < qe:            # conditional exchange: MPS top
                self.c += self.a
                self.a = qe
            st[i] = (mps << 7) | nmps
        else:
            if self.a >= qe:           # LPS coded in the top interval
                self.c += self.a
                self.a = qe
            # else conditional exchange: LPS keeps the bottom
            if switch:
                mps ^= 1
            st[i] = (mps << 7) | nlps
        while not self.a & 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byte_out()

    def flush(self) -> bytes:
        """Termination (D.1.8): clear as many trailing code bits as
        the interval allows, then push the remaining two bytes."""
        t = (self.c + self.a - 1) & ~0xFFFF
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        self._byte_out()
        self.c <<= 8
        self._byte_out()
        return bytes(self.out)


def _qm_flush_stuffed(enc: "_QmEncoder") -> bytes:
    """Terminate a QM scan: raw coder bytes -> JPEG scan bytes
    (0xFF00 stuffing; _split_scan is the inverse on the decode side).
    The single place the stuffing/termination convention lives."""
    return enc.flush().replace(b"\xff", b"\xff\x00")


class _QmDecoder:
    """QM-coder decode side — the exact inverse of _QmEncoder (the
    round-trip tests pin every branch pair). Input is the DE-STUFFED
    scan segment from _split_scan; bits past the end feed as zeros
    (the flush guarantees every coded decision lands before that
    matters — trailing corruption surfaces at the JPEG layer)."""

    __slots__ = ("data", "pos", "a", "cx", "bits", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 2
        self.a = 0x10000
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.cx = (b0 << 8) | b1
        self.bits = 0
        self.nbits = 0

    def _next_bit(self) -> int:
        if self.nbits == 0:
            self.bits = (self.data[self.pos]
                         if self.pos < len(self.data) else 0)
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def decode(self, st: bytearray, i: int) -> int:
        sv = st[i]
        idx, mps = sv & 0x7F, sv >> 7
        qe, nmps, nlps, switch = _QE[idx]
        self.a -= qe
        if self.cx < self.a:
            if self.a & 0x8000:
                return mps
            if self.a < qe:            # conditional exchange
                bit = mps ^ 1
                if switch:
                    mps ^= 1
                st[i] = (mps << 7) | nlps
            else:
                bit = mps
                st[i] = (mps << 7) | nmps
        else:
            self.cx -= self.a
            if self.a < qe:            # conditional exchange
                bit = mps
                st[i] = (mps << 7) | nmps
            else:
                bit = mps ^ 1
                if switch:
                    mps ^= 1
                st[i] = (mps << 7) | nlps
            self.a = qe
        while not self.a & 0x8000:
            self.a <<= 1
            self.cx = (self.cx << 1) | self._next_bit()
        return bit


class _ArithStats:
    """Per-scan statistics state (reset at scan start and at every
    restart marker, T.81 F.1.4/F.2.4): one 49-bin DC area and one
    245-bin AC area per DAC table id, the fixed sign bin, and the
    per-component previous-diff classification + DC predictor."""

    __slots__ = ("dc", "ac", "fixed", "dc_ctx", "last_dc")

    def __init__(self, n_comps: int):
        self.dc: dict[int, bytearray] = {}
        self.ac: dict[int, bytearray] = {}
        self.fixed = bytearray([_AC_SIGN_BIN])
        self.dc_ctx = [0] * n_comps
        self.last_dc = [0] * n_comps

    def dc_area(self, tid: int) -> bytearray:
        if tid not in self.dc:
            self.dc[tid] = bytearray(49)
        return self.dc[tid]

    def ac_area(self, tid: int) -> bytearray:
        if tid not in self.ac:
            self.ac[tid] = bytearray(245)
        return self.ac[tid]


def _arith_decode_dc(dec, stats, ci, dtbl, cond_dc):
    """DC diff via F.2.4.1 — updates stats.last_dc[ci] (in the scan's
    coding domain: Al-shifted-down for progressive DC-first scans)."""
    st = stats.dc_area(dtbl)
    base = stats.dc_ctx[ci]
    if dec.decode(st, base) == 0:
        stats.dc_ctx[ci] = 0
        return
    sign = dec.decode(st, base + 1)
    soff = base + 2 + sign
    m = dec.decode(st, soff)
    if m:
        soff = 20                          # Table F.4: X1
        while dec.decode(st, soff):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arith DC magnitude overflow")
            soff += 1
    lo, up = cond_dc
    if m < (1 << lo) >> 1:
        stats.dc_ctx[ci] = 0
    elif m > (1 << up) >> 1:
        stats.dc_ctx[ci] = 12 + 4 * sign
    else:
        stats.dc_ctx[ci] = 4 + 4 * sign
    v = m
    moff = soff + 14
    while m >> 1:
        m >>= 1
        if dec.decode(st, moff):
            v |= m
    v += 1
    stats.last_dc[ci] += -v if sign else v


def _arith_encode_dc(enc, stats, ci, dtbl, cond_dc, dc_val):
    """DC diff via F.1.4.1 — ``dc_val`` already in the coding domain."""
    st = stats.dc_area(dtbl)
    base = stats.dc_ctx[ci]
    diff = dc_val - stats.last_dc[ci]
    stats.last_dc[ci] = dc_val
    if diff == 0:
        enc.encode(0, st, base)
        stats.dc_ctx[ci] = 0
        return
    enc.encode(1, st, base)
    sign = 1 if diff < 0 else 0
    v = -diff if sign else diff
    enc.encode(sign, st, base + 1)
    soff = base + 2 + sign
    m = 0
    v -= 1
    if v:
        enc.encode(1, st, soff)
        m = 1
        v2 = v
        soff = 20
        while v2 >> 1:
            v2 >>= 1
            enc.encode(1, st, soff)
            m <<= 1
            soff += 1
    enc.encode(0, st, soff)
    lo, up = cond_dc
    if m < (1 << lo) >> 1:
        stats.dc_ctx[ci] = 0
    elif m > (1 << up) >> 1:
        stats.dc_ctx[ci] = 12 + 4 * sign
    else:
        stats.dc_ctx[ci] = 4 + 4 * sign
    moff = soff + 14
    while m >> 1:
        m >>= 1
        enc.encode(1 if m & v else 0, st, moff)


def _arith_decode_ac_band(dec, stats, blk, atbl, kx, ss, se, al):
    """AC band [ss, se] via F.2.4.2 — sequential is (1, 63, 0);
    progressive AC-first scans store values << al."""
    st = stats.ac_area(atbl)
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if dec.decode(st, base):               # EOB
            break
        while dec.decode(st, base + 1) == 0:
            k += 1
            if k > se:
                raise ValueError("arith AC run past band end")
            base = 3 * (k - 1)
        sign = dec.decode(stats.fixed, 0)
        soff = base + 2
        m = dec.decode(st, soff)
        if m:
            if dec.decode(st, soff):
                m <<= 1
                soff = 189 if k <= kx else 217  # Table F.5 X2 chains
                while dec.decode(st, soff):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("arith AC magnitude overflow")
                    soff += 1
        v = m
        moff = soff + 14
        while m >> 1:
            m >>= 1
            if dec.decode(st, moff):
                v |= m
        v += 1
        blk[k] = (-v if sign else v) << al
        k += 1


def _arith_encode_ac_band(enc, stats, blk, atbl, kx, ss, se, al):
    """AC band [ss, se] via F.1.4.3 — mirror of the decode side;
    coefficients are coded at magnitude >> al."""
    st = stats.ac_area(atbl)
    ke = se
    while ke >= ss and not (abs(int(blk[ke])) >> al):
        ke -= 1
    k = ss
    while k <= ke:
        base = 3 * (k - 1)
        enc.encode(0, st, base)                # not EOB yet
        while not (abs(int(blk[k])) >> al):
            enc.encode(0, st, base + 1)
            k += 1
            base = 3 * (k - 1)
        enc.encode(1, st, base + 1)
        t = int(blk[k])
        sign = 1 if t < 0 else 0
        v = (-t if sign else t) >> al
        enc.encode(sign, stats.fixed, 0)
        soff = base + 2
        m = 0
        v -= 1
        if v:
            enc.encode(1, st, soff)
            m = 1
            v2 = v
            if v2 >> 1:
                v2 >>= 1
                enc.encode(1, st, soff)
                m <<= 1
                soff = 189 if k <= kx else 217
                while v2 >> 1:
                    v2 >>= 1
                    enc.encode(1, st, soff)
                    m <<= 1
                    soff += 1
        enc.encode(0, st, soff)
        moff = soff + 14
        while m >> 1:
            m >>= 1
            enc.encode(1 if m & v else 0, st, moff)
        k += 1
    if k <= se:
        enc.encode(1, st, 3 * (k - 1))         # EOB


def _arith_decode_ac_refine(dec, stats, blk, atbl, ss, se, al):
    """AC successive-approximation refinement via F.2.4.3.3: one
    correction decision per already-nonzero coefficient, newly-
    nonzero insertions at ±1<<al with a fixed-bin sign."""
    st = stats.ac_area(atbl)
    p1, m1 = 1 << al, -1 << al
    kex = se
    while kex >= ss and not blk[kex]:
        kex -= 1
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if k > kex and dec.decode(st, base):   # EOB
            break
        while True:
            if blk[k]:
                if dec.decode(st, base + 2):
                    blk[k] += p1 if blk[k] > 0 else m1
                break
            if dec.decode(st, base + 1):
                blk[k] = m1 if dec.decode(stats.fixed, 0) else p1
                break
            k += 1
            if k > se:
                raise ValueError("arith AC refinement past band end")
            base = 3 * (k - 1)
        k += 1


def _arith_encode_ac_refine(enc, stats, blk, atbl, ss, se, al):
    """Mirror of _arith_decode_ac_refine (F.1.4.3.2)."""
    st = stats.ac_area(atbl)
    ke = se
    while ke >= ss and not (abs(int(blk[ke])) >> al):
        ke -= 1
    kex = ke
    while kex >= ss and not (abs(int(blk[kex])) >> (al + 1)):
        kex -= 1
    k = ss
    while k <= ke:
        base = 3 * (k - 1)
        if k > kex:
            enc.encode(0, st, base)
        while True:
            t = abs(int(blk[k])) >> al
            if t:
                if t >> 1:           # history nonzero: correction bit
                    enc.encode(t & 1, st, base + 2)
                else:                # newly nonzero
                    enc.encode(1, st, base + 1)
                    enc.encode(1 if int(blk[k]) < 0 else 0,
                               stats.fixed, 0)
                break
            enc.encode(0, st, base + 1)
            k += 1
            base = 3 * (k - 1)
        k += 1
    if k <= se:
        enc.encode(1, st, 3 * (k - 1))


def _arith_decode_block(dec, stats, ci, dtbl, atbl, cond_dc, kx,
                        differential=False):
    """One full sequential zigzag block: F.2.4.1 DC + F.2.4.2 AC.
    ``differential`` (hierarchical frames, T.81 F.2.1.3.1): the DC is
    coded with PRED = 0 — last_dc is zeroed before each block so the
    decoded value IS the block's DC; the conditioning context still
    classifies on the previous magnitude, mirrored exactly by the
    encoder."""
    blk = np.zeros(64, dtype=np.int64)
    if differential:
        stats.last_dc[ci] = 0
    _arith_decode_dc(dec, stats, ci, dtbl, cond_dc)
    blk[0] = stats.last_dc[ci]
    _arith_decode_ac_band(dec, stats, blk, atbl, kx, 1, 63, 0)
    return blk


def _arith_encode_block(enc, stats, blk, ci, dtbl, atbl, cond_dc, kx,
                        differential=False):
    """One full sequential zigzag block — mirror of
    _arith_decode_block."""
    if differential:
        stats.last_dc[ci] = 0
    _arith_encode_dc(enc, stats, ci, dtbl, cond_dc, int(blk[0]))
    _arith_encode_ac_band(enc, stats, blk, atbl, kx, 1, 63, 0)


def _decode_sequential_arith(sel, comps, coef, mcus_x, mcus_y, h_img,
                             w_img, hmax, vmax, restart_interval,
                             segments, dc_cond, ac_cond,
                             differential=False) -> None:
    """Sequential arithmetic scan body: the same _scan_units MCU walk
    as the Huffman path, entropy decisions through the QM decoder.
    Each restart segment is an independent coder with fresh statistics
    (F.1.4.0). Unit bound: at the most-skewed Qe state (0x0001) an MPS
    decision costs ~1/32767 bit amortized, and a coded unit needs at
    least one decision, so the format's legal ceiling is
    ~8*32767 units/byte — _ARITH_UNITS_PER_BYTE bounds corrupt SOF
    dimension bombs without rejecting any legal stream (flat images
    legally reach ~131k units/byte; r12 used 8192 and rejected the
    repo's own flat-image encoder output)."""
    _check_scan_units(
        _scan_unit_count(sel, comps, mcus_x, mcus_y, h_img, w_img,
                         hmax, vmax),
        _ARITH_UNITS_PER_BYTE * sum(len(s) for s in segments) + 4096,
        _MAX_SCAN_UNITS)
    seg_idx = 0
    dec = _QmDecoder(segments[0])
    stats = _ArithStats(len(comps))
    ids = {ci: (d, a) for ci, d, a in sel}
    for uidx, blocks in enumerate(_scan_units(
            sel, comps, mcus_x, mcus_y, h_img, w_img, hmax, vmax)):
        if restart_interval and uidx and uidx % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("missing RST segment in JPEG scan")
            dec = _QmDecoder(segments[seg_idx])
            stats = _ArithStats(len(comps))
        for ci, by, bx in blocks:
            dtbl, atbl = ids[ci]
            coef[ci][by, bx] = _arith_decode_block(
                dec, stats, ci, dtbl, atbl,
                dc_cond.get(dtbl, (0, 1)), ac_cond.get(atbl, 5),
                differential)


def _decode_sequential_huffman(sel, comps, coef, mcus_x, mcus_y,
                               h_img, w_img, hmax, vmax,
                               restart_interval, segments,
                               differential=False) -> None:
    """Sequential Huffman scan body — factored out of _decode_jpeg
    (r13) so hierarchical differential frames (T.81 Annex J) reuse
    it. ``differential``: the DC is coded with PRED = 0
    (F.2.1.3.1) — the decoded category value IS the block's DC and
    the per-component predictors stay unused. Every coded block
    costs >= 2 Huffman bits (DC symbol + EOB), so units beyond the
    scan's bit budget mean corruption-inflated SOF dimensions —
    checked against the DECLARED unit count upfront in O(1)."""
    _check_scan_units(
        _scan_unit_count(sel, comps, mcus_x, mcus_y, h_img,
                         w_img, hmax, vmax),
        4 * sum(len(s) for s in segments) + 8,
        _MAX_SCAN_UNITS)
    seg_idx = 0
    br = _BitReader(segments[0])
    preds = [0] * len(comps)
    luts = {ci: (dc, ac) for ci, dc, ac in sel}
    for uidx, blocks in enumerate(_scan_units(
            sel, comps, mcus_x, mcus_y, h_img, w_img,
            hmax, vmax)):
        if restart_interval and uidx \
                and uidx % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError(
                    "missing RST segment in JPEG scan")
            br = _BitReader(segments[seg_idx])
            preds = [0] * len(comps)
        for ci, by, bx in blocks:
            dc_lut, ac_lut = luts[ci]
            if dc_lut is None or ac_lut is None:
                raise ValueError(
                    "JPEG scan references missing DHT")
            blk = np.zeros(64, dtype=np.int64)
            t = _decode_symbol(br, dc_lut)
            d = _extend(br.receive(t), t)
            if differential:
                blk[0] = d
            else:
                preds[ci] += d
                blk[0] = preds[ci]
            k = 1
            while k < 64:
                rs = _decode_symbol(br, ac_lut)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    break        # EOB
                k += r
                if k > 63:
                    raise ValueError("AC run past block end")
                blk[k] = _extend(br.receive(s), s)
                k += 1
            coef[ci][by, bx] = blk


def _decode_progressive_arith(scans, comps, coef, mcus_x, mcus_y,
                              h_img, w_img, hmax, vmax,
                              differential=False) -> None:
    """SOF10 progressive-arithmetic scan decoding (T.81 G.2, r12) —
    the same four scan kinds as the Huffman progressive path, entropy
    decisions through the QM coder:

    - DC first (Ss=0, Ah=0): sequential DC procedure on Al-scaled
      diffs, stored << Al;
    - DC refinement (Ah>0): one FIXED-bin decision per block ORing
      in 1<<Al;
    - AC first (Ss>0, Ah=0): the band form of the sequential AC
      procedure, values stored << Al (no EOB runs — the per-block
      EOB decision replaces them);
    - AC refinement (Ah>0): per-coefficient correction decisions for
      nonzero history, ±1<<Al insertions with fixed-bin signs, EOB
      decisions only past the previous stage's end-of-block (kex).

    Statistics reset per scan and per restart segment; conditioning
    is the SOS-time snapshot (a DAC between scans only affects later
    scans, r12 review). Same _ARITH_UNITS_PER_BYTE corruption bound
    as the sequential scan."""
    for sel, ss, se, ah, al, rst, segments, dc_cond, ac_cond in scans:
        if len(sel) > 1 and ss != 0:
            raise ValueError("progressive AC scan must be "
                             "single-component")
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan with Se>0")
        _check_scan_units(
            _scan_unit_count(sel, comps, mcus_x, mcus_y, h_img,
                             w_img, hmax, vmax),
            _ARITH_UNITS_PER_BYTE * sum(len(s) for s in segments)
            + 4096,
            _MAX_SCAN_UNITS)
        seg_idx = 0
        dec = _QmDecoder(segments[0])
        stats = _ArithStats(len(comps))
        ids = {ci: (d, a) for ci, d, a in sel}
        p1 = 1 << al
        for uidx, blocks in enumerate(_scan_units(
                sel, comps, mcus_x, mcus_y, h_img, w_img, hmax, vmax)):
            if rst and uidx and uidx % rst == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("missing RST segment in JPEG scan")
                dec = _QmDecoder(segments[seg_idx])
                stats = _ArithStats(len(comps))
            for ci, by, bx in blocks:
                dtbl, atbl = ids[ci]
                blk = coef[ci][by, bx]
                if ss == 0:
                    if ah == 0:      # DC first
                        if differential:   # PRED = 0 per block (J.1)
                            stats.last_dc[ci] = 0
                        _arith_decode_dc(dec, stats, ci, dtbl,
                                         dc_cond.get(dtbl, (0, 1)))
                        blk[0] = stats.last_dc[ci] << al
                    else:            # DC refinement: fixed bin
                        if dec.decode(stats.fixed, 0):
                            blk[0] |= p1
                elif ah == 0:        # AC first
                    _arith_decode_ac_band(dec, stats, blk, atbl,
                                          ac_cond.get(atbl, 5),
                                          ss, se, al)
                else:                # AC refinement
                    _arith_decode_ac_refine(dec, stats, blk, atbl,
                                            ss, se, al)


def _scan_unit_count(sel, comps, mcus_x, mcus_y, h_img, w_img,
                     hmax, vmax) -> int:
    """Number of units _scan_units will yield — computed UPFRONT so
    corruption-inflated SOF dimensions dead-letter in O(1) instead of
    spinning through millions of zero-fed block decodes before the
    in-loop bound trips (r13: the r12-advice bound correction made
    the legal units/byte ceiling 32× larger, which turned the old
    iterate-until-the-bound rejection into a multi-minute spin)."""
    if len(sel) > 1:
        return mcus_x * mcus_y
    ci = sel[0][0]
    _, hi, vi, _ = comps[ci]
    cw = -(-(w_img * hi) // hmax)
    ch = -(-(h_img * vi) // vmax)
    return (-(-ch // 8)) * (-(-cw // 8))


def _scan_units(sel, comps, mcus_x, mcus_y, h_img, w_img, hmax, vmax):
    """Block traversal for one scan: interleaved scans walk the MCU
    grid (each component contributing its vi×hi blocks per MCU);
    single-component scans raster over the component's CODED block
    grid — ceil(ceil(dim·fac/fac_max)/8) — which is smaller than the
    MCU-padded store for subsampled components. Yields lists of
    (comp_idx, block_y, block_x); one list = one restart unit."""
    if len(sel) > 1:
        for mcu in range(mcus_x * mcus_y):
            my, mx = divmod(mcu, mcus_x)
            blocks = []
            for ci, _dc, _ac in sel:
                _, hi, vi, _ = comps[ci]
                blocks.extend(
                    (ci, my * vi + v, mx * hi + hh)
                    for v in range(vi) for hh in range(hi))
            yield blocks
    else:
        ci = sel[0][0]
        _, hi, vi, _ = comps[ci]
        cw = -(-(w_img * hi) // hmax)
        ch = -(-(h_img * vi) // vmax)
        for by in range(-(-ch // 8)):
            for bx in range(-(-cw // 8)):
                yield [(ci, by, bx)]


def _decode_progressive_scans(scans, comps, coef, mcus_x, mcus_y,
                              h_img, w_img, hmax, vmax,
                              differential=False) -> None:
    """T.81 Annex G progressive (Huffman) scan decoding into the
    shared zigzag coefficient store — the successive-approximation /
    spectral-selection algorithms as in libjpeg's jdphuff.c:

    - DC first (Ss=0, Ah=0): baseline DC diffs, value << Al; may be
      interleaved (MCU order) or single-component;
    - DC refinement (Ah>0): one raw bit per block ORed in at Al;
    - AC first (Ss>0, Ah=0): band [Ss, Se] with EOB-run coding;
    - AC refinement (Ah>0): ±1<<Al insertions plus one correction
      bit for every already-nonzero coefficient visited, including
      the EOB-run tail.

    AC scans are single-component by spec; their block raster covers
    only the component's CODED blocks (ceil(comp_dim/8)), which is
    smaller than the MCU-padded store for subsampled components.
    Restart markers reset DC predictors and the EOB run."""
    for sel, ss, se, ah, al, rst, segments, _dcc, _acc in scans:
        interleaved = len(sel) > 1
        if interleaved and ss != 0:
            raise ValueError("progressive AC scan must be "
                             "single-component")

        def units():
            return _scan_units(sel, comps, mcus_x, mcus_y,
                               h_img, w_img, hmax, vmax)

        # corruption-inflated SOF dimensions dead-letter in O(1)
        # (r13, closing the gap the sequential/lossless paths closed
        # in r11): the cheapest legal progressive unit coverage is an
        # EOB-run — EOBn(14) covers 32767 units in ~16 bits, ~16k
        # units/byte — so 2^16 units/byte never rejects legal data
        _check_scan_units(
            _scan_unit_count(sel, comps, mcus_x, mcus_y, h_img,
                             w_img, hmax, vmax),
            65536 * sum(len(s) for s in segments) + 4096,
            _MAX_SCAN_UNITS)
        seg_idx = 0
        br = _BitReader(segments[0])
        preds = [0] * len(comps)
        eobrun = 0
        p1, m1 = 1 << al, -(1 << al)
        luts = {ci: (dc, ac) for ci, dc, ac in sel}  # hoisted: the
        #   per-block loop is the decode hot path
        for uidx, blocks in enumerate(units()):
            if rst and uidx and uidx % rst == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("missing RST segment in JPEG scan")
                br = _BitReader(segments[seg_idx])
                preds = [0] * len(comps)
                eobrun = 0
            for ci, by, bx in blocks:
                blk = coef[ci][by, bx]
                dc_lut, ac_lut = luts[ci]
                if ss == 0:
                    if se != 0:
                        raise ValueError("progressive DC scan with Se>0")
                    if ah == 0:      # DC first
                        if dc_lut is None:
                            raise ValueError(
                                "JPEG scan references missing DHT")
                        t = _decode_symbol(br, dc_lut)
                        d = _extend(br.receive(t), t)
                        if differential:   # PRED = 0 per block (J.1)
                            blk[0] = d << al
                        else:
                            preds[ci] += d
                            blk[0] = preds[ci] << al
                    else:            # DC refinement: one raw bit
                        if br.receive(1):
                            blk[0] |= p1
                elif ah == 0:        # AC first (G.1.2.2)
                    if eobrun:
                        eobrun -= 1
                        continue
                    if ac_lut is None:
                        raise ValueError("JPEG scan references missing DHT")
                    k = ss
                    while k <= se:
                        rs = _decode_symbol(br, ac_lut)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r != 15:
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += br.receive(r)
                                break
                            k += 16      # ZRL
                        else:
                            k += r
                            if k > se:
                                raise ValueError("AC run past band end")
                            blk[k] = _extend(br.receive(s), s) << al
                            k += 1
                else:                # AC refinement (G.1.2.3)
                    if ac_lut is None:
                        raise ValueError("JPEG scan references missing DHT")
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = _decode_symbol(br, ac_lut)
                            r, s = rs >> 4, rs & 0x0F
                            val = 0
                            if s:
                                if s != 1:
                                    raise ValueError(
                                        "invalid AC refinement symbol")
                                val = p1 if br.receive(1) else m1
                            elif r != 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += br.receive(r)
                                break
                            # advance past r zero-history positions,
                            # emitting a correction bit at every
                            # nonzero-history coefficient on the way
                            while k <= se:
                                if blk[k]:
                                    if br.receive(1) and not (blk[k] & p1):
                                        blk[k] += p1 if blk[k] > 0 else m1
                                else:
                                    r -= 1
                                    if r < 0:
                                        break
                                k += 1
                            if s and k <= se:
                                blk[k] = val
                            k += 1
                    if eobrun:
                        while k <= se:   # EOB-run tail corrections
                            if blk[k] and br.receive(1) \
                                    and not (blk[k] & p1):
                                blk[k] += p1 if blk[k] > 0 else m1
                            k += 1
                        eobrun -= 1


def _ll_predict(p, y: int, x: int, sel: int, default: int) -> int:
    """Lossless predictor Px for plane ``p`` at (y, x) — T.81 H.1.2.1
    (a = left, b = above, c = above-left; first row falls back to a,
    first column to b, the very first sample to the default)."""
    if y == 0:
        return default if x == 0 else int(p[y, x - 1])
    if x == 0:
        return int(p[y - 1, x])
    a = int(p[y, x - 1])
    b = int(p[y - 1, x])
    if sel == 1:
        return a
    if sel == 2:
        return b
    c = int(p[y - 1, x - 1])
    if sel == 3:
        return c
    if sel == 4:
        return a + b - c
    if sel == 5:
        return a + ((b - c) >> 1)
    if sel == 6:
        return b + ((a - c) >> 1)
    return (a + b) >> 1  # sel == 7


def _decode_lossless(h: int, w: int, ncomp: int, precision: int,
                     scans) -> np.ndarray:
    """Lossless-JPEG (SOF3, T.81 Annex H) scan decoding: Huffman
    categories + difference bits over one of 7 spatial predictors,
    modulo-65536 reconstruction, point transform Pt restored by a
    left shift. Components carry raw sample planes (no color
    transform is defined for the lossless process — scanned/DNG
    pipelines store components directly). Restart handling follows
    T.81 H.1.1/libjpeg: the first sample after an RST marker is
    predicted from the default and the REMAINDER OF THAT SAMPLE LINE
    uses the one-dimensional predictor (Ra), exactly like the first
    line of the scan; the selected predictor resumes on the next
    line. Samples-vs-bits bound (r11 review): corrupt SOF dimensions
    can't allocate or spin past the entropy data actually present."""
    for sel, ss, _se, _ah, al, ri, segments, _dcc, _acc in scans:
        # every coded sample costs ≥1 Huffman bit, so declared
        # dimensions beyond the scan's bit budget are malformed —
        # checked BEFORE the h*w allocation (decode-time DoS bound,
        # same class as the mp4 stsz/trun clamps)
        avail_bits = 8 * sum(len(s) for s in segments)
        if h * w * len(sel) > avail_bits:
            raise ValueError(
                f"lossless scan declares {h * w * len(sel)} samples "
                f"but carries only {avail_bits} bits")
    planes = [np.zeros((h, w), dtype=np.int64) for _ in range(ncomp)]
    shifts = [0] * ncomp
    for sel, ss, _se, _ah, al, ri, segments, _dcc, _acc in scans:
        pred_sel, pt = ss, al
        if not 1 <= pred_sel <= 7:
            raise ValueError(f"bad lossless predictor {pred_sel}")
        if precision - pt - 1 < 0:
            raise ValueError("point transform exceeds precision")
        default = 1 << (precision - pt - 1)
        idxs = [ci for ci, _dc, _ac in sel]
        luts = {ci: dc for ci, dc, _ac in sel}
        if any(luts[ci] is None for ci in idxs):
            raise ValueError("lossless scan references missing DHT")
        for ci in idxs:
            shifts[ci] = pt
        br = _BitReader(segments[0])
        seg_idx = 0
        mcu = 0
        reset = True
        oned_row = -1  # row forced to the 1-D predictor after a reset
        for y in range(h):
            for x in range(w):
                if ri and mcu and mcu % ri == 0:
                    seg_idx += 1
                    if seg_idx >= len(segments):
                        raise ValueError(
                            "missing RST segment in lossless scan")
                    br = _BitReader(segments[seg_idx])
                    reset = True
                for ci in idxs:
                    p = planes[ci]
                    if reset:
                        px = default
                    elif y == oned_row:
                        px = int(p[y, x - 1])   # 1-D Ra after a reset
                    else:
                        px = _ll_predict(p, y, x, pred_sel, default)
                    t = _decode_symbol(br, luts[ci])
                    if t == 16:           # category 16: no extra bits
                        diff = 32768
                    elif t > 16:
                        raise ValueError(
                            f"bad lossless difference category {t}")
                    else:
                        diff = _extend(br.receive(t), t) if t else 0
                    p[y, x] = (px + diff) & 0xFFFF
                if reset:
                    oned_row = y
                reset = False
                mcu += 1
    out = np.stack(
        [p << s for p, s in zip(planes, shifts)], axis=-1)
    dt = np.uint8 if precision <= 8 else np.uint16
    return out.astype(dt)


# ---------------------------------------------------------------------------
# Lossless ARITHMETIC coding (SOF11 / differential SOF15, T.81 H.1.2.2):
# the QM-coder with a two-dimensional conditioning model — the two
# causal differences Da = Ra - Rc (left column's vertical gradient)
# and Db = Rb - Rc (above row's horizontal gradient), each classified
# into the five previous-diff categories of the sequential-DC model
# (F.1.4.4.1.2, with the DAC (L, U) thresholds), give 5x5 = 25
# contexts of 4 decision bins (S0/SS/SP/SN), plus TWO
# magnitude-category trees (X1..X15 + M2..M15 = 29 bins each; the
# second tree serves the large-|Db| contexts) — 158 bins per
# component. The per-sample decision tree is the DC-difference tree
# of F.2.4.1. A difference whose conditioning samples fall outside
# the plane classifies as zero. Parity posture as for SOF9/SOF10:
# encoder and decoder are exact inverses pinned by round-trip tests
# (no arithmetic-lossless sample files or external codecs exist in
# this container).
# ---------------------------------------------------------------------------

_LL_STATS_BINS = 158
_LL_X1_SMALL = 100          # X tree 1: X at +0..14, M at +14..28
_LL_X1_LARGE = 129          # X tree 2, for large-|Db| contexts


def _ll_classify(d: int, lo: int, up: int) -> int:
    """5-way conditioning classification of a difference — 0 zero,
    1/2 +/- small, 3/4 +/- large — mirroring the sequential-DC
    previous-diff classification (magnitude category vs the (L, U)
    thresholds)."""
    if d == 0:
        return 0
    sign = 1 if d < 0 else 0
    v = (-d if sign else d) - 1
    m = 0
    if v:
        m = 1
        while v >> 1:
            v >>= 1
            m <<= 1
    if m < (1 << lo) >> 1:
        return 0
    if m > (1 << up) >> 1:
        return 3 + sign
    return 1 + sign


def _ll_ctx(p, y: int, x: int, lo: int, up: int) -> tuple[int, int]:
    """(context bin base, X-tree base) for sample (y, x) of stored
    plane ``p``."""
    da = db = 0
    if y > 0 and x > 0:
        c = int(p[y - 1, x - 1])
        da = int(p[y, x - 1]) - c
        db = int(p[y - 1, x]) - c
    ca = _ll_classify(da, lo, up)
    cb = _ll_classify(db, lo, up)
    xbase = _LL_X1_LARGE if cb >= 3 else _LL_X1_SMALL
    return 4 * (5 * ca + cb), xbase


def _ll_arith_decode_diff(dec, st, base: int, xbase: int) -> int:
    """One prediction difference via the F.2.4.1 decision tree."""
    if dec.decode(st, base) == 0:
        return 0
    sign = dec.decode(st, base + 1)
    soff = base + 2 + sign
    m = dec.decode(st, soff)
    if m:
        soff = xbase
        while dec.decode(st, soff):
            m <<= 1
            if m == 0x8000:
                raise ValueError(
                    "arith lossless magnitude overflow")
            soff += 1
    v = m
    moff = soff + 14
    while m >> 1:
        m >>= 1
        if dec.decode(st, moff):
            v |= m
    v += 1
    return -v if sign else v


def _ll_arith_encode_diff(enc, st, base: int, xbase: int,
                          diff: int) -> None:
    """Mirror of _ll_arith_decode_diff."""
    if diff == 0:
        enc.encode(0, st, base)
        return
    enc.encode(1, st, base)
    sign = 1 if diff < 0 else 0
    v = -diff if sign else diff
    enc.encode(sign, st, base + 1)
    soff = base + 2 + sign
    m = 0
    v -= 1
    if v:
        enc.encode(1, st, soff)
        m = 1
        v2 = v
        soff = xbase
        while v2 >> 1:
            v2 >>= 1
            enc.encode(1, st, soff)
            m <<= 1
            soff += 1
    enc.encode(0, st, soff)
    moff = soff + 14
    while m >> 1:
        m >>= 1
        enc.encode(1 if m & v else 0, st, moff)


def _ll_arith_sample_bound(n_samples: int, segments) -> None:
    """O(1) decode-bomb rejection for arithmetic lossless scans:
    every sample costs >= 1 QM decision at >= ~1/32767 bit, and the
    absolute ceiling mirrors _MAX_SCAN_UNITS in sample units
    (64 samples per 8x8-block unit)."""
    _check_scan_units(
        n_samples,
        _ARITH_UNITS_PER_BYTE * sum(len(s) for s in segments) + 4096,
        64 * _MAX_SCAN_UNITS,
        what="samples")


def _decode_lossless_arith(h: int, w: int, ncomp: int,
                           precision: int, scans) -> np.ndarray:
    """Lossless ARITHMETIC JPEG (SOF11) scan decoding: the
    _decode_lossless walk (predictors, point transform, mod-65536
    reconstruction, restart semantics) with the H.1.2.2 QM model
    above instead of Huffman categories. Statistics and the coder
    reset at every restart segment (F.1.4.0); prediction resets
    exactly like the Huffman path (default, then the 1-D predictor
    for the remainder of the restart row)."""
    for sel, ss, _se, _ah, al, ri, segments, _dcc, _acc in scans:
        _ll_arith_sample_bound(h * w * len(sel), segments)
    planes = [np.zeros((h, w), dtype=np.int64) for _ in range(ncomp)]
    shifts = [0] * ncomp
    for sel, ss, _se, _ah, al, ri, segments, dcc, _acc in scans:
        pred_sel, pt = ss, al
        if not 1 <= pred_sel <= 7:
            raise ValueError(f"bad lossless predictor {pred_sel}")
        if precision - pt - 1 < 0:
            raise ValueError("point transform exceeds precision")
        default = 1 << (precision - pt - 1)
        idxs = [ci for ci, _dc, _ac in sel]
        conds = {ci: dcc.get(dtbl, (0, 1)) for ci, dtbl, _ac in sel}
        for ci in idxs:
            shifts[ci] = pt
        dec = _QmDecoder(segments[0])
        stats = {ci: bytearray(_LL_STATS_BINS) for ci in idxs}
        seg_idx = 0
        mcu = 0
        reset = True
        oned_row = -1
        for y in range(h):
            for x in range(w):
                if ri and mcu and mcu % ri == 0:
                    seg_idx += 1
                    if seg_idx >= len(segments):
                        raise ValueError(
                            "missing RST segment in lossless scan")
                    dec = _QmDecoder(segments[seg_idx])
                    stats = {ci: bytearray(_LL_STATS_BINS)
                             for ci in idxs}
                    reset = True
                for ci in idxs:
                    p = planes[ci]
                    if reset:
                        px = default
                    elif y == oned_row:
                        px = int(p[y, x - 1])
                    else:
                        px = _ll_predict(p, y, x, pred_sel, default)
                    lo, up = conds[ci]
                    base, xbase = _ll_ctx(p, y, x, lo, up)
                    diff = _ll_arith_decode_diff(
                        dec, stats[ci], base, xbase)
                    p[y, x] = (px + diff) & 0xFFFF
                if reset:
                    oned_row = y
                reset = False
                mcu += 1
    out = np.stack(
        [p << s for p, s in zip(planes, shifts)], axis=-1)
    dt = np.uint8 if precision <= 8 else np.uint16
    return out.astype(dt)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline/extended-sequential or progressive JPEG →
    ndarray of shape (h, w, 1) for grayscale or (h, w, 3) RGB (JFIF
    BT.601 full-range YCbCr inverse); uint8 for 8-bit precision,
    uint16 for 12-bit (SOF1 extended sequential — the scanned-
    document/medical shape, r11). See module docstring for the
    supported profile. Truncated/corrupt payloads raise ValueError
    (the dead-letter contract), never a bare struct.error/IndexError
    from the header arithmetic."""
    try:
        return _decode_jpeg(payload)
    except (IndexError, KeyError, struct.error, OverflowError,
            ZeroDivisionError, MemoryError) as exc:
        # fuzzing-confirmed escapes (r10 review): KeyError from a SOF
        # referencing an undeclared DQT id, OverflowError from a
        # corrupt DHT emitting a >63 size category into the int64
        # block, ZeroDivisionError from a zero sampling factor.
        # MemoryError (r11 review): SOF dimensions are corruption-
        # controlled — a 34 GB plane allocation from a 50-byte payload
        # is a malformed file, not an engine OOM (the bits-vs-samples
        # bounds in the scan loops keep the small-allocation spin
        # case out too).
        raise ValueError(
            f"malformed JPEG payload: {type(exc).__name__}: {exc}"
        ) from exc


def _parse_dqt(body: bytes, qtables: dict) -> None:
    """DQT segment → natural-order (8, 8) tables (pq=1 is 16-bit)."""
    i = 0
    while i < len(body):
        pq, tq = body[i] >> 4, body[i] & 0x0F
        i += 1
        if pq:
            vals = np.frombuffer(body, dtype=">u2", count=64,
                                 offset=i).astype(np.int64)
            i += 128
        else:
            vals = np.frombuffer(body, dtype=np.uint8, count=64,
                                 offset=i).astype(np.int64)
            i += 64
        q = np.zeros(64, dtype=np.int64)
        q[ZIGZAG] = vals
        qtables[tq] = q.reshape(8, 8)


def _parse_dht(body: bytes, dc_luts: dict, ac_luts: dict) -> None:
    """DHT segment → decode LUTs keyed by table id."""
    i = 0
    while i < len(body):
        tc, th = body[i] >> 4, body[i] & 0x0F
        counts = list(body[i + 1:i + 17])
        nsym = sum(counts)
        symbols = body[i + 17:i + 17 + nsym]
        (ac_luts if tc else dc_luts)[th] = _build_decode_lut(
            counts, symbols)
        i += 17 + nsym


def _parse_dac(body: bytes, dc_cond: dict, ac_cond: dict) -> None:
    """DAC segment (B.2.4.3) → conditioning, validated."""
    i = 0
    while i + 2 <= len(body):
        cls, tid = body[i] >> 4, body[i] & 0x0F
        val = body[i + 1]
        i += 2
        if cls == 0:
            lo, up = val & 0x0F, val >> 4
            if lo > up:
                raise ValueError(
                    f"DAC DC conditioning L {lo} > U {up}")
            dc_cond[tid] = (lo, up)
        else:
            if not 1 <= val <= 63:
                raise ValueError(f"DAC AC Kx {val} out of range")
            ac_cond[tid] = val


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")

    qtables: dict[int, np.ndarray] = {}
    dc_luts: dict[int, list] = {}
    ac_luts: dict[int, list] = {}
    frame = None          # (h, w, [(comp_id, hi, vi, tq), ...])
    progressive = False
    lossless = False      # SOF3: predictive, no DCT (T.81 Annex H)
    arith = False         # SOF9: QM-coded sequential (T.81 Annex D)
    precision = 8         # sample bits: 8 (baseline) or 12 (extended)
    restart_interval = 0
    dc_cond: dict[int, tuple] = {}   # DAC: table id -> (L, U)
    ac_cond: dict[int, int] = {}     # DAC: table id -> Kx
    adobe_transform = None           # APP14: 0=RGB/CMYK, 1=YCbCr, 2=YCCK
    # [( [(comp_idx, dc_lut, ac_lut), ...], Ss, Se, Ah, Al,
    #    restart_interval, segments ), ...] — luts snapshotted at SOS
    # time because DHT may redefine tables between progressive scans
    scans: list[tuple] = []

    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker sync lost at byte {pos}")
        # optional fill bytes before any marker (T.81 B.1.1.2)
        while pos + 2 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen

        if marker == 0xDB:  # DQT
            _parse_dqt(body, qtables)
        elif marker == 0xC4:  # DHT
            _parse_dht(body, dc_luts, ac_luts)
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA, 0xCB):
            # sequential / progressive / lossless, Huffman or
            # arithmetic (SOF11 = arithmetic lossless, r13)
            prec = body[0]
            h, w = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            lossless = marker in (0xC3, 0xCB)
            arith = marker in (0xC9, 0xCA, 0xCB)
            if lossless:
                if not 2 <= prec <= 16:
                    raise ValueError(f"bad lossless precision {prec}")
            elif prec not in (8, 12):
                raise NotImplementedError(f"{prec}-bit JPEG needs an "
                                          "injected decoder")
            precision = prec
            if ncomp not in (1, 3, 4):
                raise NotImplementedError(
                    f"{ncomp}-component JPEG needs an injected decoder")
            # 4-component lossless (r13): _decode_lossless is
            # component-generic; output is the raw stored planes
            # (h, w, 4) — no color transform is defined for the
            # lossless process (DNG/raw convention)
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            if lossless and any(c[1] != 1 or c[2] != 1 for c in comps):
                raise NotImplementedError(
                    "subsampled lossless JPEG needs an injected decoder")
            frame = (h, w, comps)
            progressive = marker in (0xC2, 0xCA)
        elif marker == 0xDE:  # DHP: hierarchical stream (Annex J)
            return _decode_hierarchical(payload)
        elif marker == 0xDF:
            raise ValueError(
                "EXP marker outside a hierarchical (DHP) stream")
        elif marker in (0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF):
            # differential frames are only legal after DHP (J.1) —
            # inside a hierarchical stream _decode_hierarchical owns
            # the walk, so reaching here means the DHP is missing
            raise ValueError(
                f"differential frame (SOF marker 0xFF{marker:02X}) "
                "without a preceding DHP marker")
        elif marker == 0xCC:  # DAC: arithmetic conditioning (B.2.4.3)
            _parse_dac(body, dc_cond, ac_cond)
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xEE:  # APP14: Adobe color-transform tag
            if body[:5] == b"Adobe" and len(body) >= 12:
                adobe_transform = body[11]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            sel = []
            comp_ids = [c[0] for c in frame[2]]
            for s in range(ns):
                cid, tt = body[1 + 2 * s:3 + 2 * s]
                # in an arithmetic scan the table slots carry the DAC
                # statistics-area IDS (ints), not Huffman LUTs
                sel.append((comp_ids.index(cid),
                            tt >> 4 if arith else dc_luts.get(tt >> 4),
                            tt & 0x0F if arith else ac_luts.get(tt & 0x0F)))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            segments, pos = _split_scan(payload, pos)
            # conditioning snapshotted at SOS time, like the Huffman
            # LUTs above: T.81 B.2.4.3 allows DAC between scans, and
            # a redefinition must only affect LATER scans (r12 review)
            scans.append((sel, ss, se, ahal >> 4, ahal & 0x0F,
                          restart_interval, segments,
                          dict(dc_cond), dict(ac_cond)))
            # keep parsing: progressive always has more scans, and
            # sequential MAY (per-component scans, T.81 A.2.2)
        # else: APPn / COM / DNL — skip

    if frame is None or not scans:
        raise ValueError("JPEG missing SOF/SOS")

    h_img, w_img, comps = frame

    if lossless:
        if arith:
            return _decode_lossless_arith(h_img, w_img, len(comps),
                                          precision, scans)
        return _decode_lossless(h_img, w_img, len(comps), precision,
                                scans)

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))
    n_mcus = mcus_x * mcus_y

    # frame admission BEFORE the coefficient-store allocation (r13
    # self-review): dimensions whose block count exceeds what ALL
    # the stream's entropy bytes could legally carry (the loosest
    # per-unit cost, the arithmetic format floor) are corruption —
    # ValueError; a format-plausible giant frame (>33-Mpixel camera
    # JPEG) is legal but beyond the pure-python tier, so it routes
    # to the injected-decoder seam. The per-scan _check_scan_units
    # draws the same line per scan with coder-exact ratios.
    declared_blocks = mcus_x * mcus_y * sum(
        c[1] * c[2] for c in comps)
    entropy_bytes = sum(
        len(s) for sc in scans for s in sc[6])
    _check_scan_units(
        declared_blocks,
        _ARITH_UNITS_PER_BYTE * entropy_bytes + 4096,
        4 * _MAX_SCAN_UNITS)

    # per-component zigzag coefficient store, (blocks_y, blocks_x, 64)
    coef = [np.zeros((mcus_y * c[2], mcus_x * c[1], 64), dtype=np.int64)
            for c in comps]

    if progressive:
        if arith:
            _decode_progressive_arith(
                scans, comps, coef, mcus_x, mcus_y, h_img, w_img,
                hmax, vmax)
        else:
            _decode_progressive_scans(
                scans, comps, coef, mcus_x, mcus_y, h_img, w_img,
                hmax, vmax)
    else:
        # Sequential: usually ONE interleaved scan, but T.81 also
        # allows the components split across scans (e.g. a Y scan
        # then a Cb scan then a Cr scan — non-interleaved scans walk
        # the component's coded block grid). Partial-subset
        # INTERLEAVED scans (2 of 3 components in one scan) are rare
        # enough to stay on the injected path.
        for sel, _ss, _se, _ah, _al, restart_interval, segments, \
                dc_cond, ac_cond in scans:
            if 1 < len(sel) < len(comps):
                raise NotImplementedError(
                    "partially-interleaved sequential JPEG scan needs "
                    "an injected decoder")
            if arith:
                _decode_sequential_arith(
                    sel, comps, coef, mcus_x, mcus_y, h_img, w_img,
                    hmax, vmax, restart_interval, segments,
                    dc_cond, ac_cond)
                continue
            _decode_sequential_huffman(
                sel, comps, coef, mcus_x, mcus_y, h_img, w_img,
                hmax, vmax, restart_interval, segments)

    # dequantize + dezigzag + IDCT, whole component at once
    planes = []
    for ci, (_, hi, vi, tq) in enumerate(comps):
        # qtable is stored natural-order (8,8); coefficients are
        # zigzag-ordered, so read the table back in zigzag order
        zz = coef[ci] * qtables[tq].reshape(64)[ZIGZAG][
            np.newaxis, np.newaxis, :]
        blocks = np.zeros(zz.shape, dtype=np.float64)
        blocks[:, :, ZIGZAG] = zz
        by, bx = blocks.shape[:2]
        f = blocks.reshape(by, bx, 8, 8)
        mid = float(1 << (precision - 1))
        maxv = (1 << precision) - 1
        dt = np.uint8 if precision == 8 else np.uint16
        spatial = np.einsum("ui,abuv,vj->abij", _M, f, _M) + mid
        plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        plane = np.clip(np.round(plane), 0, maxv).astype(dt)
        # upsample to full resolution, crop to image dims
        if vmax % vi or hmax % hi:
            raise NotImplementedError(
                f"non-integer-ratio sampling factors ({hi},{vi}) vs "
                f"({hmax},{vmax}) need an injected decoder")
        plane = plane.repeat(vmax // vi, axis=0).repeat(hmax // hi, axis=1)
        planes.append(plane[:h_img, :w_img])

    return _assemble_color(planes, precision, adobe_transform)


def _assemble_color(planes, precision: int, adobe_transform):
    """Full-resolution component planes → output pixel array
    ((h, w, 1) gray / (h, w, 3) RGB): the YCbCr / Adobe-RGB /
    CMYK / YCCK conversion tail shared by the sequential and (r13)
    hierarchical decode paths."""
    if len(planes) == 1:
        return planes[0][:, :, np.newaxis].astype(
            np.uint8 if precision == 8 else np.uint16)
    mid = float(1 << (precision - 1))
    maxv = (1 << precision) - 1
    dt = np.uint8 if precision == 8 else np.uint16

    def inv_ycc(y, cb, cr):
        y = y.astype(np.float64)
        cb = cb.astype(np.float64) - mid
        cr = cr.astype(np.float64) - mid
        return np.stack([
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ], axis=-1)

    if len(planes) == 4:
        # CMYK (r12): with an APP14 Adobe tag the samples are stored
        # INVERTED (stored = maxv - ink; the Adobe convention, and
        # transform 2 = YCCK additionally runs the YCbCr transform
        # over the first three); WITHOUT the tag a plain CMYK file
        # stores ink values directly, so white is C=M=Y=K=0 — the
        # libjpeg-family rule: invert only when the Adobe marker
        # says so (r12 review caught the unconditional inversion).
        # Output is RGB via the naive separation inverse
        # R = (maxv-C)·(maxv-K)/maxv — the downstream media tier
        # stays uniform ((h, w, 3)); color-managed production
        # injects a real CMS through the decode_image seam.
        if adobe_transform == 2:
            cmyi = np.clip(np.round(
                inv_ycc(planes[0], planes[1], planes[2])), 0, maxv)
            ki = planes[3].astype(np.float64)[:, :, np.newaxis]
        elif adobe_transform is not None:
            cmyi = np.stack([p.astype(np.float64)
                             for p in planes[:3]], axis=-1)
            ki = planes[3].astype(np.float64)[:, :, np.newaxis]
        else:
            cmyi = maxv - np.stack([p.astype(np.float64)
                                    for p in planes[:3]], axis=-1)
            ki = (maxv
                  - planes[3].astype(np.float64))[:, :, np.newaxis]
        rgb = cmyi * ki / maxv
        return np.clip(np.round(rgb), 0, maxv).astype(dt)

    if adobe_transform == 0:
        # APP14 transform 0 with three components: RGB stored
        # directly, no color transform (the Adobe RGB shape)
        rgb = np.stack([p.astype(np.float64) for p in planes], axis=-1)
        return np.clip(np.round(rgb), 0, maxv).astype(dt)

    rgb = inv_ycc(planes[0], planes[1], planes[2])
    return np.clip(np.round(rgb), 0, maxv).astype(dt)


# --------------------------------------------------------------------------
# encoder (fixture generator / re-encode stage)
# --------------------------------------------------------------------------

#: flat quant table of ones — near-lossless, used by round-trip tests
QUANT_ONES = np.ones((8, 8), dtype=np.int64)

#: Annex-K-flavored luminance table (coarse) for size-over-fidelity runs
QUANT_STD_LUM = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)

# fixed-length Huffman tables carried in DHT: 12 DC categories at 4
# bits, the 162 baseline AC symbols plus the 14 progressive EOB-run
# symbols ((nbits<<4)|0, nbits 1..14) at 8 bits. Deliberately
# suboptimal-but-trivially-correct — the decoder reads whatever DHT
# declares, and fixtures don't need compression ratio.
_DC_COUNTS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_SYMBOLS = bytes(range(12))
_AC_SYMBOLS = bytes([0x00, 0xF0] + [r << 4 for r in range(1, 15)] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)])
_AC_COUNTS = [0, 0, 0, 0, 0, 0, 0, len(_AC_SYMBOLS), 0, 0, 0, 0, 0, 0, 0, 0]

# 12-bit (extended sequential, SOF1) tables: DC categories reach 15
# (T.81 table B.5 — level-shifted 12-bit DC sums span ±16384) and AC
# size categories reach 14, so the 8-bit tables above can't encode
# them. 16 DC codes at 5 bits; 226 AC codes at 8 bits.
_DC_COUNTS_12 = [0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_SYMBOLS_12 = bytes(range(16))

# lossless (SOF3) difference-category table: categories 0..16
# (category 16 = +32768 with no appended bits, T.81 H.1.2.2);
# 17 codes at 5 bits.
_DC_COUNTS_LL = [0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_SYMBOLS_LL = bytes(range(17))
_AC_SYMBOLS_12 = bytes([0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 15)])
_AC_COUNTS_12 = [0, 0, 0, 0, 0, 0, 0, len(_AC_SYMBOLS_12),
                 0, 0, 0, 0, 0, 0, 0, 0]


def _fdct_quant(plane: np.ndarray, q: np.ndarray,
                mid: float = 128.0) -> np.ndarray:
    """Plane (H, W) multiple-of-8 → zigzag-quantized int blocks
    (by, bx, 64). ``mid`` is the level shift (2^(precision-1))."""
    hh, ww = plane.shape
    by, bx = hh // 8, ww // 8
    f = (plane.astype(np.float64) - mid).reshape(by, 8, bx, 8)
    f = f.transpose(0, 2, 1, 3)
    coeffs = np.einsum("iu,abuv,jv->abij", _M, f, _M)
    quant = np.round(coeffs / q[np.newaxis, np.newaxis]).astype(np.int64)
    return quant.reshape(by, bx, 64)[:, :, ZIGZAG]


def _pad_to(plane: np.ndarray, hh: int, ww: int) -> np.ndarray:
    return np.pad(plane, ((0, hh - plane.shape[0]),
                          (0, ww - plane.shape[1])), mode="edge")


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                  dc_lut: dict, ac_lut: dict) -> int:
    diff = int(zz[0]) - pred
    t = _category(diff)
    code, ln = dc_lut[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_lut[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_lut[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_lut[0x00]
        bw.write(code, ln)
    return int(zz[0])


def _prep_blocks(img: np.ndarray, quant: np.ndarray,
                 subsample: bool | str, precision: int = 8,
                 adobe: int | None = None):
    """Shared encoder front half: RGB→YCbCr, chroma subsample, pad to
    the MCU grid, FDCT+quantize. Returns (h_img, w_img, factors,
    blocks) with blocks[ci] zigzag-ordered (by, bx, 64). 4-channel
    input is Adobe INVERTED-CMYK samples (stored = maxv - ink);
    ``adobe`` 2 (YCCK) runs the YCbCr transform over the first three
    channels, 0 stores them directly, 4:4:4 only. 3-channel input
    with ``adobe`` 0 stores RGB planes without the color transform."""
    mid = float(1 << (precision - 1))
    maxv = (1 << precision) - 1
    img = np.asarray(img)
    if img.size and (int(img.min()) < 0 or int(img.max()) > maxv):
        raise ValueError(
            f"encode_jpeg sample values out of [0, {maxv}] for "
            f"{precision}-bit precision")
    img = img.astype(np.int64)
    if img.ndim == 2:
        img = img[:, :, np.newaxis]
    h_img, w_img, ch = img.shape
    if ch not in (1, 3, 4):
        raise ValueError("encode_jpeg takes gray, RGB, or "
                         "inverted-CMYK input")
    if ch == 4:
        if subsample is not False:
            raise ValueError("CMYK encoding is 4:4:4 only")
        if adobe not in (0, 2):
            raise ValueError("4-channel input needs adobe_transform "
                             "0 (CMYK) or 2 (YCCK)")
        planes = [img[:, :, i].astype(np.float64) for i in range(4)]
        if adobe == 2:
            r, g, b = planes[0], planes[1], planes[2]
            planes[0] = 0.299 * r + 0.587 * g + 0.114 * b
            planes[1] = -0.168736 * r - 0.331264 * g + 0.5 * b + mid
            planes[2] = 0.5 * r - 0.418688 * g - 0.081312 * b + mid
        factors = [(1, 1)] * 4
    elif ch == 1:
        planes = [img[:, :, 0].astype(np.float64)]
        factors = [(1, 1)]
    elif ch == 3 and adobe == 0:
        if subsample is not False:
            raise ValueError("Adobe RGB encoding is 4:4:4 only")
        planes = [img[:, :, i].astype(np.float64) for i in range(3)]
        factors = [(1, 1)] * 3
    else:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + mid
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + mid
        if subsample is True or subsample == "420":
            he, we = (h_img + 1) & ~1, (w_img + 1) & ~1
            cbp = _pad_to(cb, he, we).reshape(he // 2, 2, we // 2, 2)
            crp = _pad_to(cr, he, we).reshape(he // 2, 2, we // 2, 2)
            planes = [y, cbp.mean(axis=(1, 3)), crp.mean(axis=(1, 3))]
            factors = [(2, 2), (1, 1), (1, 1)]
        elif subsample == "422":
            we = (w_img + 1) & ~1
            cbp = _pad_to(cb, h_img, we).reshape(h_img, we // 2, 2)
            crp = _pad_to(cr, h_img, we).reshape(h_img, we // 2, 2)
            planes = [y, cbp.mean(axis=2), crp.mean(axis=2)]
            factors = [(2, 1), (1, 1), (1, 1)]
        elif subsample is False:
            planes = [y, cb, cr]
            factors = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unknown subsample mode {subsample!r}")
    planes = [np.clip(np.round(p), 0, maxv) for p in planes]

    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))

    blocks = []
    for p, (hi, vi) in zip(planes, factors):
        padded = _pad_to(p, mcus_y * vi * 8, mcus_x * hi * 8)
        blocks.append(_fdct_quant(padded, quant, mid))
    return h_img, w_img, factors, blocks


def _segment(out: bytearray, marker: int, body: bytes) -> None:
    """Emit one marker segment (the single copy both encoders use)."""
    out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
    out.extend(body)


def _emit_headers(out: bytearray, sof_marker: int, h_img: int,
                  w_img: int, factors: list, quant: np.ndarray,
                  precision: int = 8, arithmetic: bool = False,
                  adobe: int | None = None) -> None:
    """SOI through DHT (shared by both encoders). This encoder emits
    only 8-bit DQT (pq=0); an entry >255 would silently wrap through
    astype(uint8) into a valid-looking but wrong bitstream, so reject
    it (baseline JPEG quality ladders never need >255 anyway —
    quality 1 tops out at 255). At 12-bit precision the DHT pair is
    the extended-category set (_DC_SYMBOLS_12/_AC_SYMBOLS_12)."""
    def segment(marker: int, body: bytes) -> None:
        _segment(out, marker, body)

    qflat = quant.reshape(64)
    if int(qflat.max()) > 255 or int(qflat.min()) < 1:
        raise ValueError(
            "encode_jpeg quant table entries must be in [1, 255] for "
            f"8-bit DQT; got range [{int(qflat.min())}, {int(qflat.max())}]")
    if adobe is not None:
        # APP14 Adobe tag: version 100, zero flags, transform byte
        segment(0xEE, b"Adobe" + struct.pack(">HHHB", 100, 0, 0, adobe))
    qz = qflat[ZIGZAG].astype(np.uint8)
    segment(0xDB, bytes([0x00]) + qz.tobytes())
    sof = struct.pack(">BHHB", precision, h_img, w_img, len(factors))
    for i, (hi, vi) in enumerate(factors):
        sof += bytes([i + 1, (hi << 4) | vi, 0])
    segment(sof_marker, sof)
    if arithmetic:
        # DAC instead of DHT: DC table 0 conditioning U=1, L=0; AC
        # table 0 Kx=5 (the T.81 defaults, emitted explicitly)
        segment(0xCC, bytes([0x00, 0x10, 0x10, 0x05]))
        return
    if precision == 12:
        segment(0xC4, bytes([0x00]) + bytes(_DC_COUNTS_12)
                + _DC_SYMBOLS_12)
        segment(0xC4, bytes([0x10]) + bytes(_AC_COUNTS_12)
                + _AC_SYMBOLS_12)
    else:
        segment(0xC4, bytes([0x00]) + bytes(_DC_COUNTS) + _DC_SYMBOLS)
        segment(0xC4, bytes([0x10]) + bytes(_AC_COUNTS) + _AC_SYMBOLS)


def encode_jpeg(img: np.ndarray, quant: np.ndarray = QUANT_ONES,
                subsample: bool | str = False,
                restart_interval: int = 0, precision: int = 8,
                arithmetic: bool = False,
                adobe_transform: int | None = None) -> bytes:
    """Encode an image — (h, w) / (h, w, 1) gray or (h, w, 3) RGB —
    as sequential JPEG. ``precision`` 8 emits baseline (SOF0, uint8
    samples); 12 emits extended sequential (SOF1, T.81 §B.2 — values
    in [0, 4095], 2048 level shift, the extended DC/AC category
    Huffman tables). ``subsample`` is False for 4:4:4, True or
    ``"420"`` for 4:2:0 (2×2-mean chroma), ``"422"`` for 4:2:2
    (1×2-mean chroma — pins the decoder's asymmetric upsample path);
    gray emits one component. One quant table serves all components
    (fixture simplicity). ``arithmetic`` emits SOF9 + DAC and codes
    the scan with the T.81 Annex D QM-coder instead of Huffman
    (8- or 12-bit; same DCT/quant pipeline either way).
    ``adobe_transform`` emits the APP14 Adobe tag: with 4-channel
    input (INVERTED-CMYK samples, the Adobe convention) pass 0 for
    direct CMYK storage or 2 for YCCK; with 3-channel input pass 0
    to store RGB planes without the YCbCr transform (r12)."""
    if precision not in (8, 12):
        raise ValueError("encode_jpeg precision must be 8 or 12")
    h_img, w_img, factors, blocks = _prep_blocks(img, quant, subsample,
                                                 precision,
                                                 adobe_transform)
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))

    if arithmetic:
        dc_lut = ac_lut = None
    elif precision == 12:
        dc_lut = _build_encode_lut(_DC_COUNTS_12, _DC_SYMBOLS_12)
        ac_lut = _build_encode_lut(_AC_COUNTS_12, _AC_SYMBOLS_12)
    else:
        dc_lut = _build_encode_lut(_DC_COUNTS, _DC_SYMBOLS)
        ac_lut = _build_encode_lut(_AC_COUNTS, _AC_SYMBOLS)

    out = bytearray(b"\xff\xd8")  # SOI

    sof_marker = 0xC9 if arithmetic else (0xC1 if precision == 12
                                          else 0xC0)
    _emit_headers(out, sof_marker, h_img, w_img, factors, quant,
                  precision, arithmetic, adobe_transform)
    if restart_interval:
        _segment(out, 0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(factors)])
    for i in range(len(factors)):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    _segment(out, 0xDA, sos)

    if arithmetic:
        def flush_qm(enc) -> None:
            out.extend(_qm_flush_stuffed(enc))

        qm = _QmEncoder()
        stats = _ArithStats(len(factors))
        n_mcus = mcus_x * mcus_y
        for mcu in range(n_mcus):
            if restart_interval and mcu and mcu % restart_interval == 0:
                flush_qm(qm)
                rst = (mcu // restart_interval - 1) % 8
                out.extend(bytes([0xFF, 0xD0 + rst]))
                qm = _QmEncoder()
                stats = _ArithStats(len(factors))
            my, mx = divmod(mcu, mcus_x)
            for ci, (hi, vi) in enumerate(factors):
                for v in range(vi):
                    for hh in range(hi):
                        zz = blocks[ci][my * vi + v, mx * hi + hh]
                        _arith_encode_block(qm, stats, zz, ci, 0, 0,
                                            (0, 1), 5)
        flush_qm(qm)
        out.extend(b"\xff\xd9")  # EOI
        return bytes(out)

    bw = _BitWriter()
    preds = [0] * len(factors)
    n_mcus = mcus_x * mcus_y
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.pad_to_byte()
            out.extend(bw.buf)
            bw = _BitWriter()
            rst = (mcu // restart_interval - 1) % 8
            out.extend(bytes([0xFF, 0xD0 + rst]))
            preds = [0] * len(factors)
        my, mx = divmod(mcu, mcus_x)
        for ci, (hi, vi) in enumerate(factors):
            for v in range(vi):
                for hh in range(hi):
                    zz = blocks[ci][my * vi + v, mx * hi + hh]
                    preds[ci] = _encode_block(bw, zz, preds[ci],
                                              dc_lut, ac_lut)
    bw.pad_to_byte()
    out.extend(bw.buf)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


def encode_jpeg_lossless(img: np.ndarray, predictor: int = 4,
                         pt: int = 0, precision: int | None = None,
                         restart_interval: int = 0,
                         arithmetic: bool = False) -> bytes:
    """Encode integer samples — (h, w) / (h, w, 1) / (h, w, 3) — as
    LOSSLESS JPEG (SOF3, T.81 Annex H): Huffman-coded prediction
    differences, no DCT, so decode returns the input bit-exactly
    (after the ``pt`` point transform, which drops the low ``pt``
    bits before coding and restores them as zeros). ``precision``
    2-16 defaults to the smallest covering the data (min 8).
    Components are stored raw (no color transform) in one
    interleaved scan. The write half proving _decode_lossless.
    ``arithmetic`` (r13) emits the SOF11 form: the same walk with
    every difference through the QM coder under the H.1.2.2
    two-gradient conditioning model — the write half proving
    _decode_lossless_arith."""
    if not 1 <= predictor <= 7:
        raise ValueError("lossless predictor must be 1..7")
    arr = np.asarray(img).astype(np.int64)
    if arr.ndim == 2:
        arr = arr[:, :, np.newaxis]
    h, w, ncomp = arr.shape
    if ncomp not in (1, 3, 4):
        raise ValueError(
            "encode_jpeg_lossless takes 1, 3, or 4 components")
    prec = precision or max(8, int(arr.max()).bit_length() if arr.size
                            else 8)
    if not 2 <= prec <= 16:
        raise ValueError("lossless precision must be 2..16")
    if arr.size and (int(arr.min()) < 0
                     or int(arr.max()) > (1 << prec) - 1):
        raise ValueError(f"samples out of [0, {(1 << prec) - 1}] for "
                         f"{prec}-bit lossless precision")
    if not 0 <= pt < prec:
        raise ValueError("point transform must be in [0, precision)")
    coded = arr >> pt
    default = 1 << (prec - pt - 1)

    out = bytearray(b"\xff\xd8")
    sof = struct.pack(">BHHB", prec, h, w, ncomp)
    for i in range(ncomp):
        sof += bytes([i + 1, 0x11, 0])
    _segment(out, 0xCB if arithmetic else 0xC3, sof)
    if arithmetic:
        _segment(out, 0xCC, bytes([0x00, 0x10]))   # DC cond L=0, U=1
    else:
        _segment(out, 0xC4, bytes([0x00]) + bytes(_DC_COUNTS_LL)
                 + _DC_SYMBOLS_LL)
    if restart_interval:
        _segment(out, 0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])
    sos += bytes([predictor, 0, pt])
    _segment(out, 0xDA, sos)

    lut = (None if arithmetic
           else _build_encode_lut(_DC_COUNTS_LL, _DC_SYMBOLS_LL))
    bw = _BitWriter()
    qm = _QmEncoder() if arithmetic else None
    stats = ([bytearray(_LL_STATS_BINS) for _ in range(ncomp)]
             if arithmetic else None)
    mcu = 0
    reset = True
    oned_row = -1  # row forced to the 1-D predictor after a reset
    for y in range(h):
        for x in range(w):
            if restart_interval and mcu and mcu % restart_interval == 0:
                if arithmetic:
                    out.extend(_qm_flush_stuffed(qm))
                    qm = _QmEncoder()
                    stats = [bytearray(_LL_STATS_BINS)
                             for _ in range(ncomp)]
                else:
                    bw.pad_to_byte()
                    out.extend(bw.buf)
                    bw = _BitWriter()
                out.extend(bytes(
                    [0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)]))
                reset = True
            for ci in range(ncomp):
                p = coded[:, :, ci]
                if reset:
                    px = default
                elif y == oned_row:
                    px = int(p[y, x - 1])   # 1-D Ra after a reset
                else:
                    px = _ll_predict(p, y, x, predictor, default)
                diff = (int(p[y, x]) - px) & 0xFFFF
                if diff >= 32768:
                    diff -= 65536
                if arithmetic:
                    base, xbase = _ll_ctx(p, y, x, 0, 1)
                    _ll_arith_encode_diff(qm, stats[ci], base, xbase,
                                          diff)
                elif diff == -32768:     # category 16: no extra bits
                    code, ln = lut[16]
                    bw.write(code, ln)
                else:
                    t = _category(diff)
                    code, ln = lut[t]
                    bw.write(code, ln)
                    if t:
                        bw.write(diff if diff >= 0
                                 else diff + (1 << t) - 1, t)
            if reset:
                oned_row = y
            reset = False
            mcu += 1
    if arithmetic:
        out.extend(_qm_flush_stuffed(qm))
    else:
        bw.pad_to_byte()
        out.extend(bw.buf)
    out.extend(b"\xff\xd9")
    return bytes(out)


def encode_jpeg_progressive(img: np.ndarray,
                            quant: np.ndarray = QUANT_ONES,
                            subsample: bool | str = False,
                            al: int = 1, band_split: int = 5,
                            arithmetic: bool = False,
                            adobe_transform: int | None = None) -> bytes:
    """Encode as PROGRESSIVE JPEG (SOF2) — the fixture write side for
    the progressive decoder, same reason the repo carries PNG/fMP4
    muxers in tests. The progression exercises every Annex-G decode
    path: interleaved DC first at Al=``al`` then one DC refinement
    per remaining bit; per component, AC first scans split at
    ``band_split`` (spectral selection + EOB runs + ZRL) at Al=``al``
    followed by the matching AC refinement scans (±1 insertions +
    correction bits + EOB-run tails), ported from libjpeg's
    jcphuff.c. Same fixed Huffman tables and 8-bit DQT as the
    baseline encoder; no restart markers. ``arithmetic`` emits the
    SOF10 form: the same scan script with every entropy decision
    through the QM coder (T.81 G.2) instead of Huffman codes.
    ``adobe_transform`` as in encode_jpeg (4-channel inverted-CMYK /
    Adobe RGB)."""
    h_img, w_img, factors, blocks = _prep_blocks(img, quant, subsample,
                                                 adobe=adobe_transform)
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))

    dc_lut = _build_encode_lut(_DC_COUNTS, _DC_SYMBOLS)
    ac_lut = _build_encode_lut(_AC_COUNTS, _AC_SYMBOLS)

    out = bytearray(b"\xff\xd8")
    _emit_headers(out, 0xCA if arithmetic else 0xC2,
                  h_img, w_img, factors, quant,
                  arithmetic=arithmetic, adobe=adobe_transform)

    def sos(comp_ids: list[int], ss: int, se: int, ah: int,
            al_: int) -> None:
        body = bytes([len(comp_ids)])
        for i in comp_ids:
            body += bytes([i + 1, 0x00])
        body += bytes([ss, se, (ah << 4) | al_])
        out.extend(struct.pack(">BBH", 0xFF, 0xDA, len(body) + 2))
        out.extend(body)

    def flush(bw: _BitWriter) -> None:
        bw.pad_to_byte()
        out.extend(bw.buf)

    def comp_blocks(ci: int):
        """The component's CODED block raster (non-interleaved)."""
        hi, vi = factors[ci]
        cw = -(-(w_img * hi) // hmax)
        chh = -(-(h_img * vi) // vmax)
        for by in range(-(-chh // 8)):
            for bx in range(-(-cw // 8)):
                yield blocks[ci][by, bx]

    if arithmetic:
        bands = [(1, band_split), (band_split + 1, 63)]

        def mcu_blocks():
            """Interleaved MCU walk: (ci, zigzag block) pairs."""
            for mcu in range(mcus_x * mcus_y):
                my, mx = divmod(mcu, mcus_x)
                for ci, (hi, vi) in enumerate(factors):
                    for v in range(vi):
                        for hh in range(hi):
                            yield ci, blocks[ci][my * vi + v,
                                                 mx * hi + hh]

        # DC first: interleaved, QM-coded diffs of (dc >> al)
        sos(list(range(len(factors))), 0, 0, 0, al)
        qm, stats = _QmEncoder(), _ArithStats(len(factors))
        for ci, blk in mcu_blocks():
            _arith_encode_dc(qm, stats, ci, 0, (0, 1),
                             int(blk[0]) >> al)
        out.extend(_qm_flush_stuffed(qm))
        # DC refinement: one fixed-bin decision per block per level
        for lvl in range(al - 1, -1, -1):
            sos(list(range(len(factors))), 0, 0, lvl + 1, lvl)
            qm, stats = _QmEncoder(), _ArithStats(len(factors))
            for _ci, blk in mcu_blocks():
                qm.encode((int(blk[0]) >> lvl) & 1, stats.fixed, 0)
            out.extend(_qm_flush_stuffed(qm))
        # AC first scans per component/band at Al=al
        for ci in range(len(factors)):
            for ss, se in bands:
                sos([ci], ss, se, 0, al)
                qm, stats = _QmEncoder(), _ArithStats(len(factors))
                for blk in comp_blocks(ci):
                    _arith_encode_ac_band(qm, stats, blk, 0, 5,
                                          ss, se, al)
                out.extend(_qm_flush_stuffed(qm))
        # AC refinement scans per level/component/band
        for lvl in range(al - 1, -1, -1):
            for ci in range(len(factors)):
                for ss, se in bands:
                    sos([ci], ss, se, lvl + 1, lvl)
                    qm, stats = _QmEncoder(), _ArithStats(len(factors))
                    for blk in comp_blocks(ci):
                        _arith_encode_ac_refine(qm, stats, blk, 0,
                                                ss, se, lvl)
                    out.extend(_qm_flush_stuffed(qm))
        out.extend(b"\xff\xd9")
        return bytes(out)

    # ---- DC first: interleaved, diffs of (dc >> al) --------------------
    sos(list(range(len(factors))), 0, 0, 0, al)
    bw = _BitWriter()
    preds = [0] * len(factors)
    for mcu in range(mcus_x * mcus_y):
        my, mx = divmod(mcu, mcus_x)
        for ci, (hi, vi) in enumerate(factors):
            for v in range(vi):
                for hh in range(hi):
                    dc = int(blocks[ci][my * vi + v, mx * hi + hh][0]) >> al
                    diff = dc - preds[ci]
                    preds[ci] = dc
                    t = _category(diff)
                    code, ln = dc_lut[t]
                    bw.write(code, ln)
                    if t:
                        bw.write(diff if diff >= 0
                                 else diff + (1 << t) - 1, t)
    flush(bw)

    # ---- DC refinement: one raw bit per block per level ----------------
    for lvl in range(al - 1, -1, -1):
        sos(list(range(len(factors))), 0, 0, lvl + 1, lvl)
        bw = _BitWriter()
        for mcu in range(mcus_x * mcus_y):
            my, mx = divmod(mcu, mcus_x)
            for ci, (hi, vi) in enumerate(factors):
                for v in range(vi):
                    for hh in range(hi):
                        dc = int(blocks[ci][my * vi + v, mx * hi + hh][0])
                        bw.write((dc >> lvl) & 1, 1)
        flush(bw)

    bands = [(1, band_split), (band_split + 1, 63)]

    # ---- AC first scans (jcphuff.c encode_mcu_AC_first) ----------------
    for ci in range(len(factors)):
        for ss, se in bands:
            sos([ci], ss, se, 0, al)
            bw = _BitWriter()
            eobrun = 0

            def emit_eobrun():
                nonlocal eobrun
                if eobrun > 0:
                    nbits = eobrun.bit_length() - 1
                    code, ln = ac_lut[nbits << 4]
                    bw.write(code, ln)
                    if nbits:
                        bw.write(eobrun - (1 << nbits), nbits)
                    eobrun = 0

            for blk in comp_blocks(ci):
                r = 0
                for k in range(ss, se + 1):
                    temp = int(blk[k])
                    mag = abs(temp) >> al
                    if mag == 0:
                        r += 1
                        continue
                    emit_eobrun()
                    while r > 15:
                        code, ln = ac_lut[0xF0]
                        bw.write(code, ln)
                        r -= 16
                    s = _category(mag)
                    code, ln = ac_lut[(r << 4) | s]
                    bw.write(code, ln)
                    v = mag if temp >= 0 else -mag
                    bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                    r = 0
                if r > 0:
                    eobrun += 1
                    if eobrun == (1 << 14):
                        emit_eobrun()
            emit_eobrun()
            flush(bw)

    # ---- AC refinement scans (jcphuff.c encode_mcu_AC_refine) ----------
    for lvl in range(al - 1, -1, -1):
        for ci in range(len(factors)):
            for ss, se in bands:
                sos([ci], ss, se, lvl + 1, lvl)
                bw = _BitWriter()
                eobrun = 0
                pending: list[int] = []  # correction bits owned by the
                #                          open EOB run (BE buffer)

                def emit_eobrun():
                    nonlocal eobrun
                    if eobrun > 0:
                        nbits = eobrun.bit_length() - 1
                        code, ln = ac_lut[nbits << 4]
                        bw.write(code, ln)
                        if nbits:
                            bw.write(eobrun - (1 << nbits), nbits)
                        eobrun = 0
                        for b in pending:
                            bw.write(b, 1)
                        pending.clear()

                for blk in comp_blocks(ci):
                    absv = [abs(int(blk[k])) >> lvl
                            for k in range(ss, se + 1)]
                    eob = 0  # band-relative index past the last new ±1
                    for i, a in enumerate(absv):
                        if a == 1:
                            eob = i + 1
                    r = 0
                    br_bits: list[int] = []  # this block's corrections
                    for i, a in enumerate(absv):
                        if a == 0:
                            r += 1
                            continue
                        while r > 15 and i < eob:
                            emit_eobrun()
                            code, ln = ac_lut[0xF0]
                            bw.write(code, ln)
                            r -= 16
                            for b in br_bits:
                                bw.write(b, 1)
                            br_bits = []
                        if a > 1:  # history coefficient: correction bit
                            br_bits.append(a & 1)
                            continue
                        emit_eobrun()
                        code, ln = ac_lut[(r << 4) | 1]
                        bw.write(code, ln)
                        bw.write(1 if int(blk[ss + i]) >= 0 else 0, 1)
                        for b in br_bits:
                            bw.write(b, 1)
                        br_bits = []
                        r = 0
                    if r > 0 or br_bits:
                        eobrun += 1
                        pending.extend(br_bits)
                        if eobrun == (1 << 14):
                            emit_eobrun()
                emit_eobrun()
                flush(bw)

    out.extend(b"\xff\xd9")
    return bytes(out)


# --------------------------------------------------------------------------
# QuickTime Motion-JPEG B field translation (r12 — VERDICT item 3)
# --------------------------------------------------------------------------
#
# Motion-JPEG B ('mjpb' stsd fourcc) stores each field WITHOUT the
# standard JPEG marker structure: a 40-byte field header carries
# offsets to the DQT / DHT / SOF / SOS segment payloads (each stored
# with its 2-byte length, marker byte dropped) and to the start of
# the entropy-coded data, which is NOT byte-stuffed (no 0x00 after
# 0xFF — the reason an mjpb access unit is not a valid JPEG).
# Reconstructing a standard interchange stream is therefore pure
# header work: re-prefix the markers, re-stuff the scan bytes, and
# the existing entropy decoder does the rest — zero new entropy code.
# Format reference: QuickTime File Format Specification, "Motion-JPEG
# B" field tables (public); ffmpeg's mjpegbdec.c documents the same
# offset semantics. The write half (jpeg_to_mjpegb) exists for
# fixtures/tests, the encode_gif / mux_mp4_video philosophy.

_MJPG_TAG = b"mjpg"

#: T.81 Annex K.3.3 "typical" Huffman tables — what a marker-less
#: MJPEG-B field IMPLIES when its Huffman-table offset is zero (the
#: QuickTime spec allows omitting the tables; ffmpeg's mjpegbdec
#: supplies the same defaults). (counts, symbols) per (class, id).
_K_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
             bytes(range(12)))
_K_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             bytes(range(12)))
_K_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], bytes([
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]))
_K_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], bytes([
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]))


def _default_dht_payload() -> bytes:
    """One DHT segment payload (with its length field) carrying all
    four Annex-K typical tables: DC/AC luminance as id 0, DC/AC
    chrominance as id 1."""
    body = bytearray()
    for tc_th, (counts, syms) in ((0x00, _K_DC_LUM), (0x10, _K_AC_LUM),
                                  (0x01, _K_DC_CHR), (0x11, _K_AC_CHR)):
        body += bytes([tc_th]) + bytes(counts) + syms
    return struct.pack(">H", len(body) + 2) + bytes(body)


def mjpegb_fields(unit: bytes) -> list[bytes]:
    """Split one MJPEG-B access unit into its field payloads via the
    header's offset-to-next-field word (r12 review: interlaced
    two-field samples used to silently decode as the top field only).
    Progressive samples return one field; interlaced return two."""
    fields = []
    pos = 0
    while True:
        if len(unit) - pos < 40:
            raise ValueError("MJPEG-B field shorter than its header")
        if unit[pos + 4:pos + 8] != _MJPG_TAG:
            raise ValueError("missing 'mjpg' field-header tag")
        field_size, _pad, nxt = struct.unpack_from(">III", unit, pos + 8)
        if not 40 <= field_size <= len(unit) - pos:
            raise ValueError(f"bad MJPEG-B field size {field_size}")
        fields.append(unit[pos:pos + field_size])
        if nxt == 0:
            return fields
        if nxt < 40 or pos + nxt + 40 > len(unit):
            raise ValueError(f"bad MJPEG-B next-field offset {nxt}")
        if len(fields) == 2:
            raise ValueError("MJPEG-B sample with more than two fields")
        pos += nxt


def _scan_jpeg_segments(jpeg: bytes):
    """Walk a standard interchange stream → (segments, scan_bytes):
    segments is {marker: [payload, ...]} with payloads EXCLUDING the
    length field; scan_bytes is the entropy data between SOS and EOI
    (still byte-stuffed). Restart markers are rejected — MJPEG-B
    forbids markers inside the coded data."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    segs: dict[int, list[bytes]] = {}
    i = 2
    while i + 4 <= len(jpeg):
        if jpeg[i] != 0xFF:
            raise ValueError(f"expected marker at {i}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad a
        # marker; "FF FF C4" is a legal DHT (r12 advice read the
        # second FF as the marker and a bogus length).
        while i + 4 <= len(jpeg) and jpeg[i + 1] == 0xFF:
            i += 1
        if i + 4 > len(jpeg):
            break
        marker = jpeg[i + 1]
        ln = struct.unpack_from(">H", jpeg, i + 2)[0]
        if ln < 2 or i + 2 + ln > len(jpeg):
            raise ValueError("truncated JPEG segment")
        segs.setdefault(marker, []).append(jpeg[i + 4:i + 2 + ln])
        i += 2 + ln
        if marker == 0xDA:
            # walk the stuffed scan to EOI
            j = i
            while j + 1 < len(jpeg):
                if jpeg[j] == 0xFF and jpeg[j + 1] not in (0x00,):
                    if jpeg[j + 1] == 0xD9:
                        return segs, jpeg[i:j]
                    if 0xD0 <= jpeg[j + 1] <= 0xD7:
                        raise ValueError(
                            "restart markers cannot be represented "
                            "in an MJPEG-B field")
                    raise ValueError(
                        f"unexpected marker 0xFF{jpeg[j + 1]:02X} "
                        "inside scan data")
                j += 2 if (jpeg[j] == 0xFF) else 1
            raise ValueError("JPEG scan missing EOI")
    raise ValueError("JPEG stream missing SOS")


def jpeg_to_mjpegb(jpeg: bytes) -> bytes:
    """Standard baseline JPEG → one MJPEG-B field (the WRITE half).
    Multiple DQT/DHT marker segments merge into the single table
    section each field-header offset allows; the scan data is
    UN-stuffed per the format. Only baseline SOF0 translates —
    MJPEG-B is an 8-bit baseline format."""
    segs, scan = _scan_jpeg_segments(jpeg)
    if 0xC0 not in segs:
        raise ValueError("MJPEG-B translation needs baseline SOF0")
    if 0xDD in segs:
        raise ValueError("DRI/restart streams cannot be MJPEG-B")

    def section(marker: int) -> bytes:
        body = b"".join(segs[marker])
        return struct.pack(">H", len(body) + 2) + body

    dqt = section(0xDB) if 0xDB in segs else b""
    dht = section(0xC4) if 0xC4 in segs else b""
    sof = section(0xC0)
    sos = section(0xDA)
    sod = scan.replace(b"\xff\x00", b"\xff")

    off = 40
    offs = []
    for part in (dqt, dht, sof, sos, sod):
        offs.append(off if part else 0)
        off += len(part)
    field_size = off
    hdr = struct.pack(">I4s8I", 0, _MJPG_TAG, field_size, field_size,
                      0, offs[0], offs[1], offs[2], offs[3], offs[4])
    return hdr + dqt + dht + sof + sos + sod


def mjpegb_to_jpeg(field: bytes) -> bytes:
    """One MJPEG-B field → a standard baseline JPEG interchange
    stream (the READ half): re-prefix FFDB/FFC4/FFC0/FFDA onto the
    stored segments, re-stuff the entropy bytes, delimit with
    SOI/EOI — the output feeds decode_jpeg unchanged. Malformed
    fields raise ValueError (the dead-letter contract)."""
    if len(field) < 40:
        raise ValueError("MJPEG-B field shorter than its header")
    if field[4:8] != _MJPG_TAG:
        raise ValueError("missing 'mjpg' field-header tag")
    (_res, _tag, field_size, _padded, _next, dqt_off, dht_off,
     sof_off, sos_off, sod_off) = struct.unpack(">I4s8I", field[:40])
    if not (40 <= field_size <= len(field)):
        raise ValueError(f"bad MJPEG-B field size {field_size}")
    if not (sof_off and sos_off and sod_off):
        raise ValueError("MJPEG-B field missing SOF/SOS/data offset")

    def section(off: int) -> bytes:
        if not 40 <= off <= field_size - 2:
            raise ValueError(f"MJPEG-B section offset {off} out of range")
        ln = struct.unpack_from(">H", field, off)[0]
        if ln < 2 or off + ln > field_size:
            raise ValueError("truncated MJPEG-B section")
        return field[off:off + ln]

    out = bytearray(b"\xff\xd8")
    if dqt_off:
        out += b"\xff\xdb" + section(dqt_off)
    if dht_off:
        out += b"\xff\xc4" + section(dht_off)
    else:
        # zero Huffman offset: the field implies the Annex-K typical
        # tables (QuickTime spec; ffmpeg's mjpegbdec does the same —
        # r12 review: these fields used to dead-letter on missing DHT)
        out += b"\xff\xc4" + _default_dht_payload()
    out += b"\xff\xc0" + section(sof_off)
    out += b"\xff\xda" + section(sos_off)
    if not 40 <= sod_off <= field_size:
        raise ValueError(f"MJPEG-B data offset {sod_off} out of range")
    out += field[sod_off:field_size].replace(b"\xff", b"\xff\x00")
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# hierarchical mode (T.81 Annex J)
# --------------------------------------------------------------------------

def _exp_upsample(plane: np.ndarray, eh: int, ev: int) -> np.ndarray:
    """T.81 J.1.1.2 reference expansion: output even samples copy the
    input, odd samples are the rounded mean of their neighbors, and
    the last odd column/row replicates the edge."""
    p = plane.astype(np.int64)
    if eh:
        h, w = p.shape
        out = np.zeros((h, 2 * w), dtype=np.int64)
        out[:, 0::2] = p
        out[:, 1:-1:2] = (p[:, :-1] + p[:, 1:] + 1) >> 1
        out[:, -1] = p[:, -1]
        p = out
    if ev:
        h, w = p.shape
        out = np.zeros((2 * h, w), dtype=np.int64)
        out[0::2, :] = p
        out[1:-1:2, :] = (p[:-1, :] + p[1:, :] + 1) >> 1
        out[-1, :] = p[-1, :]
        p = out
    return p


def _idct_spatial(zzblocks: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Zigzag int coefficient blocks (by, bx, 64) → spatial float
    plane (by·8, bx·8), dequantized, NO level shift (differential
    frames add straight onto the reference)."""
    zz = zzblocks * q.reshape(64)[ZIGZAG][np.newaxis, np.newaxis, :]
    blocks = np.zeros(zz.shape, dtype=np.float64)
    blocks[:, :, ZIGZAG] = zz
    by, bx = blocks.shape[:2]
    f = blocks.reshape(by, bx, 8, 8)
    sp = np.einsum("ui,abuv,vj->abij", _M, f, _M)
    return sp.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)


def _decode_lossless_diffs(fh: int, fw: int, sel, segments):
    """Differential-lossless scan (SOF7 with Px=0, T.81 J.1.5):
    Huffman category + extension bits per sample, returned as raw
    difference planes — the reference IS the prediction, so no
    spatial predictor runs. Sample-vs-bits bound as in
    _decode_lossless (every sample costs >= 1 bit)."""
    avail_bits = 8 * sum(len(s) for s in segments)
    if fh * fw * len(sel) > avail_bits:
        raise ValueError(
            f"lossless scan declares {fh * fw * len(sel)} samples "
            f"but carries only {avail_bits} bits")
    luts = [dc for _ci, dc, _ac in sel]
    if any(lut is None for lut in luts):
        raise ValueError("lossless scan references missing DHT")
    br = _BitReader(segments[0])
    planes = [np.zeros((fh, fw), dtype=np.int64) for _ in sel]
    for y in range(fh):
        for x in range(fw):
            for pi in range(len(sel)):
                t = _decode_symbol(br, luts[pi])
                if t == 16:           # category 16: no extra bits
                    diff = 32768
                elif t > 16:
                    raise ValueError(
                        f"bad lossless difference category {t}")
                else:
                    diff = _extend(br.receive(t), t) if t else 0
                planes[pi][y, x] = diff
    return planes


def _decode_lossless_diffs_arith(fh: int, fw: int, sel, segments,
                                 dcc):
    """Differential-lossless ARITHMETIC scan (SOF15 with Px=0,
    T.81 J.1.5 + H.1.2.2): the reference IS the prediction, so each
    coded value is the raw difference; the QM conditioning model runs
    on the stored (mod-65536) difference plane's own causal
    neighbors — the same walk both sides, pinned by round-trip tests.
    Same O(1) sample bound as the non-differential arithmetic
    path."""
    _ll_arith_sample_bound(fh * fw * len(sel), segments)
    conds = [dcc.get(dtbl, (0, 1)) for _ci, dtbl, _ac in sel]
    dec = _QmDecoder(segments[0])
    stats = [bytearray(_LL_STATS_BINS) for _ in sel]
    stored = [np.zeros((fh, fw), dtype=np.int64) for _ in sel]
    for y in range(fh):
        for x in range(fw):
            for pi in range(len(sel)):
                lo, up = conds[pi]
                base, xbase = _ll_ctx(stored[pi], y, x, lo, up)
                d = _ll_arith_decode_diff(dec, stats[pi], base,
                                          xbase)
                stored[pi][y, x] = d & 0xFFFF
    # reconstruction adds mod-65536, so the stored form IS the diff
    return stored


def _decode_hierarchical(payload: bytes) -> np.ndarray:
    """T.81 Annex J hierarchical decode (r13, VERDICT r12 item 3): a
    DHP-framed pyramid — one non-differential first frame, then EXP
    reference expansions and differential frames whose decoded output
    ADDS onto the reference components.

    Supported pyramid members (1-4 components; integer-ratio
    sampling factors for DCT frames — references live at COMPONENT
    resolution, so 4:2:0 pyramids carry half-resolution chroma
    references that EXP doubles alongside the luma): ANY
    non-differential first frame — sequential SOF0/SOF1/SOF9,
    progressive SOF2/SOF10 (scans accumulate into the frame's
    coefficient store), or lossless SOF3/SOF11 (scan tuples decode
    at frame end; the base level is then EXACT); differential
    sequential SOF5 (Huffman) / SOF13 (arithmetic) — DC coded with
    PRED=0, IDCT output added to the reference without level shift,
    clamped (J.1.1.3); differential PROGRESSIVE SOF6 / SOF14 (r13) —
    each SOS is an independent Annex-G pass with PRED=0 DC scans;
    differential lossless SOF7 (Huffman categories) / SOF15 (QM,
    H.1.2.2 model on the difference plane) with Px=0 —
    modulo-65536 addition (J.1.5), which makes a DCT pyramid plus
    one final correction frame a BIT-EXACT codec (pinned in tests).
    Final assembly upsamples subsampled references (repeat, the
    sequential path's rule) and runs the shared _assemble_color
    conversion — 4-component pyramids follow the APP14 CMYK/YCCK
    rules. Still on the injected seam: subsampled LOSSLESS frames
    (parity with the non-hierarchical lossless path), non-integer-
    ratio factors, and sampling factors that change between frames
    (rejected as malformed).

    Tables (DQT/DHT/DAC/DRI) persist across frames per B.2/B.3; the
    entropy decode reuses the exact sequential scan bodies of the
    non-hierarchical paths (differential flag only), so every
    decode-DoS bound — O(1) declared-unit checks, _MAX_SCAN_UNITS —
    carries over; EXP doubling is additionally bounded because each
    expanded reference must be matched by a differential frame whose
    own entropy budget covers its block count.

    Parity posture: encoder (encode_jpeg_hierarchical) and decoder
    are exact inverses by construction, pinned by round-trip tests —
    the SOF3/SOF9 pattern (no hierarchical sample files or external
    codecs exist in this container)."""
    qtables: dict[int, np.ndarray] = {}
    dc_luts: dict[int, list] = {}
    ac_luts: dict[int, list] = {}
    dc_cond: dict[int, tuple] = {}
    ac_cond: dict[int, int] = {}
    ri = 0
    precision = 8
    dhp = None            # (H, W) full-resolution dims
    pending_exp = None
    # [marker, fh, fw, comps, coef, got_scan, hmax, vmax, cdims]
    frame = None
    refs = None           # per-component int64 reference planes
    samp = None           # [(hi, vi), ...] pinned by the first frame
    adobe_transform = None          # APP14 tag (4-component frames)

    def finalize(fr):
        nonlocal refs
        marker, fh, fw, comps, coef, got_scan, _hmax, _vmax, cdims = fr
        if not got_scan:
            raise ValueError("hierarchical frame without a scan")
        if marker in (0xC7, 0xCF):
            return                    # lossless diffs applied per scan
        maxv = (1 << precision) - 1
        if marker in (0xC3, 0xCB):
            # lossless FIRST frame: coef holds the accumulated scan
            # tuples (per-component lossless scans are per-frame
            # state); decoded planes ARE the reference
            arr = (_decode_lossless_arith if marker == 0xCB
                   else _decode_lossless)(
                fh, fw, len(comps), precision, coef)
            refs = [arr[:, :, i].astype(np.int64)
                    for i in range(arr.shape[2])]
            return
        planes = []
        for ci, (_cid, _hi, _vi, tq) in enumerate(comps):
            if tq not in qtables:
                raise ValueError("SOF references missing DQT")
            ch, cw = cdims[ci]
            planes.append(_idct_spatial(coef[ci],
                                        qtables[tq])[:ch, :cw])
        if marker in (0xC5, 0xC6, 0xCD, 0xCE):  # differential: add, clamp
            refs = [np.clip(r + np.round(p).astype(np.int64), 0, maxv)
                    for r, p in zip(refs, planes)]
        else:                         # first frame: level shift, clamp
            mid = float(1 << (precision - 1))
            refs = [np.clip(np.round(p + mid), 0, maxv).astype(np.int64)
                    for p in planes]

    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker sync lost at byte {pos}")
        while pos + 2 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:            # EOI
            break
        seglen = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen

        if marker == 0xDB:
            _parse_dqt(body, qtables)
        elif marker == 0xC4:
            _parse_dht(body, dc_luts, ac_luts)
        elif marker == 0xCC:
            _parse_dac(body, dc_cond, ac_cond)
        elif marker == 0xDD:
            ri = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xEE:          # APP14: Adobe color-transform
            if body[:5] == b"Adobe" and len(body) >= 12:
                adobe_transform = body[11]
        elif marker == 0xDE:          # DHP
            if dhp is not None:
                raise ValueError("multiple DHP markers")
            precision = body[0]
            dhp = struct.unpack_from(">HH", body, 1)
        elif marker == 0xDF:          # EXP
            if frame is not None:
                finalize(frame)
                frame = None
            if refs is None:
                raise ValueError("EXP before any hierarchical frame")
            if pending_exp is not None:
                raise ValueError("EXP without an intervening frame")
            eh, ev = body[0] >> 4, body[0] & 0x0F
            if (eh, ev) not in ((0, 1), (1, 0), (1, 1)):
                raise ValueError(f"bad EXP nibbles ({eh}, {ev})")
            pending_exp = (eh, ev)
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA, 0xCB,
                        0xC5, 0xC6, 0xCD, 0xCE, 0xC7, 0xCF):
            if dhp is None:
                raise ValueError("hierarchical frame before DHP")
            if frame is not None:
                finalize(frame)
                frame = None
            if body[0] != precision:
                raise ValueError("frame precision differs from DHP")
            fh, fw = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            if ncomp not in (1, 3, 4):
                raise NotImplementedError(
                    f"{ncomp}-component hierarchical JPEG needs an "
                    "injected decoder")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                hi, vi = hv >> 4, hv & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(
                        f"bad sampling factors ({hi}, {vi})")
                comps.append((cid, hi, vi, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            lossless_frame = marker in (0xC3, 0xC7, 0xCB, 0xCF)
            if lossless_frame and (hmax, vmax) != (1, 1):
                # parity with the non-hierarchical lossless path
                raise NotImplementedError(
                    "subsampled lossless JPEG needs an injected "
                    "decoder")
            if samp is not None and [c[1:3] for c in comps] != samp:
                raise ValueError(
                    "sampling factors change between hierarchical "
                    "frames")
            samp = [c[1:3] for c in comps]
            # per-component dims at THIS frame's resolution
            cdims = [(-(-fh * vi // vmax), -(-fw * hi // hmax))
                     for _cid, hi, vi, _tq in comps]
            differential = marker in (0xC5, 0xC6, 0xCD, 0xCE,
                                      0xC7, 0xCF)
            if differential:
                if refs is None:
                    raise ValueError(
                        "differential frame before any "
                        "non-differential frame")
                if pending_exp is not None:
                    eh, ev = pending_exp
                    pending_exp = None
                    refs = [_exp_upsample(r, eh, ev)[:ch, :cw]
                            for r, (ch, cw) in zip(refs, cdims)]
                if [r.shape for r in refs] != cdims:
                    raise ValueError(
                        "differential frame dimensions do not match "
                        "the reference components")
            else:
                if refs is not None:
                    raise ValueError("second non-differential frame "
                                     "in a hierarchical stream")
                if pending_exp is not None:
                    raise ValueError(
                        "EXP before the first (non-differential) "
                        "frame")
            H, W = dhp
            if fh > H or fw > W:
                raise ValueError("frame exceeds the DHP dimensions")
            mcus_x = -(-fw // (8 * hmax))
            mcus_y = -(-fh // (8 * vmax))
            if mcus_x * mcus_y * sum(
                    hi * vi for _c, hi, vi, _t in comps) \
                    > _MAX_SCAN_UNITS:
                # a giant frame is format-LEGAL (dims to 65535²) —
                # it is the pure-python tier that cannot take it,
                # so route to the injected-decoder seam instead of
                # the corrupt-stream dead-letter (r13 self-review);
                # raised BEFORE the coefficient-store allocation
                raise NotImplementedError(
                    "hierarchical frame beyond the pure-python "
                    "decode ceiling needs an injected decoder")
            if marker in (0xC7, 0xCF):
                coef = None           # diffs applied per scan
            elif marker in (0xC3, 0xCB):
                coef = []             # scan tuples, decoded at finalize
            else:
                coef = [np.zeros((mcus_y * vi, mcus_x * hi, 64),
                                 dtype=np.int64)
                        for _c, hi, vi, _t in comps]
            frame = [marker, fh, fw, comps, coef, False,
                     hmax, vmax, cdims]
        elif marker == 0xDA:          # SOS
            if frame is None:
                raise ValueError("SOS without a hierarchical frame")
            m, fh, fw, comps, coef, _got, hmax, vmax, _cd = frame
            ns = body[0]
            arith = m in (0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF)
            comp_ids = [c[0] for c in comps]
            sel = []
            for s in range(ns):
                cid, tt = body[1 + 2 * s:3 + 2 * s]
                sel.append(
                    (comp_ids.index(cid),
                     tt >> 4 if arith else dc_luts.get(tt >> 4),
                     tt & 0x0F if arith else ac_luts.get(tt & 0x0F)))
            ss = body[1 + 2 * ns]
            se = body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            segments, pos = _split_scan(payload, pos)
            mcus_x = -(-fw // (8 * hmax))
            mcus_y = -(-fh // (8 * vmax))
            if m in (0xC7, 0xCF):
                if ss != 0:
                    raise ValueError(
                        "differential lossless scan needs "
                        "predictor select 0 (J.1.5)")
                if ri:
                    raise NotImplementedError(
                        "restart intervals in hierarchical lossless "
                        "scans need an injected decoder")
                diffs = (_decode_lossless_diffs_arith(
                             fh, fw, sel, segments, dict(dc_cond))
                         if m == 0xCF else
                         _decode_lossless_diffs(fh, fw, sel,
                                                segments))
                for (ci, _d, _a), dplane in zip(sel, diffs):
                    refs[ci] = np.mod(refs[ci] + dplane, 65536)
            elif m in (0xC3, 0xCB):
                # lossless FIRST frame: accumulate the scan; decode
                # at finalize (per-component scans share the planes)
                coef.append((sel, ss, se, ahal >> 4, ahal & 0x0F,
                             ri, segments, dict(dc_cond),
                             dict(ac_cond)))
            elif m in (0xC2, 0xC6, 0xCA, 0xCE):
                # PROGRESSIVE frame (r13): each SOS is one
                # independent Annex-G pass over the frame's
                # coefficient store; differential frames (SOF6/14)
                # code DC scans with PRED = 0
                scan = (sel, ss, se, ahal >> 4, ahal & 0x0F, ri,
                        segments, dict(dc_cond), dict(ac_cond))
                decode = (_decode_progressive_arith
                          if m in (0xCA, 0xCE)
                          else _decode_progressive_scans)
                decode([scan], comps, coef, mcus_x, mcus_y, fh, fw,
                       hmax, vmax, differential=m in (0xC6, 0xCE))
            elif arith:
                if 1 < len(sel) < len(comps):
                    raise NotImplementedError(
                        "partially-interleaved sequential JPEG scan "
                        "needs an injected decoder")
                _decode_sequential_arith(
                    sel, comps, coef, mcus_x, mcus_y, fh, fw,
                    hmax, vmax, ri, segments, dict(dc_cond),
                    dict(ac_cond), differential=(m == 0xCD))
            else:
                if 1 < len(sel) < len(comps):
                    raise NotImplementedError(
                        "partially-interleaved sequential JPEG scan "
                        "needs an injected decoder")
                _decode_sequential_huffman(
                    sel, comps, coef, mcus_x, mcus_y, fh, fw,
                    hmax, vmax, ri, segments,
                    differential=(m == 0xC5))
            frame[5] = True
        # else: APPn / COM / DNL — skip

    if frame is not None:
        finalize(frame)
    if refs is None or dhp is None:
        raise ValueError("hierarchical stream without DHP and a frame")
    H, W = dhp
    hmax = max(h for h, _v in samp)
    vmax = max(v for _h, v in samp)
    expect = [(-(-H * vi // vmax), -(-W * hi // hmax))
              for hi, vi in samp]
    if [r.shape for r in refs] != expect:
        raise ValueError(
            "hierarchical stream ended before reaching the DHP "
            "dimensions")
    maxv = (1 << precision) - 1
    dt = np.uint8 if precision == 8 else np.uint16
    planes = []
    for r, (hi, vi) in zip(refs, samp):
        if vmax % vi or hmax % hi:
            raise NotImplementedError(
                f"non-integer-ratio sampling factors ({hi},{vi}) vs "
                f"({hmax},{vmax}) need an injected decoder")
        r = np.clip(r, 0, maxv)
        planes.append(r.repeat(vmax // vi, axis=0)
                       .repeat(hmax // hi, axis=1)[:H, :W])
    return _assemble_color(planes, precision, adobe_transform)


def _downsample2(plane: np.ndarray) -> np.ndarray:
    """2×2 mean with edge padding to even dims — the encoder's
    pyramid filter (the downsample filter is the encoder's choice in
    Annex J; residuals are coded against the encoder's OWN
    reconstruction, so any filter round-trips)."""
    h, w = plane.shape
    he, we = (h + 1) & ~1, (w + 1) & ~1
    p = _pad_to(plane.astype(np.float64), he, we)
    return np.round(
        p.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
    ).astype(np.int64)


def _fdct_plane(plane: np.ndarray, q: np.ndarray,
                mid: float) -> np.ndarray:
    hh, ww = plane.shape
    he, we = -(-hh // 8) * 8, -(-ww // 8) * 8
    return _fdct_quant(_pad_to(plane.astype(np.float64), he, we),
                       q, mid)


def _hier_mcu_blocks(planes_zz, factors, mcus_x: int, mcus_y: int):
    """Interleaved MCU walk over the hierarchical encoder's
    zigzag-block stores: yields (ci, block)."""
    for mcu in range(mcus_x * mcus_y):
        my, mx = divmod(mcu, mcus_x)
        for ci, (hi, vi) in enumerate(factors):
            for v in range(vi):
                for hh in range(hi):
                    yield ci, planes_zz[ci][my * vi + v, mx * hi + hh]


def _encode_hier_scan(out: bytearray, planes_zz, arithmetic: bool,
                      differential: bool, factors=None,
                      mcus: tuple[int, int] | None = None) -> None:
    """One interleaved sequential scan (the hierarchical encoder's
    frame body); ``factors``/``mcus`` give the subsampled MCU walk
    (default all-1×1)."""
    ncomp = len(planes_zz)
    if factors is None:
        factors = [(1, 1)] * ncomp
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    _segment(out, 0xDA, sos)
    if mcus is None:
        mcus = (planes_zz[0].shape[1], planes_zz[0].shape[0])
    mcus_x, mcus_y = mcus
    if arithmetic:
        qm = _QmEncoder()
        stats = _ArithStats(ncomp)
        for ci, blk in _hier_mcu_blocks(planes_zz, factors,
                                        mcus_x, mcus_y):
            _arith_encode_block(qm, stats, blk, ci, 0, 0,
                                (0, 1), 5, differential)
        out.extend(_qm_flush_stuffed(qm))
        return
    # the extended-category (12-bit) tables serve BOTH precisions in
    # hierarchical frames: differential DC/AC magnitudes can exceed
    # the baseline tables' category ceiling (a ±255 difference image
    # reaches DC 2040 / AC above 1023), and the DHT is explicit in
    # the stream either way
    dc_lut = _build_encode_lut(_DC_COUNTS_12, _DC_SYMBOLS_12)
    ac_lut = _build_encode_lut(_AC_COUNTS_12, _AC_SYMBOLS_12)
    bw = _BitWriter()
    preds = [0] * ncomp
    for ci, blk in _hier_mcu_blocks(planes_zz, factors,
                                    mcus_x, mcus_y):
        dc = int(blk[0])
        diff = dc if differential else dc - preds[ci]
        if not differential:
            preds[ci] = dc
        t = _category(diff)
        code, ln = dc_lut[t]
        bw.write(code, ln)
        if t:
            bw.write(diff if diff >= 0
                     else diff + (1 << t) - 1, t)
        run = 0
        last = 63
        while last > 0 and blk[last] == 0:
            last -= 1
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_lut[0xF0]
                bw.write(code, ln)
                run -= 16
            s = _category(v)
            code, ln = ac_lut[(run << 4) | s]
            bw.write(code, ln)
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 63:
            code, ln = ac_lut[0x00]
            bw.write(code, ln)
    bw.pad_to_byte()
    out.extend(bw.buf)


def _encode_hier_prog_scans(out: bytearray, planes_zz,
                            arithmetic: bool,
                            band_split: int = 5,
                            differential: bool = True,
                            factors=None,
                            mcus: tuple[int, int] | None = None,
                            cdims=None) -> None:
    """PROGRESSIVE frame body for hierarchical streams (r13): one
    interleaved DC scan (Ss=Se=0), then per-component AC band scans
    [1, band_split] / [band_split+1, 63], all at Ah=Al=0 — spectral
    selection exercises the progressive decode paths; successive
    approximation is orthogonal and stays pinned by the SOF2/SOF10
    tests. ``differential`` codes the DC with PRED=0 (SOF6/SOF14
    frames); False gives the standard predicted form for a
    non-differential progressive FIRST frame (SOF2/SOF10 inside a
    DHP pyramid). The Huffman form emits per-block EOB0 (the 12-bit
    AC table carries no EOBn run symbols); the arithmetic form uses
    the per-block EOB decision of the band coder."""
    ncomp = len(planes_zz)
    if factors is None:
        factors = [(1, 1)] * ncomp
    if mcus is None:
        mcus = (planes_zz[0].shape[1], planes_zz[0].shape[0])
    mcus_x, mcus_y = mcus
    if cdims is None:
        cdims = [(p.shape[0] * 8, p.shape[1] * 8) for p in planes_zz]
    # AC scans raster the component's CODED block grid (smaller than
    # the MCU-padded store for subsampled components — matches
    # _scan_units on the decode side)
    coded = [(-(-ch // 8), -(-cw // 8)) for ch, cw in cdims]

    def sos(comp_idxs, ss, se):
        body = bytes([len(comp_idxs)])
        for i in comp_idxs:
            body += bytes([i + 1, 0x00])
        body += bytes([ss, se, 0])
        _segment(out, 0xDA, body)

    sos(list(range(ncomp)), 0, 0)          # DC scan
    if arithmetic:
        qm, stats = _QmEncoder(), _ArithStats(ncomp)
        for ci, blk in _hier_mcu_blocks(planes_zz, factors,
                                        mcus_x, mcus_y):
            if differential:               # PRED = 0 per block
                stats.last_dc[ci] = 0
            _arith_encode_dc(qm, stats, ci, 0, (0, 1), int(blk[0]))
        out.extend(_qm_flush_stuffed(qm))
    else:
        dc_lut = _build_encode_lut(_DC_COUNTS_12, _DC_SYMBOLS_12)
        bw = _BitWriter()
        preds = [0] * ncomp
        for ci, blk in _hier_mcu_blocks(planes_zz, factors,
                                        mcus_x, mcus_y):
            dc = int(blk[0])
            diff = dc if differential else dc - preds[ci]
            if not differential:
                preds[ci] = dc
            t = _category(diff)
            code, ln = dc_lut[t]
            bw.write(code, ln)
            if t:
                bw.write(diff if diff >= 0
                         else diff + (1 << t) - 1, t)
        bw.pad_to_byte()
        out.extend(bw.buf)

    ac_lut = (None if arithmetic
              else _build_encode_lut(_AC_COUNTS_12, _AC_SYMBOLS_12))
    for ci in range(ncomp):
        cby, cbx = coded[ci]
        for ss, se in ((1, band_split), (band_split + 1, 63)):
            sos([ci], ss, se)
            if arithmetic:
                qm, stats = _QmEncoder(), _ArithStats(ncomp)
                for y in range(cby):
                    for x in range(cbx):
                        _arith_encode_ac_band(
                            qm, stats, planes_zz[ci][y, x], 0, 5,
                            ss, se, 0)
                out.extend(_qm_flush_stuffed(qm))
                continue
            bw = _BitWriter()
            for y in range(cby):
                for x in range(cbx):
                    blk = planes_zz[ci][y, x]
                    r = 0
                    for k in range(ss, se + 1):
                        v = int(blk[k])
                        if v == 0:
                            r += 1
                            continue
                        while r > 15:
                            code, ln = ac_lut[0xF0]
                            bw.write(code, ln)
                            r -= 16
                        s = _category(v)
                        code, ln = ac_lut[(r << 4) | s]
                        bw.write(code, ln)
                        bw.write(v if v >= 0
                                 else v + (1 << s) - 1, s)
                        r = 0
                    if r > 0:            # per-block EOB0
                        code, ln = ac_lut[0x00]
                        bw.write(code, ln)
            bw.pad_to_byte()
            out.extend(bw.buf)


def encode_jpeg_hierarchical(img: np.ndarray, levels: int = 2,
                             quant: np.ndarray = QUANT_ONES,
                             arithmetic: bool = False,
                             lossless_final: bool = False,
                             precision: int = 8,
                             progressive: bool = False,
                             first_frame: str = "sequential",
                             subsample: bool = False,
                             adobe_transform: int | None = None
                             ) -> bytes:
    """Encode as HIERARCHICAL JPEG (T.81 Annex J) — the fixture write
    half proving _decode_hierarchical (the SOF3/SOF9/MJPEG-B
    pattern: no hierarchical sample files exist in this container, so
    the engine carries the writer its own reader is pinned against).

    Pyramid: ``levels`` resolutions via 2×2-mean downsampling; the
    smallest encodes as a non-differential extended-sequential frame
    (SOF1, or SOF9 with ``arithmetic``), each larger level as
    EXP(1,1) + a differential frame (SOF5 / SOF13) coding
    source − upsampled-reconstruction with PRED=0 DC and no level
    shift. ``lossless_final`` appends one differential LOSSLESS
    frame (SOF7, Px=0, modulo-65536) coding the residual at full
    resolution — making the whole codec BIT-EXACT for grayscale
    input (3-channel input passes through the lossy YCbCr transform
    first, so only the pyramid below it is exact). 1 or 3 channels;
    ``precision`` 8 or 12; all components 1×1.

    r13 additions: ``progressive`` codes each differential level as
    a differential-PROGRESSIVE frame (SOF6, or SOF14 with
    ``arithmetic``) — PRED=0 DC scan plus spectral-selection AC band
    scans per component (_encode_hier_prog_scans); with
    ``arithmetic``, ``lossless_final`` emits the SOF15 form — the
    residual QM-coded under the H.1.2.2 conditioning model on the
    difference plane; and ``first_frame`` selects the
    NON-differential pyramid base: "sequential" (SOF1/SOF9),
    "progressive" (SOF2/SOF10 — predicted DC), or "lossless"
    (SOF3/SOF11 — the base level stored EXACTLY, so a lossless base
    plus DCT differentials plus a lossless final is exact end to
    end). Decoded output is identical across scan scripts of the
    same coefficients, which the round-trip tests pin.

    r13 (same session): ``subsample`` codes 3-channel input 4:2:0 —
    chroma at half resolution at EVERY pyramid level (per-component
    pyramids; each EXP doubles every component, preserving the
    ratio); lossless frames stay 1×1 by spec parity, so
    ``lossless_final``/``first_frame="lossless"`` reject it.
    4-channel input stores raw planes (the CMYK shape) with an
    Adobe APP14 tag when ``adobe_transform`` is given — decode
    output follows the sequential 4-component conversion rules."""
    if precision not in (8, 12):
        raise ValueError("hierarchical precision must be 8 or 12")
    if levels < 1:
        raise ValueError("levels must be >= 1")
    img = np.asarray(img).astype(np.int64)
    if img.ndim == 2:
        img = img[:, :, np.newaxis]
    h, w, ncomp = img.shape
    if ncomp not in (1, 3, 4):
        raise ValueError(
            "encode_jpeg_hierarchical takes gray, RGB, or "
            "4-component input")
    if subsample and ncomp != 3:
        raise ValueError("subsample needs 3-channel input")
    if subsample and (lossless_final or first_frame == "lossless"):
        raise ValueError(
            "lossless hierarchical frames are 1x1-sampled (spec "
            "parity) — subsample excludes lossless_final and "
            "first_frame='lossless'")
    factors = ([(2, 2), (1, 1), (1, 1)] if subsample
               else [(1, 1)] * ncomp)
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mid = float(1 << (precision - 1))
    maxv = (1 << precision) - 1
    if img.size and (int(img.min()) < 0 or int(img.max()) > maxv):
        raise ValueError(
            f"sample values out of [0, {maxv}] for {precision}-bit "
            "precision")
    if ncomp == 3:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  -0.168736 * r - 0.331264 * g + 0.5 * b + mid,
                  0.5 * r - 0.418688 * g - 0.081312 * b + mid]
        planes = [np.clip(np.round(p), 0, maxv).astype(np.int64)
                  for p in planes]
        if subsample:
            planes = [planes[0], _downsample2(planes[1]),
                      _downsample2(planes[2])]
    else:
        planes = [img[:, :, i] for i in range(ncomp)]

    pyr = [planes]
    for _ in range(levels - 1):
        pyr.append([_downsample2(p) for p in pyr[-1]])
    pyr.reverse()
    fdims = [(h, w)]
    for _ in range(levels - 1):
        ph, pw = fdims[-1]
        fdims.append((-(-ph // 2), -(-pw // 2)))
    fdims.reverse()

    qflat = quant.reshape(64)
    if int(qflat.max()) > 255 or int(qflat.min()) < 1:
        raise ValueError(
            "hierarchical quant table entries must be in [1, 255]")

    out = bytearray(b"\xff\xd8")
    if ncomp == 4 and adobe_transform is not None:
        _segment(out, 0xEE, b"Adobe" + bytes(
            [0, 100, 0, 0, 0, 0, adobe_transform]))
    dhp = struct.pack(">BHHB", precision, h, w, ncomp)
    for i in range(ncomp):
        dhp += bytes([i + 1, (factors[i][0] << 4) | factors[i][1], 0])
    _segment(out, 0xDE, dhp)
    qz = qflat[ZIGZAG].astype(np.uint8)
    _segment(out, 0xDB, bytes([0x00]) + qz.tobytes())
    if arithmetic:
        _segment(out, 0xCC, bytes([0x00, 0x10, 0x10, 0x05]))
    else:
        _segment(out, 0xC4, bytes([0x00]) + bytes(_DC_COUNTS_12)
                 + _DC_SYMBOLS_12)
        _segment(out, 0xC4, bytes([0x10]) + bytes(_AC_COUNTS_12)
                 + _AC_SYMBOLS_12)

    recon = None
    for li, lvl in enumerate(pyr):
        lh, lw = fdims[li]
        mcx, mcy = -(-lw // (8 * hmax)), -(-lh // (8 * vmax))
        cdims = [(-(-lh * vi // vmax), -(-lw * hi // hmax))
                 for hi, vi in factors]

        def zz_of(srcs, m):
            """Per-component zigzag blocks on the MCU-padded grid."""
            return [_fdct_quant(
                _pad_to(p.astype(np.float64),
                        mcy * vi * 8, mcx * hi * 8), quant, m)
                for p, (hi, vi) in zip(srcs, factors)]

        sof = struct.pack(">BHHB", precision, lh, lw, ncomp)
        for i in range(ncomp):
            sof += bytes([i + 1,
                          (factors[i][0] << 4) | factors[i][1], 0])
        if li == 0:
            if first_frame == "lossless":
                _segment(out, 0xCB if arithmetic else 0xC3, sof)
                sos_b = bytes([ncomp])
                for i in range(ncomp):
                    sos_b += bytes([i + 1, 0x00])
                sos_b += bytes([4, 0, 0])     # predictor 4, Pt 0
                _segment(out, 0xDA, sos_b)
                default = 1 << (precision - 1)
                if arithmetic:
                    qm = _QmEncoder()
                    lstats = [bytearray(_LL_STATS_BINS)
                              for _ in range(ncomp)]
                else:
                    dc_lut = _build_encode_lut(_DC_COUNTS_12,
                                               _DC_SYMBOLS_12)
                    bw = _BitWriter()
                for y in range(lh):
                    for x in range(lw):
                        for ci in range(ncomp):
                            p = lvl[ci]
                            px = (default if (y, x) == (0, 0) else
                                  _ll_predict(p, y, x, 4, default))
                            diff = (int(p[y, x]) - px) & 0xFFFF
                            if diff >= 32768:
                                diff -= 65536
                            if arithmetic:
                                base, xb = _ll_ctx(p, y, x, 0, 1)
                                _ll_arith_encode_diff(
                                    qm, lstats[ci], base, xb, diff)
                            else:
                                t = _category(diff)
                                code, ln = dc_lut[t]
                                bw.write(code, ln)
                                if t:
                                    bw.write(
                                        diff if diff >= 0
                                        else diff + (1 << t) - 1, t)
                if arithmetic:
                    out.extend(_qm_flush_stuffed(qm))
                else:
                    bw.pad_to_byte()
                    out.extend(bw.buf)
                recon = [p.copy() for p in lvl]   # exact base
                continue
            zzs = zz_of(lvl, mid)
            if first_frame == "progressive":
                _segment(out, 0xCA if arithmetic else 0xC2, sof)
                _encode_hier_prog_scans(out, zzs, arithmetic,
                                        differential=False,
                                        factors=factors,
                                        mcus=(mcx, mcy), cdims=cdims)
            else:
                _segment(out, 0xC9 if arithmetic else 0xC1, sof)
                _encode_hier_scan(out, zzs, arithmetic, False,
                                  factors=factors, mcus=(mcx, mcy))
            recon = [np.clip(np.round(
                _idct_spatial(z, quant) + mid), 0, maxv
                ).astype(np.int64)[:ch, :cw]
                for z, (ch, cw) in zip(zzs, cdims)]
        else:
            _segment(out, 0xDF, bytes([0x11]))   # EXP Eh=1, Ev=1
            recon = [_exp_upsample(p, 1, 1)[:ch, :cw]
                     for p, (ch, cw) in zip(recon, cdims)]
            zzs = zz_of([src - ref for src, ref in zip(lvl, recon)],
                        0.0)
            if progressive:
                _segment(out, 0xCE if arithmetic else 0xC6, sof)
                _encode_hier_prog_scans(out, zzs, arithmetic,
                                        factors=factors,
                                        mcus=(mcx, mcy), cdims=cdims)
            else:
                _segment(out, 0xCD if arithmetic else 0xC5, sof)
                _encode_hier_scan(out, zzs, arithmetic, True,
                                  factors=factors, mcus=(mcx, mcy))
            recon = [np.clip(
                p + np.round(_idct_spatial(z, quant))
                .astype(np.int64)[:ch, :cw], 0, maxv)
                for p, z, (ch, cw) in zip(recon, zzs, cdims)]

    if lossless_final:
        if not arithmetic:
            _segment(out, 0xC4, bytes([0x00]) + bytes(_DC_COUNTS_LL)
                     + _DC_SYMBOLS_LL)
        sof = struct.pack(">BHHB", precision, h, w, ncomp)
        for i in range(ncomp):
            sof += bytes([i + 1, 0x11, 0])
        _segment(out, 0xCF if arithmetic else 0xC7, sof)
        sos = bytes([ncomp])
        for i in range(ncomp):
            sos += bytes([i + 1, 0x00])
        sos += bytes([0, 0, 0])      # Px=0: no predictor (J.1.5)
        _segment(out, 0xDA, sos)
        if arithmetic:
            # SOF15: QM-coded raw differences, conditioning contexts
            # on the stored (mod-65536) difference planes
            qm = _QmEncoder()
            stats = [bytearray(_LL_STATS_BINS) for _ in range(ncomp)]
            stored = [np.mod(p - r, 65536)
                      for p, r in zip(planes, recon)]
            for y in range(h):
                for x in range(w):
                    for ci in range(ncomp):
                        diff = int(stored[ci][y, x])
                        if diff >= 32768:
                            diff -= 65536
                        base, xbase = _ll_ctx(stored[ci], y, x, 0, 1)
                        _ll_arith_encode_diff(qm, stats[ci], base,
                                              xbase, diff)
            out.extend(_qm_flush_stuffed(qm))
        else:
            lut = _build_encode_lut(_DC_COUNTS_LL, _DC_SYMBOLS_LL)
            bw = _BitWriter()
            for y in range(h):
                for x in range(w):
                    for ci in range(ncomp):
                        diff = (int(planes[ci][y, x])
                                - int(recon[ci][y, x])) & 0xFFFF
                        if diff >= 32768:
                            diff -= 65536
                        if diff == -32768:  # category 16: no extra bits
                            code, ln = lut[16]
                            bw.write(code, ln)
                        else:
                            t = _category(diff)
                            code, ln = lut[t]
                            bw.write(code, ln)
                            if t:
                                bw.write(diff if diff >= 0
                                         else diff + (1 << t) - 1, t)
            bw.pad_to_byte()
            out.extend(bw.buf)
    out.extend(b"\xff\xd9")
    return bytes(out)
