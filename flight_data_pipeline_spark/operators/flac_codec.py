"""FLAC decode (and a test-grade encoder) in pure stdlib + numpy.

Scraped audio corpora are FLAC/MP3-heavy; FLAC is the lossless,
codec-feasible half (Rice-coded residuals over fixed/LPC predictors —
all integer arithmetic), so decoding it in-container closes the audio
tier's biggest seam the same way the PNG/GIF/JPEG work closed the
image tier's. MP3/AAC remain genuinely codec-bound (perceptual
transforms + licensing-grade bit allocation) and stay on the
injection seam.

Format reference: RFC 9639 / xiph.org FLAC format spec. Everything
here is implemented from the public spec; the encoder exists so tests
can build real payloads (the encode_jpeg / encode_gif pattern) and
deliberately supports only what the decoder-proving fixtures need
(constant / verbatim / fixed / explicit-LPC subframes, Rice
partitions with escape codes, left-side / right-side / mid-side
stereo decorrelation).

Decoded output contract matches multimodal.decode_wav: float32 mono
samples in [-1, 1], multi-channel mean-downmixed (decode_flac);
decode_flac_pcm exposes the exact integer samples for parity tests.

Reference parity: the reference repo (etl_job.py) has no media tier;
this extends SURVEY §2's multimodal family.
"""
from __future__ import annotations

import struct

import numpy as np

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_TABLE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}

_SAMPLE_RATE_TABLE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

_BPS_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8(data) -> int:
    """CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0 — the FLAC
    frame-header checksum."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07 if crc & 0x80 else crc << 1) & 0xFF
    return crc


def _crc16(data) -> int:
    """CRC-16, polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0 —
    the FLAC whole-frame checksum."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005 if crc & 0x8000
                   else crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader over a bytes-like (FLAC bit order)."""

    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes, start_byte: int = 0):
        self.data = data
        self.pos = start_byte * 8
        self.n = len(data) * 8

    def read(self, k: int) -> int:
        if k == 0:
            return 0
        end = self.pos + k
        if end > self.n:
            raise ValueError("truncated FLAC bitstream")
        first = self.pos >> 3
        last = (end + 7) >> 3
        chunk = int.from_bytes(self.data[first:last], "big")
        v = (chunk >> ((last << 3) - end)) & ((1 << k) - 1)
        self.pos = end
        return v

    def sread(self, k: int) -> int:
        if k == 0:
            return 0
        v = self.read(k)
        return v - (1 << k) if v >> (k - 1) else v

    def unary(self) -> int:
        count = 0
        while True:
            byte_i = self.pos >> 3
            if byte_i >= len(self.data):
                raise ValueError("truncated FLAC bitstream (unary)")
            rem = 8 - (self.pos & 7)
            window = self.data[byte_i] & ((1 << rem) - 1)
            if window == 0:
                count += rem
                self.pos += rem
                continue
            zeros = rem - window.bit_length()
            self.pos += zeros + 1
            return count + zeros

    def byte_pos(self) -> int:
        if self.pos & 7:
            raise ValueError("FLAC frame not byte-aligned")
        return self.pos >> 3

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_utf8_number(br: _Bits) -> int:
    """FLAC's extended-UTF-8 coded frame/sample number (≤ 7 bytes)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 2 or n > 7:
        raise ValueError("bad UTF-8-coded frame number")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = br.read(8)
        if c >> 6 != 0b10:
            raise ValueError("bad UTF-8-coded continuation byte")
        v = (v << 6) | (c & 0x3F)
    return v


def _residual(br: _Bits, n: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if n % nparts:
        raise ValueError("bad rice partition order")
    out: list[int] = []
    for p in range(nparts):
        cnt = n // nparts - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("rice partition smaller than predictor order")
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            out.extend(br.sread(raw) for _ in range(cnt))
        elif param == 0:
            for _ in range(cnt):
                q = br.unary()
                out.append((q >> 1) ^ -(q & 1))
        else:
            for _ in range(cnt):
                v = (br.unary() << param) | br.read(param)
                out.append((v >> 1) ^ -(v & 1))
    return out


def _subframe(br: _Bits, n: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("subframe header padding bit set")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
    eb = bps - wasted
    if eb <= 0:
        raise ValueError("wasted bits exceed sample size")
    if t == 0:
        out = [br.sread(eb)] * n
    elif t == 1:
        out = [br.sread(eb) for _ in range(n)]
    elif 8 <= t <= 12:
        order = t - 8
        out = [br.sread(eb) for _ in range(order)]
        res = _residual(br, n, order)
        coefs = _FIXED_COEFS[order]
        for i in range(n - order):
            acc = res[i]
            for j, c in enumerate(coefs):
                acc += c * out[order + i - 1 - j]
            out.append(acc)
    elif t >= 32:
        order = t - 31
        out = [br.sread(eb) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision code")
        shift = br.sread(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [br.sread(prec) for _ in range(order)]
        res = _residual(br, n, order)
        for i in range(n - order):
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * out[order + i - 1 - j]
            out.append((acc >> shift) + res[i])
    else:
        raise ValueError(f"reserved subframe type {t}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def _parse_streaminfo(body: bytes):
    if len(body) != 34:
        raise ValueError("bad STREAMINFO length")
    br = _Bits(body)
    br.read(16)  # min blocksize
    br.read(16)  # max blocksize
    br.read(24)  # min framesize
    br.read(24)  # max framesize
    rate = br.read(20)
    channels = br.read(3) + 1
    bps = br.read(5) + 1
    total = br.read(36)
    return rate, channels, bps, total


def decode_flac_pcm(payload: bytes):
    """Decode a FLAC stream → (samples int32 ndarray of shape
    (n, channels), sample_rate, bits_per_sample). Exact integer
    samples — the parity surface the round-trip tests pin. Malformed
    payloads raise ValueError (the dead-letter contract), including
    CRC-8/CRC-16 mismatches and truncation anywhere."""
    try:
        return _decode_flac_pcm(payload)
    except (IndexError, KeyError, struct.error, OverflowError) as exc:
        raise ValueError(
            f"malformed FLAC payload: {type(exc).__name__}: {exc}"
        ) from exc


def _decode_flac_pcm(payload: bytes):
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (missing fLaC marker)")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC metadata")
        last = payload[pos] & 0x80
        btype = payload[pos] & 0x7F
        length = int.from_bytes(payload[pos + 1:pos + 4], "big")
        if pos + 4 + length > len(payload):
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:
            info = _parse_streaminfo(payload[pos + 4:pos + 4 + length])
        elif btype == 127:
            raise ValueError("invalid FLAC metadata block type 127")
        pos += 4 + length
        if last:
            break
    if info is None:
        raise ValueError("FLAC stream missing STREAMINFO")
    rate, channels, bps, total = info

    chans: list[list[int]] = [[] for _ in range(channels)]
    # Decode-time DoS bound (r11 advice): a ~20-byte constant-subframe
    # frame legally encodes 65536 samples x 8 channels and the CRCs are
    # attacker-computable, so accumulated samples must be bounded
    # BEFORE each frame decodes, not after the loop. STREAMINFO's
    # 36-bit total is itself attacker-controlled (r12 advice: a
    # declared total of 2^36-1 reopened the bomb), so a nonzero total
    # only ever TIGHTENS the payload-derived bound, never replaces it:
    # a legal frame costs >= ~12 header+CRC bytes for <= 65536
    # samples, so (len/12 + 1) * 65536 never rejects a legal stream.
    # Unknown-total streams additionally hit a fixed 2^24 per-channel
    # ceiling: the payload-derived term tracks the format's legal
    # silence-compression maximum (~5461 samples/byte/channel), which
    # for a ~100 KB crafted payload is still billions of list ints —
    # and every real container (and the in-repo encoder) writes total.
    payload_cap = (len(payload) // 12 + 1) * 65536
    sample_cap = (min(total, payload_cap) if total
                  else min(payload_cap, 1 << 24))
    while pos < len(payload):
        br = _Bits(payload, pos)
        if br.read(14) != 0x3FFE:
            raise ValueError("bad FLAC frame sync")
        if br.read(1):
            raise ValueError("reserved frame-header bit set")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("reserved frame-header bit set")
        _read_utf8_number(br)
        if bs_code == 0:
            raise ValueError("reserved blocksize code")
        elif bs_code == 6:
            n = br.read(8) + 1
        elif bs_code == 7:
            n = br.read(16) + 1
        else:
            n = _BLOCKSIZE_TABLE[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise ValueError("invalid sample-rate code")
        if ss_code == 0:
            fbps = bps
        elif ss_code == 3:
            raise ValueError("reserved sample-size code")
        else:
            fbps = _BPS_TABLE[ss_code]
        hdr_end = br.byte_pos()
        if _crc8(payload[pos:hdr_end]) != br.read(8):
            raise ValueError("FLAC frame-header CRC-8 mismatch")
        if len(chans[0]) + n > sample_cap:
            raise ValueError(
                f"FLAC frames overrun the sample bound {sample_cap} "
                "(STREAMINFO total or payload-derived cap)")

        if ch_code < 8:
            nch = ch_code + 1
            if nch != channels:
                raise ValueError("frame/STREAMINFO channel mismatch")
            subs = [_subframe(br, n, fbps) for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            if channels != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            extra0 = 1 if ch_code == 9 else 0
            extra1 = 1 if ch_code in (8, 10) else 0
            c0 = _subframe(br, n, fbps + extra0)
            c1 = _subframe(br, n, fbps + extra1)
            if ch_code == 8:      # left/side
                subs = [c0, [a - b for a, b in zip(c0, c1)]]
            elif ch_code == 9:    # side/right
                subs = [[a + b for a, b in zip(c0, c1)], c1]
            else:                 # mid/side
                left, right = [], []
                for m, s in zip(c0, c1):
                    m = (m << 1) | (s & 1)
                    left.append((m + s) >> 1)
                    right.append((m - s) >> 1)
                subs = [left, right]
        else:
            raise ValueError("reserved channel assignment")

        br.align()
        crc_at = br.byte_pos()
        if _crc16(payload[pos:crc_at]) != br.read(16):
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = br.byte_pos()
        for c, vals in zip(chans, subs):
            c.extend(vals)

    out = np.array(chans, dtype=np.int64).T.astype(np.int32)
    if total and out.shape[0] < total:
        raise ValueError("FLAC stream shorter than STREAMINFO total")
    if total:
        out = out[:total]
    return out, rate, bps


def decode_flac(payload: bytes):
    """decode_wav-contract FLAC decode: float32 MONO samples in
    [-1, 1] (mean-downmix), normalizing by 2^(bps-1)."""
    pcm, _rate, bps = decode_flac_pcm(payload)
    arr = pcm.astype(np.float32) / float(1 << (bps - 1))
    return arr.mean(axis=1) if arr.shape[1] > 1 else arr[:, 0]


# --------------------------------------------------------------------------
# encoder (test-grade: the write half that proves the decoder)
# --------------------------------------------------------------------------

class _BitW:
    __slots__ = ("buf", "acc", "n")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def w(self, val: int, k: int) -> None:
        if k == 0:
            return
        self.acc = (self.acc << k) | (val & ((1 << k) - 1))
        self.n += k
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.w(0, 8 - self.n)


def _utf8_number(num: int) -> bytes:
    if num < 0x80:
        return bytes([num])
    out = []
    nbytes = 2
    while num >= (1 << (5 * nbytes + 1)) and nbytes < 7:
        nbytes += 1
    for i in range(nbytes - 1):
        out.append(0x80 | (num & 0x3F))
        num >>= 6
    lead_prefix = (0xFF << (8 - nbytes)) & 0xFF
    out.append(lead_prefix | num)
    return bytes(reversed(out))


def _rice_encode(bw: _BitW, values, param: int) -> None:
    for v in values:
        u = (v << 1) if v >= 0 else ((-v << 1) - 1)
        q = u >> param
        bw.w(0, q) if q else None
        bw.w(1, 1)
        bw.w(u & ((1 << param) - 1), param)


def _pick_rice_param(values) -> int:
    if not values:
        return 0
    mean = sum(abs(v) for v in values) / len(values)
    p = max(0, int(mean).bit_length() - 1) + 1 if mean >= 1 else 0
    return min(p, 14)


def _encode_residual(bw: _BitW, res: list[int], order: int,
                     partition_order: int, escape_bits: int | None) -> None:
    n = len(res) + order
    # short (last) frames: degrade the partition order until the
    # partitions divide the block and the first holds the warmup
    while partition_order and (n % (1 << partition_order)
                               or n // (1 << partition_order) < order):
        partition_order -= 1
    bw.w(0, 2)                 # method 0: 4-bit rice params
    bw.w(partition_order, 4)
    nparts = 1 << partition_order
    start = 0
    for p in range(nparts):
        cnt = n // nparts - (order if p == 0 else 0)
        part = res[start:start + cnt]
        start += cnt
        if escape_bits is not None:
            bw.w(0xF, 4)
            bw.w(escape_bits, 5)
            for v in part:
                bw.w(v, escape_bits)
        else:
            param = _pick_rice_param(part)
            if param >= 0xF:
                param = 14
            bw.w(param, 4)
            _rice_encode(bw, part, param)


def _encode_subframe(bw: _BitW, samples: list[int], bps: int,
                     mode, partition_order: int,
                     escape_bits: int | None) -> None:
    n = len(samples)
    if mode == "constant":
        bw.w(0, 1 + 6 + 1)
        bw.w(samples[0], bps)
        return
    if mode == "verbatim":
        bw.w(0, 1)
        bw.w(1, 6)
        bw.w(0, 1)
        for v in samples:
            bw.w(v, bps)
        return
    if isinstance(mode, tuple) and mode[0] == "lpc":
        _, coefs, shift, prec = mode
        order = len(coefs)
        bw.w(0, 1)
        bw.w(32 + order - 1, 6)
        bw.w(0, 1)
        for v in samples[:order]:
            bw.w(v, bps)
        bw.w(prec - 1, 4)
        bw.w(shift, 5)
        for c in coefs:
            bw.w(c, prec)
        res = []
        for i in range(order, n):
            acc = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            res.append(samples[i] - (acc >> shift))
        _encode_residual(bw, res, order, partition_order, escape_bits)
        return
    if mode.startswith("fixed"):
        # a block shorter than the predictor order can't carry the
        # warmup — clamp per block (the 1-sample-last-frame case the
        # hypothesis sweep caught in r11)
        order = min(int(mode[5:]), n)
        bw.w(0, 1)
        bw.w(8 + order, 6)
        bw.w(0, 1)
        for v in samples[:order]:
            bw.w(v, bps)
        coefs = _FIXED_COEFS[order]
        res = []
        for i in range(order, n):
            acc = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            res.append(samples[i] - acc)
        _encode_residual(bw, res, order, partition_order, escape_bits)
        return
    raise ValueError(f"unknown subframe mode {mode!r}")


_SS_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}


def encode_flac(samples, sample_rate: int = 8000, bps: int = 16,
                block_size: int = 256, mode="fixed2",
                stereo: str = "independent", partition_order: int = 0,
                escape_bits: int | None = None) -> bytes:
    """Encode int samples (n,) or (n, channels) as a FLAC stream.

    Test-grade by design: fixed block size, one subframe ``mode`` for
    every channel ('constant'/'verbatim'/'fixed0'..'fixed4'/
    ``('lpc', coefs, shift, precision)``), optional stereo
    decorrelation ('left_side'/'right_side'/'mid_side'), Rice
    partitions at ``partition_order`` with optional escape-coded
    partitions (``escape_bits``). Every branch exists to pin a
    decoder path."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_total, channels = arr.shape
    if stereo != "independent" and channels != 2:
        raise ValueError("stereo decorrelation needs 2 channels")
    if not 1 <= block_size <= 65536:
        raise ValueError("block_size must be in [1, 65536] "
                         "(16-bit explicit blocksize field)")

    out = bytearray(b"fLaC")
    si = _BitW()
    si.w(block_size, 16)
    si.w(block_size, 16)
    si.w(0, 24)
    si.w(0, 24)
    si.w(sample_rate, 20)
    si.w(channels - 1, 3)
    si.w(bps - 1, 5)
    si.w(n_total, 36)
    body = bytes(si.buf) + b"\x00" * 16
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    for fi, start in enumerate(range(0, n_total, block_size)):
        blk = arr[start:start + block_size]
        n = blk.shape[0]
        bw = _BitW()
        bw.w(0x3FFE, 14)
        bw.w(0, 1)
        bw.w(0, 1)          # fixed-blocksize stream
        bw.w(7, 4)          # explicit 16-bit blocksize-1
        bw.w(0, 4)          # sample rate from STREAMINFO
        if stereo == "independent":
            bw.w(channels - 1, 4)
        else:
            bw.w({"left_side": 8, "right_side": 9,
                  "mid_side": 10}[stereo], 4)
        bw.w(_SS_CODE[bps], 3)
        bw.w(0, 1)
        for b in _utf8_number(fi):
            bw.w(b, 8)
        bw.w(n - 1, 16)
        bw.align()
        hdr = bytes(bw.buf)
        bw.w(_crc8(hdr), 8)

        if stereo == "independent":
            subs = [(list(blk[:, c]), bps) for c in range(channels)]
        else:
            left, right = list(blk[:, 0]), list(blk[:, 1])
            side = [a - b for a, b in zip(left, right)]
            if stereo == "left_side":
                subs = [(left, bps), (side, bps + 1)]
            elif stereo == "right_side":
                subs = [(side, bps + 1), (right, bps)]
            else:
                mid = [(a + b) >> 1 for a, b in zip(left, right)]
                subs = [(mid, bps), (side, bps + 1)]
        for vals, sbps in subs:
            smode = mode
            if mode == "constant" and len(set(vals)) != 1:
                raise ValueError("constant mode needs constant samples")
            _encode_subframe(bw, [int(v) for v in vals], sbps, smode,
                             partition_order, escape_bits)
        bw.align()
        frame = bytes(bw.buf)
        bw.w(_crc16(frame), 16)
        out += bytes(bw.buf)
    return bytes(out)
