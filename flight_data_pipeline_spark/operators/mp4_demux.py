"""MP4 / ISO-BMFF container demux in pure stdlib (extension scope:
multimodal frame sampling — makes the video third of the media tier
real at the CONTAINER level; codec-level pixel decode of the
extracted access units still needs ffmpeg/torchcodec and stays on
the injected-decoder seam).

What a 100 TB video-corpus pipeline actually does before any decode
is DEMUX: locate each coded frame (sample) inside the container,
recover its timestamp and keyframe flag, and pick the frames worth
decoding (usually sync samples at some stride). All of that is box
arithmetic — no codec involved — and is what this module implements:

- box-tree walk (``ftyp``/``moov``/``trak``/``mdia``/``minf``/
  ``stbl``), 32-bit and 64-bit (largesize) boxes,
- sample table reconstruction: ``stsz`` (sizes), ``stsc``
  (sample→chunk runs), ``stco``/``co64`` (chunk offsets), ``stts``
  (decode-time deltas), ``ctts`` (composition offsets → pts, both
  the v0 unsigned and v1 signed forms), ``stss`` (sync samples;
  absent ⇒ every sample is sync), ``mdhd`` (timescale), ``hdlr``
  (track kind),
- fragmented MP4 (the dominant shape for streaming-originated video:
  DASH/HLS recordings): ``mvex``/``trex`` track defaults, then per
  fragment ``moof`` → ``traf`` → ``tfhd`` (per-fragment defaults,
  base-data-offset / default-base-is-moof), ``tfdt`` (base decode
  time), ``trun`` (per-sample size/duration/flags runs) — pure
  sample arithmetic, same as the stbl path,
- per-sample output: byte range into the payload, timestamp in ms,
  keyframe flag, codec fourcc from ``stsd``.

``extract_sample_bytes`` feeds operators/multimodal.sample_frames as
a real ``extractor``: the emitted "frames" are the track's actual
coded access units, byte-exact, in decode order.

Encrypted tracks and codec-level pixel decode stay on the injected
path.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


class Mp4Sample(NamedTuple):
    index: int        # 0-based decode order
    offset: int       # byte offset of the coded frame in the payload
    size: int         # coded frame size in bytes
    dts_ms: int       # decode timestamp, integer milliseconds
    pts_ms: int       # presentation timestamp (dts + ctts/trun
    #                   composition offset; == dts when absent) —
    #                   B-frame reordered streams present in pts order
    keyframe: bool    # listed in stss (or no stss box at all)
    codec: str        # stsd entry fourcc, e.g. 'avc1'


def _iter_boxes4(data: bytes, start: int, end: int):
    """Yield (type, box_start, body_start, box_end) for the boxes in
    [start, end); handles 64-bit largesize and size-0 (to-end).
    box_start includes the header — the fMP4 default-base-is-moof
    rule measures data offsets from there."""
    i = start
    while i + 8 <= end:
        size, btype = struct.unpack_from(">I4s", data, i)
        hdr = 8
        if size == 1:
            size = struct.unpack_from(">Q", data, i + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - i
        if size < hdr or i + size > end:
            raise ValueError("malformed MP4 box size")
        yield btype, i, i + hdr, i + size
        i += size


def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, box_end) — see :func:`_iter_boxes4`."""
    for btype, _s, body, box_end in _iter_boxes4(data, start, end):
        yield btype, body, box_end


def _find(data: bytes, start: int, end: int, btype: bytes):
    for t, b, e in _iter_boxes(data, start, end):
        if t == btype:
            return b, e
    return None


def _full_box(data: bytes, body: int) -> tuple[int, int]:
    """(version, body-after-version/flags offset)."""
    return data[body], body + 4


def demux_mp4(payload: bytes) -> list[Mp4Sample]:
    """Demux the first video track (fallback: first track with a
    sample table) of an MP4 → decode-ordered ``Mp4Sample`` list.
    Un-fragmented payloads walk the stbl tables; fragmented payloads
    (``moof`` present) walk mvex/trex + moof/traf/tfhd/tfdt/trun.
    Pure box arithmetic; the coded bytes are NOT decoded. Truncated /
    corrupt containers raise ValueError (the dead-letter contract),
    never a bare struct.error/IndexError from the box arithmetic."""
    try:
        return _demux_mp4(payload)
    except (IndexError, struct.error) as exc:
        raise ValueError(
            f"malformed MP4 payload: {type(exc).__name__}: {exc}"
        ) from exc


def _demux_mp4(payload: bytes) -> list[Mp4Sample]:
    if len(payload) < 12 or payload[4:8] not in (
            b"ftyp", b"styp", b"moov", b"mdat"):
        raise ValueError("not an ISO-BMFF payload")
    if _find(payload, 0, len(payload), b"moof") is not None:
        return _demux_fmp4(payload)
    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("MP4 missing moov")

    chosen = None  # (is_video, stbl_range, timescale)
    for t, b, e in _iter_boxes(payload, *moov):
        if t != b"trak":
            continue
        mdia = _find(payload, b, e, b"mdia")
        if mdia is None:
            continue
        mdhd = _find(payload, *mdia, b"mdhd")
        hdlr = _find(payload, *mdia, b"hdlr")
        minf = _find(payload, *mdia, b"minf")
        if mdhd is None or minf is None:
            continue
        stbl = _find(payload, *minf, b"stbl")
        if stbl is None:
            continue
        ver, p = _full_box(payload, mdhd[0])
        timescale = struct.unpack_from(
            ">I", payload, p + (16 if ver == 1 else 8))[0]
        kind = payload[hdlr[0] + 8:hdlr[0] + 12] if hdlr else b"????"
        is_video = kind == b"vide"
        if chosen is None or (is_video and not chosen[0]):
            chosen = (is_video, stbl, timescale)
        if is_video:
            break
    if chosen is None:
        raise ValueError("MP4 has no track with a sample table")
    _, stbl, timescale = chosen
    if timescale == 0:
        # Guard before any dts arithmetic: a malformed mdhd would
        # otherwise surface as ZeroDivisionError, which dead-letter
        # routing does not key on.
        raise ValueError("MP4 mdhd timescale is 0")

    def full(btype: bytes, required: bool = True):
        r = _find(payload, *stbl, btype)
        if r is None:
            if required:
                raise ValueError(f"MP4 stbl missing {btype.decode()}")
            return None
        return _full_box(payload, r[0])[1]

    # stsd → codec fourcc of the first entry
    p = full(b"stsd")
    codec = payload[p + 8:p + 12].decode("latin1")

    # stsz → sizes
    p = full(b"stsz")
    fixed, count = struct.unpack_from(">II", payload, p)
    if fixed:
        sizes = [fixed] * count
    else:
        sizes = list(struct.unpack_from(f">{count}I", payload, p + 8))

    # stco / co64 → chunk offsets
    r = _find(payload, *stbl, b"stco")
    if r is not None:
        p = _full_box(payload, r[0])[1]
        (n_chunks,) = struct.unpack_from(">I", payload, p)
        chunk_offs = list(struct.unpack_from(f">{n_chunks}I", payload, p + 4))
    else:
        p = full(b"co64")
        (n_chunks,) = struct.unpack_from(">I", payload, p)
        chunk_offs = list(struct.unpack_from(f">{n_chunks}Q", payload, p + 4))

    # stsc → samples-per-chunk runs, expanded over the chunk list
    p = full(b"stsc")
    (n_runs,) = struct.unpack_from(">I", payload, p)
    runs = [struct.unpack_from(">III", payload, p + 4 + 12 * i)
            for i in range(n_runs)]
    spc = [0] * n_chunks
    for i, (first, per, _desc) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < n_runs else n_chunks
        for c in range(first - 1, last):
            spc[c] = per

    # stts → per-sample decode timestamps. Run counts are corruption-
    # controlled 32-bit ints: clamp expansion to the stsz sample count
    # (a 0xFFFFFFF0 count would otherwise spin for minutes and OOM —
    # r10 review, fuzzing-confirmed) and stop once covered.
    p = full(b"stts")
    (n_tt,) = struct.unpack_from(">I", payload, p)
    dts, t = [], 0
    for i in range(n_tt):
        cnt, delta = struct.unpack_from(">II", payload, p + 4 + 8 * i)
        for _ in range(min(cnt, count - len(dts))):
            dts.append(t)
            t += delta
        if len(dts) >= count:
            break
    if len(dts) < count:
        raise ValueError("stts covers fewer samples than stsz")

    # ctts → per-sample composition (pts-dts) offsets; absent ⇒ 0.
    # Version 0 carries unsigned offsets, version 1 signed (the
    # negative-offset form modern muxers emit with dts shifted).
    cts = [0] * count
    r = _find(payload, *stbl, b"ctts")
    if r is not None:
        ver, p = _full_box(payload, r[0])
        (n_ct,) = struct.unpack_from(">I", payload, p)
        fmt = ">Ii" if ver == 1 else ">II"
        si = 0
        for i in range(n_ct):
            cnt, off_ct = struct.unpack_from(fmt, payload, p + 4 + 8 * i)
            # clamp: run counts are corruption-controlled (r10 review)
            for _ in range(min(cnt, count - si)):
                cts[si] = off_ct
                si += 1
            if si >= count:
                break

    # stss → sync samples (1-based); absent ⇒ all sync
    sync = None
    r = _find(payload, *stbl, b"stss")
    if r is not None:
        p = _full_box(payload, r[0])[1]
        (n_sync,) = struct.unpack_from(">I", payload, p)
        sync = set(struct.unpack_from(f">{n_sync}I", payload, p + 4))

    samples, si = [], 0
    for c in range(n_chunks):
        off = chunk_offs[c]
        for _ in range(spc[c]):
            if si >= count:
                break
            if off + sizes[si] > len(payload):
                raise ValueError("MP4 sample range exceeds payload")
            samples.append(Mp4Sample(
                index=si, offset=off, size=sizes[si],
                dts_ms=dts[si] * 1000 // timescale,
                pts_ms=(dts[si] + cts[si]) * 1000 // timescale,
                keyframe=(sync is None or (si + 1) in sync),
                codec=codec,
            ))
            off += sizes[si]
            si += 1
    if si != count:
        raise ValueError("stsc/stco chunk map does not cover all samples")
    return samples


_NON_SYNC_BIT = 0x00010000  # sample_is_non_sync_sample in sample_flags


def _demux_fmp4(payload: bytes) -> list[Mp4Sample]:
    """Fragmented-MP4 path: moov carries empty sample tables plus
    mvex/trex defaults; the samples live in moof/traf/trun runs.

    Per ISO/IEC 14496-12 §8.8: tfhd may carry a base-data-offset or
    the default-base-is-moof flag (data offsets measured from the
    moof box start — the CMAF/DASH shape); absent both, the first
    traf's base is the moof start and later trafs continue from the
    previous traf's data end. trun flags select which per-sample
    fields are inline vs defaulted from tfhd, then trex."""
    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("fragmented MP4 missing moov (init segment)")

    tracks = {}  # track_id -> (is_video, timescale, codec)
    for t, b, e in _iter_boxes(payload, *moov):
        if t != b"trak":
            continue
        tkhd = _find(payload, b, e, b"tkhd")
        mdia = _find(payload, b, e, b"mdia")
        if tkhd is None or mdia is None:
            continue
        ver, p = _full_box(payload, tkhd[0])
        track_id = struct.unpack_from(
            ">I", payload, p + (16 if ver == 1 else 8))[0]
        mdhd = _find(payload, *mdia, b"mdhd")
        hdlr = _find(payload, *mdia, b"hdlr")
        minf = _find(payload, *mdia, b"minf")
        if mdhd is None or minf is None:
            continue
        ver, p = _full_box(payload, mdhd[0])
        timescale = struct.unpack_from(
            ">I", payload, p + (16 if ver == 1 else 8))[0]
        kind = payload[hdlr[0] + 8:hdlr[0] + 12] if hdlr else b"????"
        codec = "????"
        stbl = _find(payload, *minf, b"stbl") if minf else None
        if stbl is not None:
            stsd = _find(payload, *stbl, b"stsd")
            if stsd is not None:
                p = _full_box(payload, stsd[0])[1]
                codec = payload[p + 8:p + 12].decode("latin1")
        tracks[track_id] = (kind == b"vide", timescale, codec)
    if not tracks:
        raise ValueError("fragmented MP4 has no usable track")
    chosen_tid = next(
        (tid for tid, v in tracks.items() if v[0]), next(iter(tracks)))
    _, timescale, codec = tracks[chosen_tid]
    if timescale == 0:
        raise ValueError("MP4 mdhd timescale is 0")

    # trex defaults (one per track)
    trex: dict[int, tuple] = {}
    mvex = _find(payload, *moov, b"mvex")
    if mvex is not None:
        for t, b, e in _iter_boxes(payload, *mvex):
            if t == b"trex":
                p = _full_box(payload, b)[1]
                tid, _desc, ddur, dsize, dflags = struct.unpack_from(
                    ">IIIII", payload, p)
                trex[tid] = (ddur, dsize, dflags)

    samples: list[Mp4Sample] = []
    si = 0
    t_cursor = 0  # decode time in track timescale; tfdt resets it
    for bt, box_start, body, box_end in _iter_boxes4(
            payload, 0, len(payload)):
        if bt != b"moof":
            continue
        implicit_base = box_start  # first traf with no explicit base
        for t2, _s2, b2, e2 in _iter_boxes4(payload, body, box_end):
            if t2 != b"traf":
                continue
            tfhd_r = _find(payload, b2, e2, b"tfhd")
            if tfhd_r is None:
                raise ValueError("MP4 traf missing tfhd")
            th = tfhd_r[0]
            th_flags = int.from_bytes(payload[th + 1:th + 4], "big")
            p = th + 4
            (tid,) = struct.unpack_from(">I", payload, p)
            p += 4
            base_data_offset = None
            if th_flags & 0x000001:
                base_data_offset = struct.unpack_from(">Q", payload, p)[0]
                p += 8
            if th_flags & 0x000002:  # sample_description_index
                p += 4
            ddur, dsize, dflags = trex.get(tid, (None, None, None))
            if th_flags & 0x000008:
                ddur = struct.unpack_from(">I", payload, p)[0]
                p += 4
            if th_flags & 0x000010:
                dsize = struct.unpack_from(">I", payload, p)[0]
                p += 4
            if th_flags & 0x000020:
                dflags = struct.unpack_from(">I", payload, p)[0]
                p += 4
            if base_data_offset is not None:
                base = base_data_offset
            elif th_flags & 0x020000:  # default-base-is-moof
                base = box_start
            else:
                base = implicit_base

            emit = tid == chosen_tid
            if emit:
                tfdt_r = _find(payload, b2, e2, b"tfdt")
                if tfdt_r is not None:
                    ver, p2 = _full_box(payload, tfdt_r[0])
                    t_cursor = struct.unpack_from(
                        ">Q" if ver == 1 else ">I", payload, p2)[0]

            # Walk every trun (even for skipped tracks — the implicit
            # base of the NEXT traf is this traf's data end).
            off = None
            for t3, _s3, b3, e3 in _iter_boxes4(payload, b2, e2):
                if t3 != b"trun":
                    continue
                tr_ver = payload[b3]
                tr_flags = int.from_bytes(payload[b3 + 1:b3 + 4], "big")
                p3 = b3 + 4
                (scount,) = struct.unpack_from(">I", payload, p3)
                p3 += 4
                # scount is corruption-controlled: with per-sample
                # fields it must fit the trun box; without, no sane
                # file has more samples than payload bytes (each
                # sample occupies mdat space). Unbounded it spins for
                # minutes per payload (r10 review, fuzz-confirmed).
                per = 4 * bin(tr_flags & 0xF00).count("1")
                fixed = (4 if tr_flags & 0x1 else 0) \
                    + (4 if tr_flags & 0x4 else 0)
                if per and p3 + fixed + scount * per > e3:
                    raise ValueError(
                        "MP4 trun sample fields exceed the trun box")
                if scount > len(payload):
                    raise ValueError(
                        "MP4 trun sample count exceeds payload size")
                if tr_flags & 0x000001:
                    (doff,) = struct.unpack_from(">i", payload, p3)
                    p3 += 4
                    off = base + doff
                elif off is None:
                    off = base
                first_flags = None
                if tr_flags & 0x000004:
                    (first_flags,) = struct.unpack_from(">I", payload, p3)
                    p3 += 4
                for k in range(scount):
                    dur, size, sflags, cts_off = ddur, dsize, dflags, 0
                    if tr_flags & 0x000100:
                        (dur,) = struct.unpack_from(">I", payload, p3)
                        p3 += 4
                    if tr_flags & 0x000200:
                        (size,) = struct.unpack_from(">I", payload, p3)
                        p3 += 4
                    if tr_flags & 0x000400:
                        (sflags,) = struct.unpack_from(">I", payload, p3)
                        p3 += 4
                    if tr_flags & 0x000800:  # composition (pts-dts)
                        (cts_off,) = struct.unpack_from(
                            ">i" if tr_ver == 1 else ">I", payload, p3)
                        p3 += 4
                    if k == 0 and first_flags is not None:
                        sflags = first_flags
                    if size is None:
                        raise ValueError(
                            "MP4 trun sample has no size (no inline, "
                            "tfhd, or trex default)")
                    if emit:
                        if dur is None:
                            raise ValueError(
                                "MP4 trun sample has no duration (no "
                                "inline, tfhd, or trex default)")
                        if off + size > len(payload):
                            raise ValueError(
                                "MP4 sample range exceeds payload")
                        samples.append(Mp4Sample(
                            index=si, offset=off, size=size,
                            dts_ms=t_cursor * 1000 // timescale,
                            pts_ms=(t_cursor + cts_off) * 1000
                            // timescale,
                            keyframe=not ((sflags or 0) & _NON_SYNC_BIT),
                            codec=codec,
                        ))
                        si += 1
                        t_cursor += dur
                    off += size
            if off is not None:
                implicit_base = off
    if not samples:
        raise ValueError("fragmented MP4 has no trun samples for the "
                         "selected track")
    return samples


def extract_sample_bytes(payload: bytes, fmt: str) -> list[bytes]:
    """``sample_frames`` extractor: the track's coded access units,
    byte-exact, in decode order — real container demux for mp4/m4v/
    mov payloads."""
    return [payload[s.offset:s.offset + s.size] for s in demux_mp4(payload)]


def keyframe_sample_bytes(payload: bytes, fmt: str) -> list[bytes]:
    """Like :func:`extract_sample_bytes` but sync samples only — the
    frames a sampling pipeline would actually send to a decoder
    (seek-free random access)."""
    return [payload[s.offset:s.offset + s.size]
            for s in demux_mp4(payload) if s.keyframe]


def frame_metadata(media):
    """Metadata-ONLY demux of every mp4/m4v/mov row: (media_id,
    frame_index, dts_ms, pts_ms, keyframe, n_bytes, codec) — no
    frame bytes.

    This is the 100 TB pattern for video: demux is box arithmetic
    (KBs of moov per GB of mdat), so you profile the WHOLE corpus
    first, pick frames relationally (keyframes at a stride, dts
    windows, size caps — plain DataFrame filters with full pushdown),
    and only then run the expensive byte extraction + pixel decode on
    the selected subset. Non-video rows produce no output; malformed
    video payloads raise (route through a dead-letter filter upstream
    if the corpus is dirty)."""
    import pandas as pd
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("dts_ms", T.LongType()),
        T.StructField("pts_ms", T.LongType()),
        T.StructField("keyframe", T.BooleanType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("codec", T.StringType()),
    ])

    def process(batches):
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "frame_index", "dts_ms",
                                    "pts_ms", "keyframe", "n_bytes",
                                    "codec")}
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"],
                                          pdf["meta"]):
                if meta["format"] not in ("mp4", "m4v", "mov"):
                    continue
                for s in demux_mp4(payload):
                    rows["media_id"].append(mid)
                    rows["frame_index"].append(s.index)
                    rows["dts_ms"].append(s.dts_ms)
                    rows["pts_ms"].append(s.pts_ms)
                    rows["keyframe"].append(s.keyframe)
                    rows["n_bytes"].append(s.size)
                    rows["codec"].append(s.codec)
            yield pd.DataFrame(rows)

    return media.mapInPandas(process, schema=schema)


# --------------------------------------------------------------------------
# write half: minimal muxer
# --------------------------------------------------------------------------

def mux_mp4_video(frames: list[bytes], codec: bytes = b"jpeg",
                  timescale: int = 1000, frame_dur: int = 40) -> bytes:
    """Minimal single-track MP4 muxer — the WRITE half that proves the
    demuxer (the encode_gif / encode_flac / write_avro_ocf fixture
    philosophy: no media libs in the container, so the engine carries
    the writer its own reader is tested against). One chunk, explicit
    stsz sizes, a single stts run of ``frame_dur`` ticks, no stss
    (ISO 14496-12: absent stss means every sample is sync). With
    ``codec=b"jpeg"``/``b"mjpa"`` each frame must be a standard JPEG
    bitstream and the payload decodes to PIXELS through
    multimodal.sample_frames (MJPEG_FOURCCS routing); other fourccs
    emit the coded units byte-exactly.

    Production corpora arrive already muxed; this writer exists for
    certification queries (media_decode_profile_video) and tests."""
    if not frames:
        raise ValueError("mux_mp4_video needs at least one frame")

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + btype + body

    def full(btype: bytes, body: bytes, ver: int = 0,
             flags: int = 0) -> bytes:
        return box(btype, struct.pack(">I", (ver << 24) | flags) + body)

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    mdat = box(b"mdat", b"".join(frames))
    chunk_off = len(ftyp) + 8          # first frame byte inside mdat

    # Spec-sized VisualSampleEntry (ISO 14496-12 §12.1.3, 78-byte
    # body; r12 advice: a 16-zero-byte entry malformed the file for
    # external parsers): SampleEntry header + pre_defined/reserved,
    # width/height 0 (unknown — the coded units carry their own
    # dimensions for the jpeg/mjpa fourccs this writer targets),
    # 72 dpi fixed-point resolutions, frame_count 1, empty
    # compressorname, depth 24, pre_defined -1.
    entry = (b"\x00" * 6 + struct.pack(">H", 1)      # data_ref_index
             + struct.pack(">HH", 0, 0) + b"\x00" * 12
             + struct.pack(">HH", 0, 0)              # width, height
             + struct.pack(">II", 0x00480000, 0x00480000)
             + struct.pack(">I", 0) + struct.pack(">H", 1)
             + b"\x00" * 32
             + struct.pack(">Hh", 0x0018, -1))
    stsd = full(b"stsd", struct.pack(">I", 1) + box(codec, entry))
    stts = full(b"stts", struct.pack(">III", 1, len(frames), frame_dur))
    stsc = full(b"stsc", struct.pack(">IIII", 1, 1, len(frames), 1))
    stsz = full(b"stsz", struct.pack(">II", 0, len(frames))
                + b"".join(struct.pack(">I", len(f)) for f in frames))
    stco = full(b"stco", struct.pack(">II", 1, chunk_off))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = box(b"minf", stbl)
    hdlr = full(b"hdlr", struct.pack(">I", 0) + b"vide"
                + b"\x00" * 12 + b"video\x00")
    # v0 mdhd body: creation, modification, timescale, DURATION,
    # language, pre_defined (r12 review: the duration field was
    # missing entirely, malforming the box for external parsers)
    mdhd = full(b"mdhd", struct.pack(">IIIIHH", 0, 0, timescale,
                                     len(frames) * frame_dur, 0, 0))
    mdia = box(b"mdia", mdhd + hdlr + minf)
    dur = len(frames) * frame_dur
    unity = struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0,
                        0, 0, 0x40000000)
    # v0 tkhd, flags=3 (enabled+in-movie); width/height 0 match stsd
    tkhd = full(b"tkhd", struct.pack(">IIII", 0, 0, 1, 0)
                + struct.pack(">I", dur) + b"\x00" * 8
                + struct.pack(">HHHH", 0, 0, 0, 0) + unity
                + struct.pack(">II", 0, 0), flags=3)
    # v0 mvhd: movie timescale = track timescale, next_track_ID = 2
    mvhd = full(b"mvhd", struct.pack(">IIII", 0, 0, timescale, dur)
                + struct.pack(">IHH", 0x00010000, 0x0100, 0)
                + b"\x00" * 8 + unity + b"\x00" * 24
                + struct.pack(">I", 2))
    moov = box(b"moov", mvhd + box(b"trak", tkhd + mdia))
    return ftyp + mdat + moov
