"""Pure-numpy AVI codec (uncompressed raw-DIB video) — the video leg
of the real-container work started with multimodal/wav.py (audio) and
multimodal/bmp.py (images).

AVI is a RIFF form (the same container family as WAV): a ``hdrl``
LIST carrying the main header (``avih``: frame period, frame count,
dimensions) and one video stream description (``strh`` fccType
``vids`` handler ``DIB ``, ``strf`` = BITMAPINFOHEADER), then a
``movi`` LIST whose ``00db`` chunks each hold one uncompressed frame
in BMP pixel layout (bottom-up BGR rows padded to 4 bytes). This
module writes and chunk-walks exactly that subset — genuine container
bytes a media player accepts — and refuses everything else
(compressed ``00dc`` streams, non-24-bit frames, missing headers)
loudly, so a later ffmpeg/PyAV swap only widens coverage.

Byte layout per the public Microsoft RIFF/AVI specification;
round-tripped bit-exactly in tests/test_avi.py.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_avi", "decode_avi"]

_BI_SIZE = 40


def _frame_bytes(frame: np.ndarray) -> bytes:
    """One frame as a raw DIB block: bottom-up, BGR, 4-byte row pad."""
    h, w, _ = frame.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = frame[:, :, ::-1].reshape(h, w * 3)
    return rows[::-1].tobytes()


def encode_avi(frames: np.ndarray, fps: int) -> bytes:
    """Serialize ``(n, h, w, 3)`` uint8 RGB frames (or ``(n, h, w)``
    grayscale, replicated to BGR) into an uncompressed AVI."""
    a = np.asarray(frames)
    if a.dtype != np.uint8:
        raise ValueError(f"encode_avi: frames must be uint8, got {a.dtype}")
    if a.ndim == 3:
        a = np.repeat(a[:, :, :, None], 3, axis=3)
    if a.ndim != 4 or a.shape[3] != 3:
        raise ValueError(
            f"encode_avi: frames must be (n,h,w) or (n,h,w,3), got {a.shape}"
        )
    if fps <= 0:
        raise ValueError("encode_avi: fps must be positive")
    if fps > 1_000_000:
        # dwMicroSecPerFrame would floor to 0 and the round-trip's own
        # decoder would refuse the container the encoder just wrote
        raise ValueError("encode_avi: fps above 1e6 is not representable")
    n, h, w, _ = a.shape
    stride = (w * 3 + 3) & ~3
    frame_size = stride * h

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b""
        )

    def lst(form: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", form + body)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_size * fps,  # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0,                 # dwFlags
        n,                 # dwTotalFrames
        0,                 # dwInitialFrames
        1,                 # dwStreams
        frame_size,        # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,        # dwReserved
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids",
        b"DIB ",
        0,      # dwFlags
        0, 0,   # wPriority, wLanguage
        0,      # dwInitialFrames
        1,      # dwScale
        fps,    # dwRate (fps = rate / scale)
        0,      # dwStart
        n,      # dwLength (frames)
        frame_size,  # dwSuggestedBufferSize
        0,      # dwQuality
        0,      # dwSampleSize
        0, 0, int(w), int(h),  # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII", _BI_SIZE, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00db", _frame_bytes(f)) for f in a))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(payload: bytes, start: int, end: int):
    """Yield (chunk_id, list_form_or_None, body_start, body_size) for
    each chunk in [start, end); LIST bodies start after their form."""
    pos = start
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = pos + 8
        if body + size > end:
            raise ValueError(
                f"decode_avi: chunk {cid!r} overruns the container"
            )
        if cid == b"LIST":
            # a LIST's body begins with its 4-byte form type; a crafted
            # size < 4 would steal the next chunk's bytes as the form
            # and propagate a negative body size
            if size < 4:
                raise ValueError(
                    f"decode_avi: LIST chunk too short for a form ({size} bytes)"
                )
            yield cid, payload[body : body + 4], body + 4, size - 4
        else:
            yield cid, None, body, size
        pos = body + size + (size % 2)


def decode_avi(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse an uncompressed AVI → ``(frames, fps)`` with ``frames``
    of shape ``(n, h, w, 3)`` uint8 RGB."""
    if len(payload) < 12:
        raise ValueError("decode_avi: truncated RIFF header")
    if payload[:4] != b"RIFF":
        raise ValueError("decode_avi: not a RIFF container (bad magic)")
    if payload[8:12] != b"AVI ":
        raise ValueError("decode_avi: RIFF form is not AVI")
    end = min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])

    avih = None
    strh = None
    strf = None
    frames_raw: list[bytes] = []

    def visit(start: int, stop: int, depth: int = 0) -> None:
        nonlocal avih, strh, strf
        # real AVIs nest 2-3 LISTs deep; a crafted file with hundreds
        # of nested LISTs must fail as a loud decoder ValueError, not
        # a Python RecursionError escaping the refusal contract
        if depth > 16:
            raise ValueError("decode_avi: LIST nesting exceeds sane depth")
        for cid, form, body, size in _walk(payload, start, stop):
            if cid == b"LIST":
                visit(body, body + size, depth + 1)
            elif cid == b"avih":
                # validate the DECLARED size before unpacking: an
                # undersized header must refuse as ValueError, never
                # escape as struct.error or silently parse the next
                # chunk's bytes as header fields
                if size < 40:
                    raise ValueError(f"decode_avi: avih chunk too short ({size} bytes)")
                avih = struct.unpack_from("<IIIIIIIIII", payload, body)
            elif cid == b"strh":
                if size < 8:
                    raise ValueError(f"decode_avi: strh chunk too short ({size} bytes)")
                strh = struct.unpack_from("<4s4s", payload, body)
            elif cid == b"strf":
                if size < 20:
                    raise ValueError(f"decode_avi: strf chunk too short ({size} bytes)")
                strf = struct.unpack_from("<IiiHHI", payload, body)
            elif cid in (b"00db", b"00dc"):
                if cid == b"00dc":
                    raise ValueError(
                        "decode_avi: compressed frame chunk 00dc — only "
                        "raw-DIB 00db streams are supported (a real codec "
                        "library is needed for compressed AVI)"
                    )
                frames_raw.append(payload[body : body + size])

    visit(12, end)
    if avih is None:
        raise ValueError("decode_avi: missing avih header")
    if strf is None:
        raise ValueError("decode_avi: missing strf stream format")
    if strh is not None and strh[0] != b"vids":
        raise ValueError(f"decode_avi: unsupported stream type {strh[0]!r}")
    usec_per_frame, w, h = avih[0], avih[8], avih[9]
    _bi, bw, bh, _planes, bits, comp = strf
    # zero-dimension containers would pass the per-frame length check
    # vacuously (stride*h == 0 == empty chunk) and crash downstream
    # pixel probes with IndexError — refuse them here like every other
    # malformed-geometry case
    if w < 1 or h < 1:
        raise ValueError(f"decode_avi: non-positive frame dims {w}x{h}")
    if comp != 0:
        raise ValueError(f"decode_avi: unsupported biCompression={comp}")
    if bits != 24:
        raise ValueError(f"decode_avi: unsupported bit depth {bits} (only 24)")
    if (bw, abs(bh)) != (w, h):
        raise ValueError(
            f"decode_avi: stream format {bw}x{bh} disagrees with avih {w}x{h}"
        )
    if usec_per_frame <= 0:
        raise ValueError("decode_avi: non-positive frame period")
    fps = round(1_000_000 / usec_per_frame)
    # mirror encode_avi's fps bounds: a frame period above 1e6 µs
    # rounds to fps=0, which downstream frame-samplers would divide by
    # — refuse the malformed period here, at the decoder
    if fps < 1:
        raise ValueError(
            f"decode_avi: frame period {usec_per_frame}µs yields fps < 1"
        )
    stride = (w * 3 + 3) & ~3
    # validate every frame's byte count against the header-declared
    # geometry BEFORE allocating the output array: a tiny crafted file
    # declaring huge avih dimensions over empty 00db chunks must refuse
    # as ValueError, not force a multi-GB np.empty (MemoryError)
    for i, raw in enumerate(frames_raw):
        if len(raw) != stride * h:
            raise ValueError(
                f"decode_avi: frame {i} holds {len(raw)} bytes, "
                f"{stride * h} required for {w}x{h}"
            )
    # negative strf biHeight = TOP-DOWN rows (same DIB convention as
    # BMP): the bottom-up flip must be skipped, or every frame decodes
    # vertically mirrored with no error
    top_down = bh < 0
    out = np.empty((len(frames_raw), h, w, 3), dtype=np.uint8)
    for i, raw in enumerate(frames_raw):
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
        img = rows[:, : w * 3].reshape(h, w, 3)
        if not top_down:
            img = img[::-1]
        out[i] = img[:, :, ::-1]
    return out, fps
