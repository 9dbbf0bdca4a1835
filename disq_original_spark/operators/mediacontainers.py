"""Dependency-free pure-numpy/struct WAV and Y4M container codecs.

Round 5 made the image path real (``imagecodec.py``); this module does the
same for audio and video with the two public container formats simple
enough to implement exactly from their specs without codec libraries:

- **WAV** (RIFF PCM): canonical 44-byte header (mono, 8-bit unsigned PCM,
  8 kHz), data chunk = the raw samples, RIFF-conformant pad byte on odd
  data lengths.  Decode walks the RIFF chunk list (tolerating extra
  chunks like LIST/fact), validates the fmt chunk, and returns the
  sample bytes.
- **Y4M** (YUV4MPEG2): plain-text stream header with W/H/F/I/A/C tokens
  (mono colorspace) plus an ``Xclen=<n>`` extension token carrying the
  content length, then ``FRAME\\n``-prefixed fixed-size planes.  Each
  16x16 mono frame holds one 256-byte slice of the content, zero-padded;
  decode parses the header, slices the frames, and trims the final frame
  back to the content length.

Both fail loud (ValueError) on malformed input — same contract as
``imagecodec.bmp_decode``.
"""

from __future__ import annotations

import struct

WAV_HEADER_SIZE = 44
_WAV_RATE = 8000

Y4M_FRAME_W = 16
Y4M_FRAME_H = 16
Y4M_FRAME_BYTES = Y4M_FRAME_W * Y4M_FRAME_H
_Y4M_FIXED = f"YUV4MPEG2 W{Y4M_FRAME_W} H{Y4M_FRAME_H} F25:1 Ip A1:1 Cmono Xclen="


def wav_size(n_samples: int) -> int:
    """Exact encoded size: 44-byte header + data + RIFF pad on odd len."""
    return WAV_HEADER_SIZE + n_samples + (n_samples % 2)


def wav_encode(samples: bytes) -> bytes:
    """8-bit unsigned mono PCM WAV holding ``samples`` verbatim."""
    n = len(samples)
    pad = b"\x00" if n % 2 else b""
    return (
        b"RIFF"
        + struct.pack("<I", 36 + n + len(pad))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, _WAV_RATE, _WAV_RATE, 1, 8)
        + b"data"
        + struct.pack("<I", n)
        + samples
        + pad
    )


def wav_decode(data: bytes) -> bytes:
    """Return the PCM sample bytes; walks the RIFF chunk list so files
    with extra chunks (LIST, fact) between fmt and data still decode."""
    if len(data) < WAV_HEADER_SIZE:
        raise ValueError(f"WAV truncated: {len(data)} bytes < {WAV_HEADER_SIZE}")
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError(f"not a WAV: magic {data[:4]!r}/{data[8:12]!r}")
    pos, fmt_seen = 12, False
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            if clen < 16 or body + 16 > len(data):
                raise ValueError("WAV fmt chunk truncated")
            audio_fmt, channels, _rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", data, body
            )
            if audio_fmt != 1 or channels != 1 or bits != 8:
                raise ValueError(
                    f"unsupported WAV variant: fmt={audio_fmt} channels="
                    f"{channels} bits={bits} (only 8-bit mono PCM)"
                )
            fmt_seen = True
        elif cid == b"data":
            if not fmt_seen:
                raise ValueError("WAV data chunk before fmt chunk")
            if body + clen > len(data):
                raise ValueError(
                    f"WAV data truncated: chunk claims {clen} bytes, "
                    f"{len(data) - body} available"
                )
            return data[body : body + clen]
        pos = body + clen + (clen % 2)  # RIFF chunks are word-aligned
    raise ValueError("WAV has no data chunk")


def y4m_size(content_len: int) -> int:
    """Exact encoded size: variable-length header (the Xclen digits) +
    ceil(content/256) FRAME-prefixed 256-byte mono planes (min 1)."""
    n_frames = max(1, -(-content_len // Y4M_FRAME_BYTES))
    return (
        len(_Y4M_FIXED) + len(str(content_len)) + 1  # header + '\n'
        + n_frames * (6 + Y4M_FRAME_BYTES)  # 'FRAME\n' + plane
    )


def y4m_encode(content: bytes) -> bytes:
    """YUV4MPEG2 stream: each 256-byte slice of ``content`` becomes one
    zero-padded 16x16 mono frame; Xclen records the exact content length
    so decode can trim the final frame."""
    n = len(content)
    out = [(_Y4M_FIXED + str(n)).encode("ascii"), b"\n"]
    n_frames = max(1, -(-n // Y4M_FRAME_BYTES))
    for i in range(n_frames):
        plane = content[i * Y4M_FRAME_BYTES : (i + 1) * Y4M_FRAME_BYTES]
        out.append(b"FRAME\n")
        out.append(plane.ljust(Y4M_FRAME_BYTES, b"\x00"))
    return b"".join(out)


def y4m_decode(data: bytes) -> list[bytes]:
    """Parse a Y4M stream to its per-frame content slices (final frame
    trimmed to the Xclen content length).  Validates the stream magic,
    geometry tokens and frame markers."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(b"YUV4MPEG2"):
        raise ValueError(f"not a Y4M stream: {data[:9]!r}")
    tokens = data[:nl].decode("ascii", "replace").split(" ")
    # X-extension tokens may legally repeat (YUV4MPEG2 allows any number of
    # X<text> parameters) — collecting them into a list instead of keying by
    # first letter keeps a stream like "Xconverted-by=foo Xclen=40" decodable
    # (a dict keyed on 'X' would let the later token shadow Xclen) (ADVICE r5)
    params = {t[0]: t[1:] for t in tokens[1:] if t and t[0] != "X"}
    xtokens = [t[1:] for t in tokens[1:] if t and t[0] == "X"]
    if params.get("W") != str(Y4M_FRAME_W) or params.get("H") != str(Y4M_FRAME_H):
        raise ValueError(
            f"unsupported Y4M geometry W{params.get('W')} H{params.get('H')} "
            f"(this corpus encodes {Y4M_FRAME_W}x{Y4M_FRAME_H})"
        )
    if params.get("C") != "mono":
        raise ValueError(f"unsupported Y4M colorspace C{params.get('C')}")
    xclen = next((x for x in xtokens if x.startswith("clen=")), "")
    if not xclen.startswith("clen=") or not xclen[5:].isdigit():
        raise ValueError("Y4M stream missing a valid Xclen content-length token")
    clen = int(xclen[5:])
    frames: list[bytes] = []
    pos = nl + 1
    while pos < len(data):
        if data[pos : pos + 6] != b"FRAME\n":
            raise ValueError(f"bad Y4M frame marker at offset {pos}")
        pos += 6
        if pos + Y4M_FRAME_BYTES > len(data):
            raise ValueError("Y4M frame plane truncated")
        frames.append(data[pos : pos + Y4M_FRAME_BYTES])
        pos += Y4M_FRAME_BYTES
    if not frames:
        raise ValueError("Y4M stream has no frames")
    # Xclen must agree with the stored frame count — a mismatch (corrupt
    # digit, truncated frame list) would otherwise return zero padding as
    # content or skip the tail trim entirely (fail-loud contract)
    if len(frames) != max(1, -(-clen // Y4M_FRAME_BYTES)):
        raise ValueError(
            f"Y4M Xclen={clen} inconsistent with {len(frames)} stored "
            f"frames of {Y4M_FRAME_BYTES} bytes"
        )
    # trim back to the content: full frames + the final partial slice
    start_of_last = (len(frames) - 1) * Y4M_FRAME_BYTES
    last_len = max(0, min(Y4M_FRAME_BYTES, clen - start_of_last))
    # Same-band corruption guard: the encoder zero-pads past the content,
    # so any nonzero byte after clen in the final plane means the Xclen
    # digit was corrupted DOWN within its 256-byte band and real content
    # would be dropped.  (A clen corrupted UP over an all-zero pad region
    # is indistinguishable from content that genuinely ends in zeros —
    # the residual ambiguity of a length field without a checksum.)
    if any(frames[-1][last_len:]):
        raise ValueError(
            f"Y4M Xclen={clen} truncates nonzero plane bytes — corrupted "
            "content-length token"
        )
    frames[-1] = frames[-1][:last_len]
    return frames
