"""Video muxing without ffmpeg: MJPEG-in-AVI with an optional PCM track.

The reference muxes frames + audio with moviepy/ffmpeg
(``script/render.py:142-148``); neither ships here, so this is a
self-contained RIFF/AVI writer: one 'vids' stream of JPEG-compressed
frames (PIL encoder) interleaved with one 'auds' stream of 16-bit PCM,
plus an idx1 index. MJPEG AVI plays in every mainstream player.
"""

from __future__ import annotations

import io
import struct
from typing import List, Optional

import numpy as np


def _jpeg_bytes(frame: np.ndarray, quality: int = 90) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(frame).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def write_mjpeg_avi(
    path: str,
    frames: List[np.ndarray],
    fps: int,
    audio: Optional[np.ndarray] = None,
    sample_rate: int = 16000,
    quality: int = 90,
) -> None:
    """Write frames (+ optional mono float waveform) as an MJPEG AVI."""
    if not frames:
        raise ValueError("no frames to write")
    height, width = frames[0].shape[:2]
    n_frames = len(frames)

    pcm = None
    if audio is not None:
        pcm = (np.clip(np.asarray(audio), -1, 1) * 32767.0).astype("<i2")
        samples_per_frame = sample_rate // fps

    jpegs = [_jpeg_bytes(f, quality) for f in frames]
    max_jpeg = max(len(j) for j in jpegs)

    # ---- headers
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # microseconds per frame
        0,  # max bytes per sec (0 = unspecified)
        0,  # padding granularity
        0x10,  # flags: AVIF_HASINDEX
        n_frames,
        0,  # initial frames
        2 if pcm is not None else 1,  # streams
        max_jpeg,  # suggested buffer size
        width,
        height,
        0, 0, 0, 0,
    )

    strh_vids = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps,  # scale, rate → fps
        0, n_frames, max_jpeg, 0xFFFFFFFF, 0,
        0, 0, width, height,
    )
    bmih = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    strl_vids = _list(
        b"strl", _chunk(b"strh", strh_vids) + _chunk(b"strf", bmih)
    )

    strl_auds = b""
    if pcm is not None:
        block_align = 2  # mono 16-bit
        strh_auds = struct.pack(
            "<4s4sIHHIIIIIIIIhhhh",
            b"auds", b"\x00\x00\x00\x00", 0, 0, 0, 0,
            1, sample_rate,
            0, len(pcm), 0, 0xFFFFFFFF, block_align,
            0, 0, 0, 0,
        )
        wfx = struct.pack(
            "<HHIIHH", 1, 1, sample_rate, sample_rate * 2, block_align, 16
        )
        strl_auds = _list(
            b"strl", _chunk(b"strh", strh_auds) + _chunk(b"strf", wfx)
        )

    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl_vids + strl_auds)

    # ---- movi (interleaved) + idx1
    movi_payload = b"movi"
    idx_entries = []
    audio_pos = 0
    for i, jpeg in enumerate(jpegs):
        offset = len(movi_payload)
        movi_payload += _chunk(b"00dc", jpeg)
        idx_entries.append((b"00dc", 0x10, offset, len(jpeg)))
        if pcm is not None:
            lo = audio_pos
            hi = min(len(pcm), (i + 1) * samples_per_frame)
            if i == len(jpegs) - 1:
                hi = len(pcm)
            if hi > lo:
                payload = pcm[lo:hi].tobytes()
                offset = len(movi_payload)
                movi_payload += _chunk(b"01wb", payload)
                idx_entries.append((b"01wb", 0x10, offset, len(payload)))
                audio_pos = hi

    movi = _chunk(b"LIST", movi_payload)
    idx1 = b"".join(
        fourcc + struct.pack("<III", flags, offset, size)
        for fourcc, flags, offset, size in idx_entries
    )

    riff_payload = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload)
