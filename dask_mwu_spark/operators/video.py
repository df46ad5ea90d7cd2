"""Optional real inter-frame video decoders for the ``video_decoder=``
seam of ``multimodal.real_decode_stats`` (VERDICT r5 item 3).

The repo's pure-stdlib multimodal codecs (PNG inflate+unfilter, WAV PCM,
MJPNG frame split) cover everything EXCEPT inter-frame codecs
(H.264/VP9/AV1): those require a real codec library, which this
container does not ship.  This module closes the gap the way the zarr
cross-check does — import/exec-guarded adapters that activate when the
dependency exists and leave the seam's fallback untouched when it
doesn't:

- ``av_video_decoder``  — PyAV (libav bindings): in-process decode of a
  bytes payload via BytesIO, no temp files.
- ``ffmpeg_video_decoder`` — ffmpeg CLI: writes the payload to a temp
  file (seekable — stdin pipes fail on non-faststart MP4s whose moov
  atom trails the data) and decodes via ``ffmpeg -i <f> -vf
  framestep=k -vsync 0 -f rawvideo -pix_fmt rgb24 -`` — the framestep
  filter samples INSIDE ffmpeg so only every ``every_k``-th frame
  crosses the pipe (one subprocess per payload — acceptable inside a
  scan-stage mapInPandas where each task owns its payloads; no shuffle
  implications).
- ``best_video_decoder`` — pyav if importable, else ffmpeg if on PATH,
  else None (callers keep the MJPNG fallback).

Each decoder returns ``(width, height, n_channels, content)`` where
``content`` is the concatenated rgb24 bytes of every ``every_k``-th
decoded frame — the exact contract ``real_decode_stats`` folds into
``(n_units, mean_value, content_md5)``.

Determinism note: unlike the stdlib codecs these are NOT oracle-checked
(codec dithering/color-conversion is library-version-specific); the
pytest gate (tests/test_video_adapter.py, skip-if-absent) instead
encodes a known synthetic clip and checks the decoded geometry, frame
count, and the near-lossless round-trip of the planted pixel pattern.
"""

from __future__ import annotations

import io
import shutil
import subprocess
from collections.abc import Callable

VideoDecoder = Callable[[bytes], tuple[int, int, int, bytes]]


def have_av() -> bool:
    """True when PyAV is importable (gates :func:`av_video_decoder`)."""
    try:
        import av  # noqa: F401

        return True
    except ImportError:
        return False


def have_ffmpeg() -> bool:
    """True when BOTH ffmpeg and ffprobe are on PATH."""
    # ffprobe ships separately in some minimal installs and the CLI
    # decoder needs BOTH (probe for dims, ffmpeg for frames)
    return (
        shutil.which("ffmpeg") is not None
        and shutil.which("ffprobe") is not None
    )


def av_video_decoder(*, every_k: int = 2) -> VideoDecoder:
    """PyAV-backed decoder factory (raises ImportError if pyav absent —
    call ``have_av()`` first or use ``best_video_decoder``)."""
    import av

    def _decode(payload: bytes) -> tuple[int, int, int, bytes]:
        frames = []
        width = height = 0
        with av.open(io.BytesIO(payload)) as container:
            stream = container.streams.video[0]
            # codec threads off: deterministic frame order
            stream.thread_type = "NONE"
            for i, frame in enumerate(container.decode(stream)):
                if i % every_k:
                    continue
                rgb = frame.to_ndarray(format="rgb24")
                height, width = rgb.shape[0], rgb.shape[1]
                frames.append(rgb.tobytes())
        if not frames:
            raise ValueError("no decodable video frames in payload")
        return width, height, 3, b"".join(frames)

    return _decode


def ffmpeg_video_decoder(*, every_k: int = 2) -> VideoDecoder:
    """ffmpeg-CLI-backed decoder factory (raises FileNotFoundError at
    decode time if ffmpeg/ffprobe are not on PATH).

    The payload goes through a TEMP FILE, not stdin: MP4 containers
    commonly carry the moov atom at the END (non-faststart — pyav's
    default output), and a non-seekable pipe makes ffprobe/ffmpeg fail
    with 'moov atom not found'; a file path is seekable."""

    def _decode(payload: bytes) -> tuple[int, int, int, bytes]:
        import os
        import tempfile

        fd, path = tempfile.mkstemp(suffix=".bin")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(payload)
            probe = subprocess.run(
                [
                    "ffprobe", "-v", "error", "-select_streams", "v:0",
                    "-show_entries", "stream=width,height",
                    "-of", "csv=p=0", path,
                ],
                capture_output=True,
                check=True,
            )
            width, height = (
                int(x) for x in probe.stdout.decode().strip().split(",")
            )
            # the framestep filter emits only every every_k-th frame
            # (0, k, 2k, ... — identical to the stdlib MJPNG sampling),
            # so the subprocess buffer holds ceil(n/k) frames instead of
            # the whole clip decoded to raw rgb24 (ADVICE r6: a long
            # real-world clip fully buffered is GBs per payload inside
            # an executor task); -vsync 0 (passthrough) stops ffmpeg
            # re-duplicating frames back to the container frame rate
            raw = subprocess.run(
                [
                    "ffmpeg", "-v", "error", "-i", path,
                    "-vf", f"framestep={every_k}", "-vsync", "0",
                    "-f", "rawvideo", "-pix_fmt", "rgb24", "-",
                ],
                capture_output=True,
                check=True,
            ).stdout
        finally:
            os.unlink(path)
        frame_bytes = width * height * 3
        n_frames = len(raw) // frame_bytes
        if n_frames == 0:
            raise ValueError("no decodable video frames in payload")
        # frames arrive pre-sampled; truncate any partial trailing write
        return width, height, 3, raw[: n_frames * frame_bytes]

    return _decode


def best_video_decoder(*, every_k: int = 2) -> VideoDecoder | None:
    """pyav > ffmpeg CLI > None (keep the MJPNG stdlib fallback)."""
    if have_av():
        return av_video_decoder(every_k=every_k)
    if have_ffmpeg():
        return ffmpeg_video_decoder(every_k=every_k)
    return None
