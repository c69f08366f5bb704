"""Pure-stdlib WAV PCM decoding for the multimodal audio path.

Same posture as `imagecodec`: formats the Python stdlib can genuinely
decode are decoded for REAL (RIFF/WAVE PCM via the `wave` module +
`struct`); everything else (mp3, ogg, flac — all need entropy coders the
stdlib lacks) is the caller's honest-fallback problem. No numpy here: the
codec must run inside Arrow workers with zero optional dependencies.

Reference tie-in: the reference pipeline is text-only
(`airflow/dags/zara_hybrid_etl.py`); audio columns are part of the
training-data extension surface (opaque binary + typed metadata +
Pandas-UDF feature extraction over mapInPandas).
"""

from __future__ import annotations

import io
import struct
import wave

# cap decoded samples per file so a pathological multi-hour WAV cannot blow
# task memory: features below are stable statistics, a 1M-sample prefix
# (~23s at 44.1 kHz) is ample
MAX_SAMPLES = 1_000_000


def sniff_audio_format(data: bytes) -> str:
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:3] == b"ID3" or (len(data) > 1 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0):
        return "mp3"
    if data[:4] == b"OggS":
        return "ogg"
    if data[:4] == b"fLaC":
        return "flac"
    return "unknown"


def decode_wav(data: bytes) -> tuple[int, int, int, list[float]]:
    """RIFF/WAVE PCM -> (sample_rate, n_channels, n_frames, mono samples in
    [-1, 1], first MAX_SAMPLES frames, channels averaged). Raises
    wave.Error/ValueError/struct.error on non-WAV or compressed input —
    callers map those to their fallback, mirroring imagecodec."""
    with wave.open(io.BytesIO(data), "rb") as w:
        sr, nch, width, nframes = (
            w.getframerate(), w.getnchannels(), w.getsampwidth(), w.getnframes(),
        )
        if width not in (1, 2):
            raise ValueError(f"unsupported PCM sample width {width}")
        take = min(nframes, MAX_SAMPLES)
        raw = w.readframes(take)
    if width == 2:
        vals = struct.unpack(f"<{len(raw) // 2}h", raw)
        scale = 32768.0
    else:  # 8-bit WAV PCM is unsigned
        vals = tuple(b - 128 for b in raw)
        scale = 128.0
    if nch > 1:
        mono = [
            sum(vals[i + c] for c in range(nch)) / (nch * scale)
            for i in range(0, len(vals) - nch + 1, nch)
        ]
    else:
        mono = [v / scale for v in vals]
    return sr, nch, nframes, mono


def audio_stats(samples: list[float]) -> tuple[float, float, float]:
    """(rms, peak, zero_crossing_rate) of a mono sample list; zeros for an
    empty list. Pure Python on the capped prefix — bounded CPU per file."""
    n = len(samples)
    if n == 0:
        return 0.0, 0.0, 0.0
    rms = (sum(x * x for x in samples) / n) ** 0.5
    peak = max(abs(x) for x in samples)
    crossings = sum(
        1 for i in range(1, n) if (samples[i - 1] < 0) != (samples[i] < 0)
    )
    zcr = crossings / (n - 1) if n > 1 else 0.0
    return rms, peak, zcr
