"""Foreign-file containment boundary for the media decoders.

The decode contract (see decode_media) is: a decoder either returns a
decoded result or raises ValueError (corrupt/truncated input) /
NotImplementedError (declared-unsupported feature). The per-format
parsers validate the structures they interpret, but a hostile or
merely foreign file can steer any byte-level walker into a mechanical
exception instead — struct.error on a truncated fixed field,
IndexError past a lying length, zlib.error from a damaged Deflate
stream, KeyError on a forged code-table reference. On an executor
those would crash the task instead of landing the record in the
dead-letter path, so every top-level decoder converts them to
ValueError at this boundary (tools/fuzz_decoders.py is the finder
that keeps the boundary honest; tests/test_decoder_fuzz.py holds the
distilled regressions).

ValueError and NotImplementedError pass through untouched — they ARE
the contract, and their messages are asserted by the codec tests.
"""

from __future__ import annotations

import zlib
from contextlib import contextmanager

# Exceptions a corrupt byte stream can mechanically trigger in a pure
# Python/numpy parser. struct.error subclasses Exception (it is NOT a
# ValueError); zlib.error likewise. MemoryError is deliberately NOT
# here: forged header dimensions are blocked by check_dims before they
# can size an allocation, so a MemoryError that does surface means
# genuine executor memory pressure — mislabeling it 'corrupt' would
# silently dead-letter a healthy record instead of failing the task
# for retry.
import struct

_MECHANICAL = (
    struct.error,
    zlib.error,
    IndexError,
    KeyError,
    StopIteration,
    UnicodeDecodeError,
    OverflowError,
    EOFError,
    # a forged size/stride field of 0 used as a divisor (e.g. a WAV
    # block_align) — corrupt input, not an executor fault
    ZeroDivisionError,
)

# Per-record decoded-size cap: elements (pixels x channels, or audio
# samples x channels) one record may expand to. 2^28 elements is a
# ~268-megapixel frame or ~4.5 h of stereo 16 kHz audio — far above
# any sane training-data record, far below an executor-killing
# allocation from a forged 32-bit header dimension.
MAX_DECODE_ELEMS = 1 << 28


@contextmanager
def foreign_file_guard(label: str):
    """Convert mechanical parse crashes into the ValueError contract."""
    try:
        yield
    except (ValueError, NotImplementedError):
        raise
    except _MECHANICAL as e:
        raise ValueError(
            f"corrupt {label}: {type(e).__name__}: {e}"
        ) from e


def check_dims(label: str, *dims: int) -> None:
    """Reject forged header dimensions before they size an allocation.

    Every dim must be positive and their product must stay under
    MAX_DECODE_ELEMS."""
    n = 1
    for d in dims:
        if d <= 0:
            raise ValueError(f"corrupt {label}: non-positive dimension {d}")
        n *= d
    if n > MAX_DECODE_ELEMS:
        raise ValueError(
            f"corrupt {label}: header claims {n} elements "
            f"(cap {MAX_DECODE_ELEMS})"
        )
