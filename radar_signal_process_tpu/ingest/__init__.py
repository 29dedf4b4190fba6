"""Ingest: cross-file byte-stream splicing, PRT packet parsing, DBF feed.

Reference layer L0/L1 (SURVEY.md §1): the one component the reference itself
models on C++ (``read_continuous_file_stream.m:2``).  The native C++ library
(``native/ingest.cpp``) is the fast path; ``stream.py``/``packets.py`` are the
pure-Python reference implementations and fallback.
"""

from radar_signal_process_tpu.ingest.paths import g1_file_name, g2_file_name  # noqa: F401
from radar_signal_process_tpu.ingest.stream import FileStream  # noqa: F401
from radar_signal_process_tpu.ingest.packets import (  # noqa: F401
    G2FrameReader,
    G1FrameReader,
    FrameResult,
)
from radar_signal_process_tpu.ingest.native_loader import (  # noqa: F401
    native_available,
    NativeG2FrameReader,
)
