"""Structured Streaming surface (SURVEY §2.11 — absent in the reference,
mandated as a first-class extension).

Ports of the batch operators to streams: tumbling/sliding/session
windows with watermarks, streaming dedup, and a custom stateful
operator via applyInPandasWithState.
"""

from .ops import (  # noqa: F401
    events_stream,
    tumbling_counts,
    sliding_value_sums,
    session_windows,
    streaming_dedup,
    running_user_totals,
)
