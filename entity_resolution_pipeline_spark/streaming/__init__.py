from .windows import (
    sessionize,
    sessionize_batch,
    windowed_event_counts,
    windowed_event_counts_batch,
)
