from .neardup import (
    banded_minhash_index,
    near_dups_against,
    read_corpus_index,
    run_incremental_neardup,
    stream_near_dups,
)
from .windows import (
    sessionize,
    sessionize_batch,
    windowed_event_counts,
    windowed_event_counts_batch,
)
