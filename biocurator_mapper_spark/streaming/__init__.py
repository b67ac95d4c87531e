from .curation import streaming_curate, streaming_curation_counts
from .incremental import incremental_triples_query, stream_pages_from_directory
from .upsert import merge_upsert_stream

__all__ = [
    "incremental_triples_query",
    "stream_pages_from_directory",
    "merge_upsert_stream",
    "streaming_curate",
    "streaming_curation_counts",
]
