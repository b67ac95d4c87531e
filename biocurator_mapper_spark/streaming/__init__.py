from .incremental import incremental_triples_query, stream_pages_from_directory

__all__ = ["incremental_triples_query", "stream_pages_from_directory"]
