"""Source readers: format dispatch for the interleaved documents table."""

from .documents import is_lance_source, read_documents

__all__ = ["is_lance_source", "read_documents"]
