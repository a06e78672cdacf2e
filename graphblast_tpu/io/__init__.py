"""Graph ingest: Matrix Market I/O, binary cache, RMAT generation."""

from . import mmio
