"""Graph ingest: Matrix Market I/O, binary cache, RMAT generation."""

from . import mmio
from . import cache
from . import rmat
