"""Host utilities: CLI parsing, timers, verification helpers."""

from . import cli
from .verify import verify_list, verify_list_float
