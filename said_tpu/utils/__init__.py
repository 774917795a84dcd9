"""Host-side utilities: I/O, parsers, schedules, torch checkpoint import."""
