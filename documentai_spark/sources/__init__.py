"""Sources: synthetic transcripts generator + table readers."""
