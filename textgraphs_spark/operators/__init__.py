"""Corpus-level DataFrame operators (the "reduce" side of the engine)."""
