"""Placeholder; full pipeline lands with the model."""
def transcribe(*a, **k):
    raise NotImplementedError
