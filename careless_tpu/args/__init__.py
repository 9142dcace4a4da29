"""Declarative flag groups (reference careless/args/__init__.py:19-30)."""
from . import (common, crossvalidation, device_options, filtration,
               interpretation, likelihood, optimizer, poly,
               positional_encoding, prior, required, scaling)

groups = [
    common,
    crossvalidation,
    filtration,
    interpretation,
    likelihood,
    optimizer,
    positional_encoding,
    prior,
    scaling,
    device_options,
]
