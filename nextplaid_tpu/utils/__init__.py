"""Shared utilities: errors, quantiles, normalization helpers."""

from nextplaid_tpu.utils.errors import (  # noqa: F401
    CodecError,
    DeleteError,
    EncodingError,
    FilteringError,
    NextPlaidError,
    SearchError,
    StorageError,
    TextSearchError,
    UpdateError,
)
