from .text import (  # noqa: F401
    language_id,
    quality_features,
    rolling_fingerprint,
    token_count,
    word_count,
)
