from .text import (  # noqa: F401
    token_count, ws_token_count, quality_score, lang_scores, lang_id,
    doc_fingerprint, char_set,
)
