"""Exact-parity emoji purity check (F2 slow path).

The default engine path is the curated-regex native expression in
functions/classify.py. When the `emoji` library (the one the reference
uses, chat_parser.py:2) is available, this module provides a pandas UDF
with its exact codepoint database — Arrow-batched, not row-at-a-time.
Flag-switched per SURVEY §2.11: both paths ship, regex is the default.
"""

from __future__ import annotations

import re

from pyspark.sql import Column

try:  # the container may not ship the emoji lib — gate, don't crash
    import emoji as _emoji_lib
except ImportError:  # pragma: no cover
    _emoji_lib = None

HAS_EMOJI_LIB = _emoji_lib is not None

_SHORTCODE_RE = re.compile(r":[^:\s]+:")
_FILLER_RE = re.compile(r"[\s‍︎️]")


def _is_pure_emoji_py(msg: str | None) -> bool:
    """Reference-exact reimplementation of chat_parser.py:43-57."""
    if not msg:
        return False
    without_shortcodes = _SHORTCODE_RE.sub("", msg)
    without_emoji = _emoji_lib.replace_emoji(without_shortcodes, replace="")
    if _FILLER_RE.sub("", without_emoji):
        return False
    return without_shortcodes != msg or without_emoji != without_shortcodes


def is_pure_emoji_exact(msg: Column) -> Column:
    """Arrow-batched pandas UDF over the emoji lib's codepoint table."""
    if not HAS_EMOJI_LIB:
        raise ImportError(
            "emoji library not installed; use the default regex path "
            "(functions.classify.is_pure_emoji)"
        )
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _udf(s: pd.Series) -> pd.Series:
        return s.map(_is_pure_emoji_py).astype(bool)

    return _udf(msg)
