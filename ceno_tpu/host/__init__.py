"""Host-side guest IO: hints serialization (CenoStdin mirror)."""

from .stdin import CenoStdin, from_words, to_item_words  # noqa: F401
