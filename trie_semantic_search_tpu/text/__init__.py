"""Host-side text processing (feeds trie build + embedding tokenizer)."""

from .processor import (
    Citation,
    CitationType,
    EntityType,
    LegalTerm,
    LegalTermCategory,
    NamedEntity,
    ProcessedText,
    TextProcessor,
    TextStats,
    Token,
    TokenType,
    count_syllables,
)

__all__ = [
    "Citation",
    "CitationType",
    "EntityType",
    "LegalTerm",
    "LegalTermCategory",
    "NamedEntity",
    "ProcessedText",
    "TextProcessor",
    "TextStats",
    "Token",
    "TokenType",
    "count_syllables",
]
