"""PII redaction for training-data curation: detect and mask emails,
phone numbers, IP addresses, and card-shaped digit runs in document
text.

Design: map-only ``regexp_replace`` / ``regexp_count`` column
expressions — the whole scrub fuses into the scan stage (no shuffle, no
Python), which is the only shape that survives a 100 TB corpus: one
read, one write.  The patterns are the standard cheap first pass (the
presidio/scrubadub regex tier); anything model-based sits behind the
same column contract.

Pattern notes: kept to a regex subset with identical semantics in Spark
(Java regex) and DuckDB (RE2) so the conformance query is oracle-
checkable — no lookbehind, no possessive quantifiers.  Word boundaries
are approximated with whitespace/start-end anchors because RE2 supports
``\\b`` but Java's ``\\b`` is unicode-aware and diverges on digit-
adjacent CJK; the anchored forms behave identically in both.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

# ordered: longest/most-specific first so e.g. card runs are not half-
# eaten by the phone pattern after earlier substitutions
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — conservative: no quoted locals, no IP domains
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # 13-16 digit runs, optionally 4-grouped by space/dash (card-shaped)
    "card": r"[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{1,4}",
    # +1-212-555-0123 / (212) 555-0123 / 212.555.0123
    "phone": r"(?:\+?[0-9]{1,3}[ .-]?)?\(?[0-9]{3}\)?[ .-][0-9]{3}[ .-][0-9]{4}",
    # dotted-quad IPv4 (over-matches >255 octets on purpose: redaction
    # prefers recall, and both engines over-match identically)
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def pii_counts(text_col: Column | str) -> dict[str, Column]:
    """Per-kind match counts (pre-redaction) as named columns."""
    c = col(text_col) if isinstance(text_col, str) else text_col
    return {
        f"n_{kind}": F.regexp_count(c, lit(pat))
        for kind, pat in PII_PATTERNS.items()
    }


def redact(text_col: Column | str, token: str = "[PII:{kind}]") -> Column:
    """Replace every PII match with a typed placeholder token.  Patterns
    apply in declaration order on the running result, so earlier
    (more specific) kinds win overlaps."""
    c = col(text_col) if isinstance(text_col, str) else text_col
    out = c
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, token.format(kind=kind))
    return out


def scrub_documents(
    df: DataFrame, text_col: str = "text", keep_original: bool = False
) -> DataFrame:
    """Curation-gate form: attach per-kind counts, replace the text with
    its redacted version (original kept under ``{text_col}_raw`` when
    asked), and a ``has_pii`` flag for routing."""
    counts = pii_counts(text_col)
    out = df.withColumns(counts)
    if keep_original:
        out = out.withColumn(f"{text_col}_raw", col(text_col))
    any_pii = None
    for name in counts:
        c = col(name) > 0
        any_pii = c if any_pii is None else (any_pii | c)
    return out.withColumn(text_col, redact(text_col)).withColumn(
        "has_pii", any_pii
    )
