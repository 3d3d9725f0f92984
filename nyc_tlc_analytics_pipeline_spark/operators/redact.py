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


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    k_threshold: int = 5,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination — the
    privacy companion to the PII regex scrub above: redaction removes
    DIRECT identifiers, but a row can still be re-identified when its
    quasi-identifier combination (source × language × length bucket …)
    is rare.  A row's k is the size of its equivalence class; the
    release risk lives in the classes with k < threshold.

    One hash aggregate on the quasi-identifier key (group count =
    |distinct combinations| ≪ rows for any sane quasi set), then a
    bounded second aggregate over the class-size frame.  Returns one
    row per distinct class size k: ``n_classes``, ``n_rows``,
    ``below_threshold`` — the k-distribution a privacy review reads
    directly (min k = first row; share at risk = Σ n_rows where
    below_threshold)."""
    classes = df.groupBy(*quasi_cols).agg(F.count("*").alias("__k"))
    return (
        classes.groupBy(col("__k").alias("k"))
        .agg(F.count("*").cast("long").alias("n_classes"))
        .select(
            col("k").cast("long").alias("k"),
            "n_classes",
            (col("k") * col("n_classes")).cast("long").alias("n_rows"),
            (col("k") < lit(k_threshold)).alias("below_threshold"),
        )
        .orderBy("k")
    )
