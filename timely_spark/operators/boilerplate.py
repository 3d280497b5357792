"""HTML boilerplate removal — main-content extraction, jusText-lite.

Turns raw HTML into main text by block segmentation + link-density
classification (the published jusText/readability heuristic family):

1. drop script/style/comment subtrees,
2. split on block-level tags (p, div, h1-6, li, table rows, br, ...),
3. per block: strip remaining inline tags, count words, and measure
   LINK DENSITY (characters inside <a> anchors / block characters),
4. keep blocks with >= ``min_words`` words and link density <=
   ``max_link_density`` (navigation bars, footers and tag clouds are
   short and link-dense; body prose is long and link-sparse),
5. join survivors into one text column.

Everything is a column expression (regexp_replace / split / transform /
filter) — zero shuffles, whole-stage-codegen'd, corpus-linear; and the
whole pipeline is mirrored in DuckDB SQL (``main_text_sql``) so the
driver oracle verifies extraction value-exactly. The link-density test
compares cross-multiplied INTEGER lengths (len_link * 10 <=
len_text * 3 for 0.3), so no float boundary can split the engines.

Regex dialect: restricted to the Java-regex/RE2 common subset (inline
(?i)/(?s) flags, non-greedy, NO backreferences) — the same contract as
the PII patterns (text.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_BLOCK_SPLIT = (
    r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|br|section|article"
    r"|header|footer|nav|blockquote)[^>]*>"
)
# word boundary after the tag name: bare `<a[^>]*>` also matched <abbr>,
# <address>, <area>, <audio>, counting their content as link text and
# inflating link density (ADVICE r5) — only a real anchor qualifies
_ANCHOR = r"(?is)<a(?:\s[^>]*)?>(.*?)</a>"
_SCRIPT = r"(?is)<script[^>]*>.*?</script>"
_STYLE = r"(?is)<style[^>]*>.*?</style>"
_COMMENT = r"(?s)<!--.*?-->"
_TAG = r"(?s)<[^>]*>"


def _strip_tags(c: Column) -> Column:
    return F.trim(
        F.regexp_replace(F.regexp_replace(c, _TAG, " "), r"\s+", " ")
    )


def _word_count(c: Column) -> Column:
    return F.size(F.filter(F.split(c, " "), lambda t: t != ""))


def main_text(
    html_col: str | Column,
    min_words: int = 10,
    max_link_density_pct: int = 30,
) -> Column:
    """Extracted main text as one column expression.

    ``max_link_density_pct`` is an integer percentage so the keep test
    stays in exact integer arithmetic on both engines.
    """
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    cleaned = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(c, _SCRIPT, " "), _STYLE, " "),
        _COMMENT,
        " ",
    )
    blocks = F.split(cleaned, _BLOCK_SPLIT)
    kept = F.filter(
        blocks,
        lambda b: (_word_count(_strip_tags(b)) >= min_words)
        & (
            F.length(
                _strip_tags(
                    F.array_join(
                        F.regexp_extract_all(b, F.lit(_ANCHOR), 1), " "
                    )
                )
            )
            * 100
            <= F.length(_strip_tags(b)) * max_link_density_pct
        ),
    )
    return F.trim(
        F.regexp_replace(
            F.array_join(F.transform(kept, _strip_tags), " "), r"\s+", " "
        )
    )


def main_text_sql(
    c: str, min_words: int = 10, max_link_density_pct: int = 30
) -> str:
    """DuckDB rendering of :func:`main_text` — same regexes (common
    dialect), same integer link-density test."""

    def strip(x: str) -> str:
        return (
            f"trim(regexp_replace(regexp_replace({x}, '{_TAG}', ' ', 'g'),"
            f" '\\s+', ' ', 'g'))"
        )

    cleaned = (
        f"regexp_replace(regexp_replace(regexp_replace({c},"
        f" '{_SCRIPT}', ' ', 'g'), '{_STYLE}', ' ', 'g'),"
        f" '{_COMMENT}', ' ', 'g')"
    )
    wc = (
        f"len(list_filter(string_split({strip('b')}, ' '), t -> t <> ''))"
    )
    # coalesce: DuckDB array_to_string([]) is NULL where Spark's
    # array_join([]) is '' — without it, anchor-free blocks all drop
    link_len = (
        "length("
        + strip(
            f"coalesce(array_to_string("
            f"regexp_extract_all(b, '{_ANCHOR}', 1), ' '), '')"
        )
        + ")"
    )
    kept = (
        f"list_filter(string_split_regex({cleaned}, '{_BLOCK_SPLIT}'),"
        f" b -> {wc} >= {min_words}"
        f" AND {link_len} * 100 <= length({strip('b')}) * {max_link_density_pct})"
    )
    joined = (
        f"coalesce(array_to_string("
        f"list_transform({kept}, b -> {strip('b')}), ' '), '')"
    )
    return f"trim(regexp_replace({joined}, '\\s+', ' ', 'g'))"
