"""Text scalar functions: the reference's string layer, as Catalyst columns.

Covers SURVEY.md section 2.6 plus the M1 masking chain
(``/root/reference/notebooks/word2vec_dbscan_approach.ipynb:86-103``):
``clear_strings`` masks line numbers -> ``at line LINE_NUMBER``, 12-128-char
alphanumeric runs -> ``UID``, UUIDv4 -> ``UUID``, then collapses whitespace
(``remove_whitespaces``, ``:78-84``).

Deliberate fix (FIXTURES.md C.2, SURVEY.md section 2.9.4): the reference
applies the generic hex-run rule BEFORE the UUID rule, so hyphenated UUIDs
degrade to ``UID-UID-...`` and the UUID rule is mostly dead. We pin the
corrected order (line-number, UUID, UID) and assert it in tests.

Every function here is a pure Column expression (regexp_replace / levenshtein
/ split chains) — JVM-side, codegen-visible, no Python in the executor hot
path. Each has a DuckDB SQL twin for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# regex constants (single escapes — these strings go to Java AND RE2/DuckDB)
LINE_NUMBER_RE = r"at line[:]*\s*\d+"
UUID_RE = (r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-"
           r"[0-9a-fA-F]{4}-[0-9a-fA-F]{12}")
UID_RE = r"[0-9a-zA-Z]{12,128}"
WS_RE = r"\s+"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def mask_error_text(col: Column | str) -> Column:
    """M1 ``clear_strings`` + ``remove_whitespaces`` as one column chain."""
    c = _c(col)
    c = F.regexp_replace(c, LINE_NUMBER_RE, "at line LINE_NUMBER")
    c = F.regexp_replace(c, UUID_RE, "UUID")
    c = F.regexp_replace(c, UID_RE, "UID")
    return F.trim(F.regexp_replace(c, WS_RE, " "))


def sql_mask_error_text(expr: str) -> str:
    """DuckDB twin of :func:`mask_error_text` (RE2 'g' flag = replace-all,
    matching Spark's regexp_replace default)."""
    e = f"regexp_replace({expr}, 'at line[:]*\\s*\\d+', 'at line LINE_NUMBER', 'g')"
    e = (f"regexp_replace({e}, '[0-9a-fA-F]{{8}}-[0-9a-fA-F]{{4}}-[0-9a-fA-F]{{4}}-"
         f"[0-9a-fA-F]{{4}}-[0-9a-fA-F]{{12}}', 'UUID', 'g')")
    e = f"regexp_replace({e}, '[0-9a-zA-Z]{{12,128}}', 'UID', 'g')"
    return f"trim(regexp_replace({e}, '\\s+', ' ', 'g'))"


def whitespace_tokens(col: Column | str) -> Column:
    """M2 tokenizer (``TF-IDF_K-Means_approach.ipynb:319``):
    ``x.lower().split()`` — lowercase, split on runs of whitespace, and drop
    the empty tokens ``split`` emits at the string edges."""
    toks = F.split(F.lower(_c(col)), WS_RE)
    return F.filter(toks, lambda t: F.length(t) > 0)


def sql_whitespace_tokens(expr: str) -> str:
    return (f"list_filter(string_split_regex(lower({expr}), '\\s+'), "
            f"t -> length(t) > 0)")


def fuzz_ratio(a: Column | str, b: Column | str) -> Column:
    """Normalized edit similarity in [0, 100], the engine's analog of
    ``fuzz.ratio`` (``word2vec_dbscan_approach.ipynb:30210``).

    fuzzywuzzy's ratio is SequenceMatcher-based (2M/(len1+len2)); an exact
    port would need a Python UDF in the per-row hot path. We instead define
    ``100 * (1 - levenshtein/greatest(len_a, len_b, 1))`` — monotone in the
    same sense, JVM-evaluable, and exactly reproducible in the SQL oracle
    (documented delta, SURVEY.md section 2.6).
    """
    ca, cb = _c(a), _c(b)
    denom = F.greatest(F.length(ca), F.length(cb), F.lit(1)).cast("double")
    return F.lit(100.0) * (F.lit(1.0) - F.levenshtein(ca, cb).cast("double") / denom)


def sql_fuzz_ratio(a: str, b: str) -> str:
    return (f"100.0 * (1.0 - CAST(levenshtein({a}, {b}) AS DOUBLE) / "
            f"CAST(greatest(length({a}), length({b}), 1) AS DOUBLE))")


def fuzz_ratio_exact(a: Column | str, b: Column | str) -> Column:
    """EXACT ``fuzz.ratio`` of the reference's fuzzywuzzy==0.17.0
    (``word2vec_dbscan_approach.ipynb:30210``, ``requirements.txt:9``):
    with no python-Levenshtein pinned, 0.17.0 falls back to stdlib
    ``difflib.SequenceMatcher`` (default autojunk) and returns
    ``int(round(100 * m.ratio()))``. Reimplemented against the same stdlib
    class — an Arrow-batched pandas UDF, so the Python cost is per-row
    SequenceMatcher only, with no per-row serialization overhead. Opt-in
    slow path for reference-parity output; the JVM-side levenshtein form
    (:func:`fuzz_ratio`) stays the oracle-checked default."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _seq_ratio(sa: "pd.Series", sb: "pd.Series") -> "pd.Series":
        from difflib import SequenceMatcher
        return pd.Series(
            [int(round(100 * SequenceMatcher(None, x or "", y or "").ratio()))
             for x, y in zip(sa, sb)], dtype="int64")

    # resolve the stringified hints by hand: `from __future__ import
    # annotations` + a function-local pandas import means pyspark's
    # get_type_hints can't see pd.*
    _seq_ratio.__annotations__ = {
        "sa": pd.Series, "sb": pd.Series, "return": pd.Series}
    _ratio = pandas_udf(_seq_ratio, "long")
    return _ratio(_c(a), _c(b))


# ---------------------------------------------------------------------------
# Shared cross-engine deterministic hashing.
#
# Spark's F.hash (murmur3) and DuckDB's hash() disagree, so oracle-checkable
# sketches (MinHash, SimHash, fingerprints) hash through md5 hex and parse a
# fixed-width slice back to an integer — identical in both engines.
# ---------------------------------------------------------------------------

def hash32(col: Column | str, salt: str = "") -> Column:
    """Deterministic 32-bit non-negative hash shared with the DuckDB oracle:
    first 8 hex chars of md5(salt || value), parsed base-16."""
    c = _c(col)
    salted = F.concat(F.lit(salt), c) if salt else c
    return F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long")


def sql_hash32(expr: str, salt: str = "") -> str:
    salted = f"'{salt}' || {expr}" if salt else expr
    return f"CAST(('0x' || substr(md5({salted}), 1, 8)) AS BIGINT)"


def hash32_hi(col: Column | str) -> Column:
    """Second independent 32-bit hash: hex chars 9-16 of the same md5."""
    return F.conv(F.substring(F.md5(_c(col)), 9, 8), 16, 10).cast("long")


def sql_hash32_hi(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 9, 8)) AS BIGINT)"
