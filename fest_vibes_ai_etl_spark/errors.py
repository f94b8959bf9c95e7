"""Error-classification helpers shared by the load-or-first-batch seams.

Several streaming operators use "the stored table does not exist yet" as
the legitimate first-batch signal. That is exactly ONE error condition —
``PATH_NOT_FOUND``. Catching any broader class (all AnalysisException,
say) converts real damage into silent data corruption: an existing-but-
unreadable corpus (files deleted out from under the directory raises
``UNABLE_TO_INFER_SCHEMA``, for instance) would be treated as "first
batch" and every history check skipped.
"""

from __future__ import annotations


def is_path_not_found(exc: BaseException) -> bool:
    """True iff the exception is Spark's PATH_NOT_FOUND error condition."""
    cond = None
    for name in ("getCondition", "getErrorClass"):
        fn = getattr(exc, name, None)
        if fn is None:
            continue
        try:
            cond = fn()
        except Exception:
            cond = None
        if cond:
            break
    if cond is not None:
        return cond == "PATH_NOT_FOUND"
    # very old Spark: fall back to the message text
    return "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc)
