"""Source-dataset fingerprinting for persisted derived stores.

Every persisted build artifact in this engine (IVF index, PQ code store,
shingle-signature store, graph edge store) is keyed by a fingerprint of its
SOURCE parquet so a regenerated dataset at the same path keys a *fresh*
build rather than silently serving stale derived data.

Two hardening rules (advisor round-3 finding):

1. The fingerprint covers the actual parquet **file listing** — for a
   directory-style parquet dataset, every ``*.parquet`` data file's
   (relative name, size, mtime) participates, so rewriting one part file
   changes the key even when the directory's own stat does not.
2. A source that cannot be statted raises ``FileNotFoundError`` instead of
   quietly producing an unstamped (shared!) key. Callers that genuinely
   tolerate a missing source must opt in via ``missing_ok=True``, which
   returns the distinguished stamp ``"missingsrc"`` — still never aliased
   with a real dataset's stamp.
"""

from __future__ import annotations

import hashlib
import os


def _listing(path: str) -> list[str]:
    st = os.stat(path)  # raises FileNotFoundError / OSError loudly
    if not os.path.isdir(path):
        return [f"{os.path.basename(path)}:{st.st_size}:{int(st.st_mtime)}"]
    parts: list[str] = []
    for root, _dirs, files in os.walk(path):
        rel_root = os.path.relpath(root, path)
        for f in files:
            if f.startswith((".", "_")) and not f.endswith(".parquet"):
                continue  # _SUCCESS / .crc markers don't define the data
            fst = os.stat(os.path.join(root, f))
            rel = f if rel_root == "." else f"{rel_root}/{f}"
            parts.append(f"{rel}:{fst.st_size}:{int(fst.st_mtime)}")
    parts.sort()
    return parts


def source_fingerprint(*paths: str, missing_ok: bool = False) -> str:
    """10-hex-digit sha1 over the sorted (name, size, mtime) listing of one
    or more source parquet files/directories. Raises on an unstattable
    source unless ``missing_ok`` (then stamps ``missingsrc``)."""
    entries: list[str] = []
    for p in paths:
        try:
            entries.extend(_listing(p))
        except OSError:
            if not missing_ok:
                raise
            entries.append(f"{os.path.basename(p)}:missing")
    if not entries or all(e.endswith(":missing") for e in entries):
        return "missingsrc"
    return hashlib.sha1(";".join(entries).encode()).hexdigest()[:10]
