"""Report which production-dependency seams' packages import TODAY.

Six operators carry realdeps seams — production branches that run only
when an optional package is present (`tests/test_realdeps.py` skips
otherwise). The sandbox gains packages silently between rounds (moto
appeared unannounced in round 9 and unblocked the S3 commit backend's
independent-implementation test), so "blocked" must be re-checked every
round rather than carried forward: this probe prints one JSON line
naming each seam's import status, and any seam that flips to available
should have its realdeps test run the same round.

Usage: ``python tools/realdeps_probe.py`` — prints one JSON line
``{"realdeps": {"available": [...], "missing": [...], "seams": {pkg:
where-it-unblocks}}}`` (``probe()`` returns the inner object). bench.py
emits the same line to stderr each run so the round artifacts carry it.
"""

from __future__ import annotations

import importlib.util
import json

# seam -> (package spec to find, where the seam lives)
SEAMS = {
    "sentence_transformers": "operators/enrich.py embedding encoder",
    "fasttext": "operators/textanalysis.py language-ID upgrade",
    "redis": "pipeline/cache_sink.py live cache sink",
    "tiktoken": "operators/textanalysis.py real tokenizer",
    "tokenizers": "operators/textanalysis.py tokenizer.json loader",
    "moto": "sources/s3_commit.py + streaming/banded_index.py S3 tests",
}


def probe() -> dict:
    available, missing = [], []
    for pkg in sorted(SEAMS):
        (available if importlib.util.find_spec(pkg) else missing).append(pkg)
    return {
        "available": available,
        "missing": missing,
        "seams": {k: SEAMS[k] for k in available},
    }


def main() -> None:
    print(json.dumps({"realdeps": probe()}))


if __name__ == "__main__":
    main()
