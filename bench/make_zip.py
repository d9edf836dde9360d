"""Package sparkgatha for spark-submit --py-files (north rule shipping
requirement): python bench/make_zip.py [out.zip]

Thin alias for ``python -m sparkgatha package`` — the deterministic
builder lives in sparkgatha/packaging.py (sorted entries, fixed
timestamps, byte-identical rebuilds) so cluster caches keyed on the
archive hash never churn.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sparkgatha.packaging import build_pyfiles_zip  # noqa: E402


def make_zip(out: str) -> str:
    build_pyfiles_zip(out)
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "sparkgatha.zip")
    print(make_zip(out))
