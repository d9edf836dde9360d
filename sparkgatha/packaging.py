"""Ship the engine as a ``--py-files`` archive (north rule: "run via
spark-submit --py-files on a multi-executor cluster").

``build_pyfiles_zip`` produces the one artifact a cluster deploy needs:
a zip whose root contains the ``sparkgatha/`` package, importable by
both the driver and every executor when passed as

    spark-submit --py-files sparkgatha.zip driver.py ...

Nothing engine-side assumes a writable install — the package is pure
``.py`` (no compiled extensions, no data files), which is exactly what
makes the py-files deployment model work.  Reference analog: AGATHA
ships a conda env + ``python -m agatha.construct`` (SURVEY.md §3.1);
the Spark-native equivalent is this archive + ``python -m sparkgatha``
subcommands.

Determinism: entries are written in sorted path order with a fixed
timestamp, so the same tree always produces a byte-identical archive
(rebuilds don't churn cluster caches keyed on file hash).
"""

from __future__ import annotations

import os
import zipfile

#: fixed zip entry timestamp (2020-01-01 00:00:00) — zipfile's epoch
#: floor is 1980, and "any constant" is the point
_ZIP_TS = (2020, 1, 1, 0, 0, 0)


def build_pyfiles_zip(out_path: str, package_dir: str | None = None) -> int:
    """Write a spark-submit ``--py-files`` zip of the sparkgatha package.

    Returns the number of files archived.  ``package_dir`` defaults to
    the installed package's own directory (so ``python -m sparkgatha
    package`` ships whatever code is actually running).
    """
    if package_dir is None:
        package_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(package_dir.rstrip(os.sep))
    entries: list[tuple[str, str]] = []
    for root, dirs, files in os.walk(package_dir):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            full = os.path.join(root, f)
            rel = os.path.join(pkg_name, os.path.relpath(full, package_dir))
            entries.append((full, rel))
    if not entries:
        raise FileNotFoundError(f"no .py files under {package_dir}")
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, rel in entries:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(rel.replace(os.sep, "/"), date_time=_ZIP_TS)
            info.external_attr = 0o644 << 16
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)
    return len(entries)
