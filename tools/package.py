"""Build the spark-submit --py-files archive (dist/ticdc_spark.zip).

The reference ships a single `cdc` binary to every capture node; the Spark
analog is one zip of the engine package handed to spark-submit:

    python tools/package.py
    spark-submit --master <cluster> --py-files dist/ticdc_spark.zip \
        jobs/run_changefeed.py --binlog ... --table ... --checkpoint ...

The archive is deterministic (sorted entries, fixed timestamps) so repeated
builds of the same tree are byte-identical — a re-submit with an unchanged
zip is guaranteed to run the same code.
"""

from __future__ import annotations

import os
import sys
import zipfile

# Fixed DOS timestamp (2020-01-01) → reproducible archives.
_EPOCH = (2020, 1, 1, 0, 0, 0)


def build_pyfiles_zip(out_path: str, repo_root: str | None = None) -> str:
    """Zip ticdc_spark/**/*.py rooted at the package name, ready for
    --py-files (executors unzip it onto sys.path, so `import ticdc_spark`
    resolves on every python worker)."""
    if repo_root is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo_root, "ticdc_spark")
    if not os.path.isdir(pkg):
        raise FileNotFoundError(pkg)
    out_dir = os.path.dirname(os.path.abspath(out_path))
    os.makedirs(out_dir, exist_ok=True)
    entries: list[tuple[str, str]] = []
    for root, dirs, files in os.walk(pkg):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                entries.append((os.path.relpath(full, repo_root), full))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for rel, full in sorted(entries):
            info = zipfile.ZipInfo(rel.replace(os.sep, "/"), date_time=_EPOCH)
            info.external_attr = 0o644 << 16
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as fh:
                z.writestr(info, fh.read())
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "dist",
        "ticdc_spark.zip",
    )
    path = build_pyfiles_zip(out)
    n = len(zipfile.ZipFile(path).namelist())
    print(f"{path} ({n} modules, {os.path.getsize(path)} bytes)")
