"""Build the spark-submit --py-files artifact for the engine.

The north rule requires the pipeline to "run via spark-submit --py-files
on a multi-executor cluster". This tool produces that artifact: a single
zip of the ``clinicaltransformerrelationextraction_spark`` package that
executors' Python workers can import directly off ``sys.path`` (zip
imports — no install step on the cluster).

The build is deterministic: a fixed entry order (sorted), a fixed
timestamp, no compression (ZIP_STORED), and only ``*.py`` sources — so
the artifact's bytes are a pure function of the package sources and two
builds from the same tree are byte-identical (pinned by
tests/test_pyfiles_submit.py). That makes the zip safe to content-address
in a deploy pipeline (e.g. ``ctre-<sha256>.zip`` in an artifact store).

Usage:

    python -m tools.make_pyfiles [OUT_ZIP]        # default dist/ctre.zip
    spark-submit --master ... --py-files dist/ctre.zip driver.py

Programmatic (bench.py's scaling harness ships the package this way —
``SparkContext.addPyFile`` is the runtime equivalent of --py-files):

    from tools.make_pyfiles import build_pyfiles_zip
    spark.sparkContext.addPyFile(str(build_pyfiles_zip()))
"""

from __future__ import annotations

import os
import sys
import zipfile
from pathlib import Path

PACKAGE = "clinicaltransformerrelationextraction_spark"
REPO_ROOT = Path(__file__).resolve().parent.parent
# Fixed DOS timestamp for reproducible zip entries (1980-01-01 is the
# zip format's epoch; zipfile rejects anything earlier).
_EPOCH = (1980, 1, 1, 0, 0, 0)


def package_sources(repo_root: Path = REPO_ROOT) -> list[Path]:
    """All .py files of the package, sorted by archive name."""
    pkg = repo_root / PACKAGE
    if not pkg.is_dir():
        raise FileNotFoundError(f"package dir not found: {pkg}")
    return sorted(
        p for p in pkg.rglob("*.py") if "__pycache__" not in p.parts
    )


def build_pyfiles_zip(
    out: Path | None = None, repo_root: Path = REPO_ROOT
) -> Path:
    """Write the --py-files zip and return its path.

    Entries are rooted at the package name (``<pkg>/operators/...``), so
    adding the zip to ``sys.path`` (which --py-files / addPyFile do on
    every executor Python worker and on the driver) makes
    ``import clinicaltransformerrelationextraction_spark`` resolve.
    """
    out = out or repo_root / "dist" / "ctre.zip"
    out.parent.mkdir(parents=True, exist_ok=True)
    # pid-suffixed scratch name: concurrent builders (a bench level and a
    # manual `python -m tools.make_pyfiles`) each write their own file and
    # race only on the atomic replace — last byte-identical zip wins
    tmp = out.with_name(f"{out.name}.{os.getpid()}.tmp")
    try:
        with zipfile.ZipFile(tmp, "w", compression=zipfile.ZIP_STORED) as zf:
            for src in package_sources(repo_root):
                arcname = src.relative_to(repo_root).as_posix()
                info = zipfile.ZipInfo(arcname, date_time=_EPOCH)
                # rw-r--r-- regular file; keeps the entry metadata constant
                # across checkouts with different umasks
                info.external_attr = 0o644 << 16
                zf.writestr(info, src.read_bytes())
        tmp.replace(out)  # atomic publish: never a half-written artifact
    except BaseException:
        tmp.unlink(missing_ok=True)  # no pid-named orphans in dist/
        raise
    return out


def main(argv: list[str]) -> int:
    out = build_pyfiles_zip(Path(argv[1]) if len(argv) > 1 else None)
    n = len(package_sources())
    print(f"{out} ({n} sources, {out.stat().st_size} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
