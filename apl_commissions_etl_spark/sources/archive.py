"""ZIP archive ingestion (SURVEY.md §2.1 S5).

The reference finds the newest ZIP in a drop directory, extracts CSVs
matched by filename prefix, and bulk-loads them (ref
scripts/ingest-raw-data.ts:1-23). Archive handling is inherently
driver-side (ZIP is not splittable); the DISTRIBUTED part — reading
the extracted CSVs — goes through ``csv_ingest.read_raw_csv``. At
scale the drop directory holds many ZIPs: extract on the driver (or a
preprocessing job) into object storage once, then every executor reads
the splittable extracted files.
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import DataFrame, SparkSession

from .csv_ingest import read_raw_csv


def find_newest_zip(drop_dir: str) -> str | None:
    """Most recently modified .zip in the drop directory (ref
    ingest-raw-data.ts newest-ZIP discovery)."""
    zips = [
        os.path.join(drop_dir, f)
        for f in os.listdir(drop_dir)
        if f.lower().endswith(".zip")
    ]
    if not zips:
        return None
    return max(zips, key=os.path.getmtime)


def extract_csvs(
    zip_path: str, dest_dir: str, prefix: str | None = None
) -> list[str]:
    """Extract member CSVs (optionally prefix-filtered, like the
    reference's 'CommissionsDetail_' matching) flat into ``dest_dir``;
    returns extracted paths. Member paths are sanitized (no traversal)."""
    out: list[str] = []
    os.makedirs(dest_dir, exist_ok=True)
    with zipfile.ZipFile(zip_path) as zf:
        for member in zf.namelist():
            base = os.path.basename(member)
            if not base.lower().endswith(".csv"):
                continue
            if prefix is not None and not base.startswith(prefix):
                continue
            target = os.path.join(dest_dir, base)
            with zf.open(member) as src, open(target, "wb") as dst:
                dst.write(src.read())
            out.append(target)
    return sorted(out)


def read_zip_csvs(
    spark: SparkSession,
    zip_path: str,
    work_dir: str,
    prefix: str | None = None,
) -> DataFrame:
    """Extract + read as one all-string bronze DataFrame (S5 -> S1/S7)."""
    paths = extract_csvs(zip_path, work_dir, prefix)
    if not paths:
        raise FileNotFoundError(
            f"no CSV members{' with prefix ' + prefix if prefix else ''} "
            f"in {zip_path}"
        )
    return read_raw_csv(spark, paths if len(paths) > 1 else paths[0])
