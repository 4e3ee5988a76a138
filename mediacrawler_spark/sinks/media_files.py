"""K4: media FILE sink — blobs to per-item files, distributed.

The reference stores fetched media as local files named
``data/<platform>/images/<notice_id>/<extension_file_name>``
(store/xhs/xhs_store_image.py:25-60 make_save_file_name; weibo twin
store/weibo/weibo_store_image.py). The engine analog writes each row of a
blob table (operators/media.py MEDIA_SCHEMA) from the EXECUTORS via
``mapInPandas`` — no driver collect, no blob ever crosses the driver —
and returns a manifest DataFrame (media_ref, path, n_bytes) the caller
materializes (the action is what triggers the writes) and records in the
snapshot alongside lineage.

At cluster scale ``root`` is shared storage (every executor can reach
it); in local mode it is a plain directory. Writes are idempotent: the
path is a pure function of (subdir, media_ref), so reruns overwrite the
same files. Two rows with the same ref in one batch last-write-win,
mirroring the reference's overwrite-on-refetch behavior.
"""

from __future__ import annotations

import hashlib
import os
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MANIFEST_SCHEMA = "media_ref string, path string, n_bytes bigint"

_SAFE = re.compile(r"[^A-Za-z0-9._-]+")


def _safe_name(s: str, max_len: int = 120) -> str:
    """Filesystem-safe name from a ref/URL; keeps the tail (where the
    reference's extension_file_name lives) when truncating. NOT injective
    — use only for grouping subdirs, never for file names."""
    cleaned = _SAFE.sub("_", s).strip("_")
    return cleaned[-max_len:] if len(cleaned) > max_len else cleaned or "blob"


def _file_name(s: str, max_len: int = 120) -> str:
    """Injective file name: sanitized tail + 8 hex of md5(raw ref).
    Sanitization alone can collide ('a/b' vs 'a_b'; 120-char shared
    tails), silently overwriting one blob with another while the manifest
    reports both as written (ADVICE r03 low) — the hash suffix makes the
    path a pure AND injective function of the ref."""
    tag = hashlib.md5(s.encode("utf-8")).hexdigest()[:8]
    return f"{_safe_name(s, max_len)}~{tag}"


def write_media_files(
    media: DataFrame, root: str, subdir_col: str | None = None
) -> DataFrame:
    """Write each blob row to ``<root>/<subdir>/<safe(ref)>~<md5[:8]>``.

    ``subdir_col`` names the grouping column (the reference groups by
    notice_id); default groups by ``media_type`` (images/, videos/, …).
    Returns the manifest DataFrame — unevaluated; the caller's action
    (stage to the snapshot, count, …) performs the distributed write.
    NULL ``data`` (fetch recorded, blob missing) writes an empty file so
    the manifest stays total over the input refs.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for r in pdf.to_dict("records"):
                sub = _safe_name(
                    str(r[subdir_col]) if subdir_col else f"{r['media_type']}s"
                )
                d = os.path.join(root, sub)
                os.makedirs(d, exist_ok=True)
                path = os.path.join(d, _file_name(r["media_ref"]))
                data = bytes(r["data"]) if r["data"] is not None else b""
                with open(path, "wb") as f:
                    f.write(data)
                rows.append(
                    {"media_ref": r["media_ref"], "path": path, "n_bytes": len(data)}
                )
            yield pd.DataFrame(rows, columns=["media_ref", "path", "n_bytes"])

    return media.mapInPandas(run, schema=MANIFEST_SCHEMA)
