"""EBSCO adapter trigger — picking the newest full-snapshot drop and
deciding whether to fetch it.

Reference: ``adapters/steps/ebsco/trigger.py:45-130`` — valid drops are
named ``ebz-s7451719-YYYYMMDD-<seq>.xml`` (the fixed public subscription
prefix); the newest by parsed date wins (a malformed date in an otherwise
valid name is an error, not a skip — strptime raises); if that exact file
already sits in the landing prefix it is reused without a download, and
the file forwarded downstream is the newest valid object present AFTER
the sync — which may be newer than the FTP side if one was pre-seeded.
The loader itself (``steps/ebsco/loader.py:66-80``) is the engine's
existing snapshot path: MARCXML load (S5) + ``snapshot_sync`` (J4).

Pure-Python decision helpers (the trigger is one Lambda-sized decision),
plus a column-side validity/date extractor for sweeping a whole listing
frame.
"""

from __future__ import annotations

import re
from datetime import datetime

from pyspark.sql import Column
from pyspark.sql import functions as F

FILENAME_RE = r"^ebz-s7451719-(\d{8})-.*\.xml$"


def get_most_recent_valid_file(filenames: list[str]) -> str | None:
    """trigger.py:45-57: filter to valid names, parse dates, newest wins;
    None when nothing valid; a well-formed name with an impossible date
    raises (strptime), exactly like the reference."""
    valid = [
        (name, datetime.strptime(m.group(1), "%Y%m%d"))
        for name in filenames
        if (m := re.match(FILENAME_RE, name))
    ]
    return max(valid, key=lambda x: x[1])[0] if valid else None


def plan_sync(
    ftp_files: list[str], existing_s3_files: list[str]
) -> dict[str, str | None]:
    """trigger.py:60-130 as a pure decision: which file to fetch (or
    reuse) and which to forward.  Returns ``{action, fetch, forward}`` —
    ``action`` ∈ ``reuse`` (the newest FTP file already landed) /
    ``download`` / ``error`` (no valid FTP files).  ``forward`` is the
    newest valid file present after the sync, which may be a pre-seeded
    object newer than the FTP side."""
    newest_ftp = get_most_recent_valid_file(ftp_files)
    if newest_ftp is None:
        return {"action": "error", "fetch": None, "forward": None}
    names = {k.split("/")[-1] for k in existing_s3_files}
    if newest_ftp in names:
        return {
            "action": "reuse",
            "fetch": None,
            "forward": get_most_recent_valid_file(sorted(names)),
        }
    after = sorted(names | {newest_ftp})
    return {
        "action": "download",
        "fetch": newest_ftp,
        "forward": get_most_recent_valid_file(after),
    }


def snapshot_file_date(name: Column) -> Column:
    """Column-side validity + drop date for a listing frame: the parsed
    date of a valid ``ebz-...`` name, NULL otherwise."""
    raw = F.regexp_extract(name, FILENAME_RE, 1)
    return F.when(raw != "", F.to_date(raw, "yyyyMMdd"))
