"""Shared staging for file-based stream sources over read-only fixtures.

The file stream source requires a DIRECTORY and reads the WHOLE
directory, so every streamed table gets its own stage dir — tables can
never share one (a second table's file would be ingested as corrupt
rows of the first's schema). Fixtures are read-only, so the stage is a
symlink, re-pointed when it dangles or targets a different fixture.
In production this is the landing dir / Kafka topic.
"""

from __future__ import annotations

import os


def stage_stream_dir(sf_dir: str, table: str) -> str:
    """Stage ``<sf_dir>/<table>.parquet`` under a table-specific
    directory and return that directory's path.

    ``os.path.lexists`` (not ``exists``): a symlink whose target was
    removed — testdata regenerated under a new mount, an sf dir
    deleted while /tmp persists — fails ``exists`` but still blocks
    ``os.symlink`` with FileExistsError. A dangling or wrong-target
    link is re-pointed instead of crashing every build until the
    stage dir is hand-deleted.
    """
    src = os.path.join(sf_dir, f"{table}.parquet")
    stage = os.path.join(
        "/tmp",
        "spark_stream_stage",
        sf_dir.strip("/").replace("/", "_") + f"_{table}",
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, f"{table}.parquet")
    if os.path.lexists(link):
        if os.path.realpath(link) == os.path.realpath(src):
            return stage
        os.unlink(link)
    os.symlink(src, link)
    return stage
