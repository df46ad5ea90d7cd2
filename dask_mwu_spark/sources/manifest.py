"""Commit-manifest protocol: atomic publish for plain-parquet tables.

Write-then-rename of a whole DIRECTORY is not atomic on an object store
(S3 "rename" is a copy+delete per object), so the upsert sink's and
compaction's directory swap has a crash window in which a reader sees a
half-swapped table.  Table formats (Delta/Iceberg/Hudi) close that window
with a transaction log; this module is the minimal self-contained version
of the same idea (VERDICT r4 item 5):

    table/
      _manifests/v{N:020d}.json   -- one tiny JSON per committed version
      _data/{name}/               -- immutable data directories

Commit protocol:
1. write the new version's parquet into a FRESH ``_data/<name>`` dir
   (never mutate a published dir);
2. publish by writing the manifest JSON to a temp name (fsynced) and
   ``os.link``-ing it to ``_manifests/v{N}.json`` — a single-FILE atomic
   primitive that FAILS if the version already exists (loud
   concurrent-writer collision); on an object store this maps to a
   conditional PUT (If-None-Match), atomic per object;
3. readers resolve ``max(v*.json)`` and read ONLY the data dir it names —
   directory listing of ``_data`` is never trusted;
4. a crash anywhere before step 2 leaves an orphan data dir that no
   reader ever sees; ``vacuum`` removes orphans and superseded versions
   (keeping ``keep`` manifests so in-flight readers of the previous
   version finish their scans).

Concurrency note: with a single writer (a streaming sink's foreachBatch,
a maintenance job) this is exactly-once; multiple concurrent writers
would race on the version number and need a compare-and-swap, which
``publish_version`` implements via ``os.link`` of an fsynced temp file
onto ``v{N}.json`` — link(2) is atomic and raises ``FileExistsError``
(EEXIST) when the version already exists, so a collision is loud instead
of a silent overwrite.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

MANIFEST_DIR = "_manifests"
DATA_DIR = "_data"


def _manifest_dir(path: str) -> str:
    return os.path.join(path, MANIFEST_DIR)


def is_versioned(path: str) -> bool:
    """True if ``path`` is a manifest-committed table (has at least the
    manifest directory)."""
    return os.path.isdir(_manifest_dir(path))


def _versions(path: str) -> list[int]:
    mdir = _manifest_dir(path)
    if not os.path.isdir(mdir):
        return []
    out = []
    for f in os.listdir(mdir):
        if f.startswith("v") and f.endswith(".json"):
            try:
                out.append(int(f[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def latest_version(path: str) -> int | None:
    """Highest committed version number, or None for an uncommitted/legacy
    table."""
    vs = _versions(path)
    return vs[-1] if vs else None


def read_manifest(path: str, version: int) -> dict:
    """Load one committed version's manifest JSON."""
    with open(
        os.path.join(_manifest_dir(path), f"v{version:020d}.json")
    ) as fh:
        return json.load(fh)


def committed_data_path(path: str) -> str | None:
    """Absolute path of the last COMMITTED version's data directory, or
    None if no version was ever published.  This — not a directory
    listing — is what readers must trust."""
    v = latest_version(path)
    if v is None:
        return None
    m = read_manifest(path, v)
    return os.path.join(path, DATA_DIR, m["data"])


def new_data_dir(path: str, *, tag: str = "") -> str:
    """Fresh, never-published data directory for a writer to fill."""
    name = f"{tag + '-' if tag else ''}{uuid.uuid4().hex[:12]}"
    d = os.path.join(path, DATA_DIR, name)
    os.makedirs(d, exist_ok=False)
    return d


def publish_version(path: str, data_dir: str, *, meta: dict | None = None) -> int:
    """Atomically commit ``data_dir`` (a child of ``<path>/_data``) as the
    table's next version.  Single-file ``os.link`` — the one atomic
    primitive the protocol relies on.  Returns the published version."""
    mdir = _manifest_dir(path)
    os.makedirs(mdir, exist_ok=True)
    prev = latest_version(path)
    version = 0 if prev is None else prev + 1
    manifest = {
        "version": version,
        "data": os.path.basename(data_dir),
        **(meta or {}),
    }
    tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex[:12]}.json")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
        fh.flush()
        os.fsync(fh.fileno())
    final = os.path.join(mdir, f"v{version:020d}.json")
    # os.link is atomic AND fails if the target exists: a concurrent
    # writer that already took this version fails loudly instead of
    # silently overwriting, and no reader can ever observe a partial or
    # empty manifest file
    os.link(tmp, final)
    os.unlink(tmp)
    return version


def vacuum(path: str, *, keep: int = 2) -> list[str]:
    """Remove superseded manifests beyond the last ``keep`` and every
    ``_data`` dir no kept manifest references (orphans from crashed
    writers included).  Returns removed data-dir names.  Never touches
    the latest version."""
    vs = _versions(path)
    kept, dropped = vs[-keep:] if keep > 0 else [], vs[:-keep] if keep > 0 else vs
    referenced = {read_manifest(path, v)["data"] for v in kept}
    removed = []
    ddir = os.path.join(path, DATA_DIR)
    if os.path.isdir(ddir):
        for name in os.listdir(ddir):
            if name not in referenced:
                shutil.rmtree(os.path.join(ddir, name))
                removed.append(name)
    mdir = _manifest_dir(path)
    for v in dropped:
        os.unlink(os.path.join(mdir, f"v{v:020d}.json"))
    for f in os.listdir(mdir):
        if f.startswith(".tmp-"):
            os.unlink(os.path.join(mdir, f))
    return removed
