"""Source-freshness manifests for persisted derived artifacts.

A derived artifact served published-first (the ANN index of
``operators/similarity.py`` and the MinHash band table of
``operators/dedup.py``) must not outlive its source table: if the table
is rewritten or grows without a matching ``upsert_*`` or snapshot
rebuild, probes and incremental dedup would silently return stale
results — missed true neighbors/matches — where the fingerprint-keyed
tmp-cache path would have rebuilt (ADVICE r8). Every artifact build and
upsert therefore records a digest of the source table's part-file
listing in ``_manifest.json`` inside the artifact directory, and
``ensure_*`` resolution prefers the published copy only while the
recorded digest still matches the live source; on mismatch (or a
missing/unreadable manifest) it falls through to the fingerprint-keyed
cache, which rebuilds on any source change by construction.

The digest is listing-only — relative path + size + mtime_ns of every
``.parquet`` part file, no data read — the same cost class as the
directory listing a scan performs anyway. ``shutil.move``/``copy2``
preserve mtimes, so a digest recorded at build time survives
``publish_snapshot``'s move of the whole build directory into
``history/`` (relative paths inside the table directory are unchanged
by the move). The reference's analog is the manifest row-count/version
stamp its uploader writes next to each published DB file
(``/root/reference/etl-service/src/s3_uploader.py:63-94``).
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

#: file name inside the artifact directory. The leading underscore keeps
#: it invisible to Spark's parquet reader (metadata-file convention).
MANIFEST_NAME = "_manifest.json"


def source_fingerprint(path: str) -> str:
    """Cheap change-detection string for a source table: parquet file
    names + sizes + mtimes (no data read). Recurses with ``os.walk`` so
    the dir-of-subdirectories layouts ``table_path`` supports
    (partitioned tables, ``df.write.parquet`` dirs) fingerprint their
    actual part files instead of degenerating to a constant — a changed
    partitioned corpus must invalidate cached/published artifacts
    (ADVICE r7/r8)."""
    if os.path.isdir(path):
        entries = []
        for root, dirs, files in os.walk(path):
            dirs.sort()
            for n in sorted(files):
                if not n.endswith(".parquet"):
                    continue
                st = os.stat(os.path.join(root, n))
                rel = os.path.relpath(os.path.join(root, n), path)
                entries.append((rel, st.st_size, st.st_mtime_ns))
        return repr(entries)
    st = os.stat(path)
    return f"{st.st_size}:{st.st_mtime_ns}"


def source_digest(path: str) -> str:
    return hashlib.sha256(source_fingerprint(path).encode()).hexdigest()[:16]


def write_manifest(
    artifact_dir: str,
    source_path: str,
    artifact_version: int,
    extra: dict | None = None,
) -> None:
    """Record the artifact's version and its source table's digest —
    called after every successful build/upsert, so the manifest always
    describes the source state the artifact reflects. Atomic replace:
    a concurrent reader sees either the old or the new manifest, never
    a torn file. ``extra`` carries artifact-specific exact scalars
    (e.g. the postings index's corpus totals) that must travel with the
    artifact and merge per upsert."""
    doc = {
        "artifact_version": artifact_version,
        "source_digest": source_digest(source_path),
        **(extra or {}),
    }
    # leading underscore: Spark's directory listing ignores metadata
    # files, so a reader scanning the artifact DURING the replace window
    # never sees a non-parquet stray (r8 review finding)
    fd, tmp = tempfile.mkstemp(
        dir=artifact_dir, prefix="_manifest-", suffix=".tmp"
    )
    try:
        with os.fdopen(fd, "w") as fh:
            json.dump(doc, fh)
        os.replace(tmp, os.path.join(artifact_dir, MANIFEST_NAME))
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def manifest_fresh(
    artifact_dir: str, source_path: str, artifact_version: int
) -> bool:
    """True when the artifact's recorded source digest matches the live
    source table. Missing or unreadable manifests are STALE — an
    artifact that can't prove freshness must not be served over a
    rebuild (fail-safe, not fail-open)."""
    try:
        with open(os.path.join(artifact_dir, MANIFEST_NAME)) as fh:
            doc = json.load(fh)
    except (OSError, json.JSONDecodeError):
        return False
    return (
        doc.get("artifact_version") == artifact_version
        and doc.get("source_digest") == source_digest(source_path)
    )


def read_manifest(artifact_dir: str) -> dict:
    """The artifact's manifest, ``{}`` when missing/unreadable."""
    try:
        with open(os.path.join(artifact_dir, MANIFEST_NAME)) as fh:
            return json.load(fh)
    except (OSError, json.JSONDecodeError):
        return {}


def resolve_artifact(
    published: str,
    source_path: str,
    version: int,
    family: str,
    key_extra: str,
    usable,
    build_fn,
) -> str:
    """Published-first artifact resolution with a fingerprint-keyed
    per-user tmp-cache fallback — the ONE protocol every derived
    artifact shares (ANN index, MinHash bands, text postings, trained
    quantizer; r10 review deduplicated four copies into this helper):

    1. Serve ``published`` when ``usable(published)`` (the caller's
       structural/geometry gate) AND the manifest digest still matches
       the live source at ``version`` — a stale or incomplete published
       copy is never served.
    2. Else resolve a per-user cache dir under
       ``$TMPDIR/ser_etl_<family>_<uid>`` (mode 0700, with ownership
       and mode VERIFIED after makedirs — a world-shared fixed path
       could be pre-created/poisoned by another local user, and
       makedirs alone would silently accept it; r10 ADVICE),
       keyed by sha256 of ``v<version>:<realpath>:<fingerprint><extra>``
       so any source change re-keys and rebuilds. A concurrent builder
       losing the ``os.replace`` rename race simply discards its copy.

    ``build_fn(tmp_dir)`` materializes the artifact into ``tmp_dir``;
    ``key_extra`` folds the geometry parameters into the cache key
    (format ``":p1:p2"``, or ``""``)."""
    import shutil

    if usable(published) and manifest_fresh(published, source_path, version):
        return published
    key_src = (
        f"v{version}:{os.path.realpath(source_path)}:"
        f"{source_fingerprint(source_path)}{key_extra}"
    )
    key = hashlib.sha256(key_src.encode()).hexdigest()[:16]
    uid = getattr(os, "getuid", lambda: None)()
    root = os.path.join(
        tempfile.gettempdir(), f"ser_etl_{family}_{uid if uid is not None else 'na'}"
    )
    os.makedirs(root, mode=0o700, exist_ok=True)
    # makedirs does NOT re-apply the mode to a pre-existing directory,
    # and a cached artifact is served on _SUCCESS alone — so verify the
    # root is actually ours and private BEFORE trusting anything under
    # it (r10 ADVICE: a local attacker who pre-creates the fixed path
    # world-writable could plant a poisoned keyed artifact). A root we
    # own with loose bits is re-tightened; a root owned by someone else
    # can't be fixed — fall back to a fresh private directory (cache
    # miss every call in that pathological case, never poisoned data).
    import stat as _stat

    st = os.stat(root)
    if uid is not None and st.st_uid != uid:
        root = tempfile.mkdtemp(prefix=f"ser_etl_{family}_")
    elif _stat.S_IMODE(st.st_mode) & 0o077:
        os.chmod(root, 0o700)
    out = os.path.join(root, key)
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    tmp = f"{out}.build-{os.getpid()}"
    build_fn(tmp)
    try:
        os.replace(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out
