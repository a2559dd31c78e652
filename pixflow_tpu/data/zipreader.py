"""Zip-archive member access with the `archive.zip@/inner/path` convention
and per-process handle caching (capability of reference
`contrast/data/zipreader.py`)."""

from __future__ import annotations

import os
import zipfile

_SEP = "@"
_handles: dict = {}


def is_zip_path(path: str) -> bool:
    return ".zip" + _SEP in path


def split_zip_path(path: str):
    pos = path.index(".zip" + _SEP)
    archive = path[: pos + 4]
    inner = path[pos + 5:]
    return archive, inner.lstrip("/")


def _handle(archive: str) -> zipfile.ZipFile:
    key = (archive, os.getpid())
    zf = _handles.get(key)
    if zf is None:
        zf = zipfile.ZipFile(archive, "r")
        _handles[key] = zf
    return zf


def read_bytes(path: str) -> bytes:
    archive, inner = split_zip_path(path)
    return _handle(archive).read(inner)


def list_members(archive: str, suffix: str = ""):
    return [n for n in _handle(archive).namelist() if n.endswith(suffix)]
