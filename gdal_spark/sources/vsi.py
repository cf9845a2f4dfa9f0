"""GDAL-style VSI virtual filesystem path layer.

Re-expresses the reference's VSI path chaining (port/cpl_vsil_gzip.cpp,
cpl_vsil_tar.cpp, cpl_vsi_mem.cpp, cpl_vsil_subfile.cpp — the
``/vsizip/`` family documented in the reference's "GDAL Virtual File
Systems" page) for this engine's byte-oriented codecs and readers:

  * ``/vsizip/<archive>/<member>``   — file inside a .zip (stdlib zipfile)
  * ``/vsitar/<archive>/<member>``   — file inside .tar / .tar.gz / .tgz
  * ``/vsigzip/<path>``              — transparent gzip decompression
  * ``/vsimem/<name>``               — in-process memory files
  * ``/vsisubfile/<off>_<size>,<p>`` — byte range of another file
  * ``{...}`` braces delimit the inner path when chaining, exactly like
    the reference: ``/vsitar/{/vsizip/a.zip/b.tar}/c.txt``

Archive/member split without braces follows the reference's probe rule:
the longest prefix that resolves to an existing file is the archive, the
rest is the member; a zip/tar with a single member can be opened without
naming it (cpl_vsil_zip.cpp single-file convenience).

``/vsimem/`` is PER-PROCESS, like the reference's. In a distributed job
that means per-executor: tasks may build and read memory files freely
within themselves (the contract query does exactly that), but a driver-
side ``/vsimem/`` write is NOT visible to executors on a real cluster —
ship bytes through a DataFrame column instead.

`vsi_localize` bridges to the path-based format readers (shapefile,
GPKG, grid formats): it materializes one VSI file — or a whole archive
member set, for sidecar formats — into a local cache directory and
returns real paths, the same pull-through-cache shape the reference's
/vsicurl + CPL temp files give remote datasets.
"""

from __future__ import annotations

import gzip
import io
import os
import tarfile
import tempfile
import zipfile

_MEM: dict[str, bytes] = {}

_HANDLERS = ("/vsizip/", "/vsitar/", "/vsigzip/", "/vsimem/", "/vsisubfile/")


def is_vsi(path: str) -> bool:
    return path.startswith(_HANDLERS)


def _split_chain(rest: str) -> tuple[str, str]:
    """rest of a /vsizip|/vsitar path -> (archive_path, member).
    Braces pin the archive explicitly; otherwise probe longest existing
    prefix at '/' boundaries (the reference's split heuristic)."""
    if rest.startswith("{"):
        depth, i = 0, 0
        for i, ch in enumerate(rest):
            depth += ch == "{"
            depth -= ch == "}"
            if depth == 0:
                break
        if depth:
            raise FileNotFoundError(f"unbalanced braces in VSI path: {rest}")
        return rest[1:i], rest[i + 1 :].lstrip("/")
    parts = rest.split("/")
    for cut in range(len(parts), 0, -1):
        cand = "/".join(parts[:cut])
        probe = "/" + cand if not is_vsi(cand) and not cand.startswith("/") else cand
        if vsi_exists(probe):
            return probe, "/".join(parts[cut:])
    raise FileNotFoundError(f"no archive found along VSI path: /{rest}")


def _zip_names(buf: bytes) -> list[str]:
    with zipfile.ZipFile(io.BytesIO(buf)) as z:
        return [n for n in z.namelist() if not n.endswith("/")]


def _tar_names(buf: bytes) -> list[str]:
    with tarfile.open(fileobj=io.BytesIO(buf)) as t:
        return [m.name for m in t.getmembers() if m.isfile()]


def vsi_read(path: str) -> bytes:
    """Resolve any chained VSI path (or a plain local path) to bytes."""
    if path.startswith("/vsimem/"):
        name = path[len("/vsimem/") :]
        if name not in _MEM:
            raise FileNotFoundError(path)
        return _MEM[name]
    if path.startswith("/vsigzip/"):
        rest = path[len("/vsigzip/") :]
        if rest.startswith("{") and rest.endswith("}"):
            rest = rest[1:-1]
        elif not rest.startswith("/") and not is_vsi(rest):
            rest = "/" + rest  # the reference's /vsigzip//abs/path doubling
        return gzip.decompress(vsi_read(rest))
    if path.startswith("/vsizip/"):
        arch, member = _split_chain(path[len("/vsizip/") :])
        buf = vsi_read(arch)
        with zipfile.ZipFile(io.BytesIO(buf)) as z:
            if not member:
                names = _zip_names(buf)
                if len(names) != 1:
                    raise FileNotFoundError(
                        f"{path}: member required ({len(names)} files in archive)"
                    )
                member = names[0]
            return z.read(member)
    if path.startswith("/vsitar/"):
        arch, member = _split_chain(path[len("/vsitar/") :])
        buf = vsi_read(arch)
        with tarfile.open(fileobj=io.BytesIO(buf)) as t:
            if not member:
                names = _tar_names(buf)
                if len(names) != 1:
                    raise FileNotFoundError(
                        f"{path}: member required ({len(names)} files in archive)"
                    )
                member = names[0]
            fh = t.extractfile(member)
            if fh is None:
                raise FileNotFoundError(path)
            return fh.read()
    if path.startswith("/vsisubfile/"):
        spec, sub = path[len("/vsisubfile/") :].split(",", 1)
        if "_" in spec:
            off_s, size_s = spec.split("_", 1)
            off, size = int(off_s), int(size_s)
        else:
            off, size = int(spec), -1
        data = vsi_read(sub)
        return data[off:] if size < 0 else data[off : off + size]
    with open(path, "rb") as fh:
        return fh.read()


def vsi_write(path: str, data: bytes) -> None:
    """/vsimem/ or plain local path (archives are read-only, as in the
    reference's zip handler outside CREATE mode)."""
    if path.startswith("/vsimem/"):
        _MEM[path[len("/vsimem/") :]] = bytes(data)
        return
    if is_vsi(path):
        raise OSError(f"VSI handler is read-only: {path}")
    with open(path, "wb") as fh:
        fh.write(bytes(data))


def vsi_unlink(path: str) -> None:
    if path.startswith("/vsimem/"):
        _MEM.pop(path[len("/vsimem/") :], None)
        return
    os.unlink(path)


def vsi_exists(path: str) -> bool:
    if path.startswith("/vsimem/"):
        return path[len("/vsimem/") :] in _MEM
    if is_vsi(path):
        try:
            vsi_read(path)
            return True
        except (OSError, KeyError, ValueError, EOFError,
                zipfile.BadZipFile, tarfile.TarError):
            return False
    return os.path.isfile(path)


def vsi_readdir(path: str) -> list[str]:
    """List members of an archive / directory / the memory FS root."""
    if path.rstrip("/") == "/vsimem":
        return sorted(_MEM)
    if path.startswith("/vsizip/"):
        arch, member = _split_chain(path[len("/vsizip/") :])
        names = _zip_names(vsi_read(arch))
        pre = member + "/" if member else ""
        return sorted(n[len(pre) :] for n in names if n.startswith(pre))
    if path.startswith("/vsitar/"):
        arch, member = _split_chain(path[len("/vsitar/") :])
        names = _tar_names(vsi_read(arch))
        pre = member + "/" if member else ""
        return sorted(n[len(pre) :] for n in names if n.startswith(pre))
    return sorted(os.listdir(path))


def vsi_localize(path: str, cache_dir: str | None = None) -> str:
    """Materialize one VSI file to a real local path (pull-through cache
    for the path-based readers)."""
    if not is_vsi(path):
        return path
    cache_dir = cache_dir or tempfile.mkdtemp(prefix="vsi_cache_")
    name = os.path.basename(path.rstrip("/")) or "vsifile"
    out = os.path.join(cache_dir, name)
    with open(out, "wb") as fh:
        fh.write(vsi_read(path))
    return out


def vsi_localize_set(path: str, cache_dir: str | None = None) -> str:
    """Materialize an archive member AND its sidecars (same directory
    level inside the archive) — what multi-file datasets like shapefiles
    (.shp/.shx/.dbf) need. Returns the local path of the named member."""
    if not is_vsi(path):
        return path
    for pre in ("/vsizip/", "/vsitar/"):
        if path.startswith(pre):
            arch, member = _split_chain(path[len(pre) :])
            cache_dir = cache_dir or tempfile.mkdtemp(prefix="vsi_cache_")
            want_dir = os.path.dirname(member)
            listing = vsi_readdir(pre + "{" + arch + "}" + ("/" + want_dir if want_dir else ""))
            out = None
            for n in listing:
                if "/" in n:
                    continue
                full = pre + "{" + arch + "}/" + (want_dir + "/" if want_dir else "") + n
                local = os.path.join(cache_dir, n)
                with open(local, "wb") as fh:
                    fh.write(vsi_read(full))
                if n == os.path.basename(member):
                    out = local
            if out is None:
                raise FileNotFoundError(path)
            return out
    return vsi_localize(path, cache_dir)
