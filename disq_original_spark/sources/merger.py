"""Single-file commit: concatenate executor-written part files with a
driver-written header (and optional terminator) into one output file.

Reference parity: `file/Merger.java:9-30` + the serial-copy fallback of
`file/HadoopFileSystemWrapper.java:86-121`.  Parts are ordered
lexicographically; files starting with '.' or '_' are ignored (Hadoop
convention).  On HDFS the reference uses FileSystem.concat as a fast path; on
an object store the equivalent is multipart compose — here (local FS) it's a
stream copy, which is also the universal fallback the reference ships.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path


def list_parts(temp_dir: str | Path) -> list[Path]:
    d = Path(temp_dir)
    return sorted(
        p
        for p in d.iterdir()
        if p.is_file() and not p.name.startswith((".", "_"))
    )


def merge_parts(
    temp_dir: str | Path,
    output_path: str | Path,
    *,
    header: bytes | None = None,
    terminator: bytes | None = None,
    delete_temp: bool = True,
) -> None:
    """Concatenate header + parts + terminator into ``output_path``
    (overwriting it, like the reference — README.md:53)."""
    output_path = Path(output_path)
    tmp_out = output_path.with_name(output_path.name + ".tmp_merge")
    with open(tmp_out, "wb") as out:
        if header is not None:
            out.write(header)
        for part in list_parts(temp_dir):
            with open(part, "rb") as src:
                shutil.copyfileobj(src, out, 8 * 1024 * 1024)
        if terminator is not None:
            out.write(terminator)
    os.replace(tmp_out, output_path)
    if delete_temp:
        shutil.rmtree(temp_dir, ignore_errors=True)
