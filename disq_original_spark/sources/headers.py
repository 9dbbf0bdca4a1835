"""Driver-side header reading for SAM/BAM/VCF (no Spark job — mirrors the
reference's driver-side header IO, `sam/AbstractSamSource.java:32-49`,
`vcf/VcfSource.java:49-86`)."""

from __future__ import annotations

import gzip
import struct
from dataclasses import dataclass, field
from pathlib import Path

from .bgzf import BgzfReader, is_bgzf
from .fsio import fs_basename, fs_open, fs_open_text, get_fs


@dataclass
class SamHeader:
    """Parsed-enough SAM header: raw text plus the reference dictionary."""

    text: str  # full header text including trailing newline (may be "")
    contigs: list[tuple[str, int]] = field(default_factory=list)  # (name, length)

    @property
    def sort_order(self) -> str:
        for line in self.text.splitlines():
            if line.startswith("@HD"):
                for f in line.split("\t")[1:]:
                    if f.startswith("SO:"):
                        return f[3:]
        return "unknown"

    @classmethod
    def parse(cls, text: str) -> "SamHeader":
        contigs = []
        for line in text.splitlines():
            if line.startswith("@SQ"):
                name, length = None, None
                for f in line.split("\t")[1:]:
                    if f.startswith("SN:"):
                        name = f[3:]
                    elif f.startswith("LN:"):
                        length = int(f[3:])
                if name is not None:
                    contigs.append((name, length or 0))
        return cls(text=text, contigs=contigs)


def first_file_in(path: str | Path) -> str:
    """A path may be a directory of same-header files (non-recursive),
    reference `HtsjdkReadsRddStorage.java:150-156`; pick the
    lexicographically first part-like file.  All IO goes through the
    pluggable filesystem layer (``fsio``) so directory inputs work on any
    registered scheme."""
    p = str(path)
    fs = get_fs(p)
    if not fs.isdir(p):
        return p
    from .fsio import list_data_files

    files = list_data_files(fs, p)
    if not files:
        raise FileNotFoundError(f"no files in directory {p}")
    return files[0]


def read_sam_header_text(path: str | Path) -> str:
    """Header of a text SAM file: leading '@' lines."""
    lines = []
    with fs_open_text(first_file_in(path)) as fh:
        for line in fh:
            if not line.startswith("@"):
                break
            lines.append(line)
    return "".join(lines)


def read_bam_header(path: str | Path) -> tuple[SamHeader, list[tuple[str, int]], int]:
    """Parse a BAM header block (BAM spec §4.2): returns (header, refs,
    first_record_voffset).  refs is the binary reference list — the
    authoritative refID→name mapping."""
    with fs_open(first_file_in(path)) as fh:
        r = BgzfReader(fh)
        magic = r.read(4)
        if magic != b"BAM\x01":
            raise ValueError(f"{path}: not a BAM file (magic {magic!r})")
        l_text = struct.unpack("<i", r.read(4))[0]
        text = r.read(l_text).rstrip(b"\x00").decode("utf-8", "replace")
        n_ref = struct.unpack("<i", r.read(4))[0]
        refs: list[tuple[str, int]] = []
        for _ in range(n_ref):
            l_name = struct.unpack("<i", r.read(4))[0]
            name = r.read(l_name)[:-1].decode()
            l_ref = struct.unpack("<i", r.read(4))[0]
            refs.append((name, l_ref))
        header = SamHeader.parse(text)
        if not header.contigs:
            header.contigs = list(refs)
        return header, refs, r.tell_virtual()


def read_vcf_header_text(path: str | Path) -> str:
    """Header of a VCF (plain, gzip, or BGZF): leading '#' lines
    (reference gunzips to read the header, `VcfSource.java:80-86`)."""
    p = first_file_in(path)
    with fs_open(p) as fh:
        if is_bgzf(fh):
            data = bytearray()
            r = BgzfReader(fh)
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                data.extend(chunk)
                # stop once we've certainly passed the header
                if b"\n#CHROM" in data and data.rfind(b"\n", data.find(b"\n#CHROM") + 1) != -1:
                    break
            raw = bytes(data)
        elif p.endswith(".gz"):
            with gzip.GzipFile(fileobj=fh) as gz:
                raw = gz.read()
        else:
            raw = fh.read()
    lines = []
    for line in raw.decode("utf-8", "replace").splitlines(keepends=True):
        if not line.startswith("#"):
            break
        lines.append(line)
    return "".join(lines)


def vcf_sample_names(header_text: str) -> list[str]:
    for line in header_text.splitlines():
        if line.startswith("#CHROM"):
            cols = line.rstrip("\n").split("\t")
            return cols[9:] if len(cols) > 9 else []
    return []


def header_ref_and_rg_names(header_text: str) -> tuple[list[str], list[str]]:
    """(@SQ SN names, @RG ID names) from SAM header text — the refID→name
    and read-group maps shared by the CRAM reader and writers (one parser,
    so they can never disagree)."""
    ref_names: list[str] = []
    rg_ids: list[str] = []
    for line in header_text.splitlines():
        if line.startswith("@SQ"):
            ref_names.extend(f[3:] for f in line.split("\t") if f.startswith("SN:"))
        elif line.startswith("@RG"):
            rg_ids.extend(f[3:] for f in line.split("\t") if f.startswith("ID:"))
    return ref_names, rg_ids
