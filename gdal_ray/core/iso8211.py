"""ISO/IEC 8211 data descriptive file codec — ``frmts/iso8211`` analog.

Generic module reader/writer for the subset S-57 exercises: a DDR
(leader id 'L') carrying field definitions (subfield labels + format
controls) followed by DRs (leader id 'D').  Format controls supported:
``A``/``A(n)`` text (variable text ends at the 0x1F unit terminator),
``I(n)``/``R(n)`` numeric text, ``b1w``/``b2w`` little-endian
unsigned/signed binary (w = 1/2/4 bytes), ``B(n)`` raw bit strings
(n bits, multiple of 8).  Repeating fields (leader ``*`` in the label
part) decode as a list of subfield dicts.

Layout (ddfrecord.cpp / ddfmodule.cpp): 24-byte leader (record length
@0:5, leader id @6, base address @12:17, entry sizes @20/21/23),
directory of (tag, length, position) entries terminated by 0x1E, field
area at the base address with 0x1E field terminators; DDR field
definitions are ``<controls>\\x1f<name>\\x1f<labels>\\x1f<formats>``.
"""

from __future__ import annotations

import re
import struct

__all__ = ["FieldDefn", "encode_module", "decode_module"]

FT = b"\x1e"          # field terminator
UT = b"\x1f"          # unit terminator


class FieldDefn:
    """One 8211 field definition: ordered (label, format) subfields."""

    def __init__(self, tag: str, name: str,
                 subfields: list[tuple[str, str]],
                 repeating: bool = False):
        self.tag = tag
        self.name = name
        self.subfields = subfields
        self.repeating = repeating

    # ---- format helpers ----

    @staticmethod
    def _fmt_width(fmt: str):
        """format control -> (kind, width_bytes_or_None)."""
        if fmt.startswith("b"):
            return "b" + fmt[1], int(fmt[2])
        m = re.fullmatch(r"([AIRB])(?:\((\d+)\))?", fmt)
        if not m:
            raise ValueError(f"8211: unsupported format control {fmt!r}")
        kind, w = m.group(1), m.group(2)
        if kind == "B":
            if w is None or int(w) % 8:
                raise ValueError("8211: B() needs a multiple-of-8 width")
            return "B", int(w) // 8
        return kind, None if w is None else int(w)

    def pack_values(self, values: dict) -> bytes:
        out = bytearray()
        for label, fmt in self.subfields:
            kind, w = self._fmt_width(fmt)
            v = values[label]
            if kind == "b1":
                out += int(v).to_bytes(w, "little", signed=False)
            elif kind == "b2":
                out += int(v).to_bytes(w, "little", signed=True)
            elif kind == "B":
                assert isinstance(v, (bytes, bytearray)) and len(v) == w
                out += v
            elif kind in ("A", "I", "R"):
                s = str(v)
                if w is None:
                    out += s.encode("ascii") + UT
                else:
                    if len(s) > w:
                        raise ValueError(f"8211: {label} value too wide")
                    out += (s.rjust(w) if kind in "IR"
                            else s.ljust(w)).encode("ascii")
        return bytes(out)

    def unpack_values(self, data: bytes, pos: int) -> tuple[dict, int]:
        row = {}
        for label, fmt in self.subfields:
            kind, w = self._fmt_width(fmt)
            if kind == "b1":
                row[label] = int.from_bytes(data[pos:pos + w], "little")
                pos += w
            elif kind == "b2":
                row[label] = int.from_bytes(data[pos:pos + w], "little",
                                            signed=True)
                pos += w
            elif kind == "B":
                row[label] = bytes(data[pos:pos + w])
                pos += w
            elif w is not None:
                s = data[pos:pos + w].decode("ascii")
                pos += w
                row[label] = (int(s) if kind == "I" else
                              float(s) if kind == "R" else s.rstrip())
            else:                             # variable text
                end = data.index(UT, pos)
                s = data[pos:end].decode("ascii")
                pos = end + 1
                row[label] = s
        return row, pos


def _leader(length: int, leader_id: str, base: int,
            size_len: int, size_pos: int, size_tag: int = 4) -> bytes:
    s = bytearray(b" " * 24)
    s[0:5] = b"%05d" % length
    s[5:6] = b"3" if leader_id == "L" else b" "
    s[6:7] = leader_id.encode()
    if leader_id == "L":
        s[7:8] = b"E"
        s[10:12] = b"09"
    s[12:17] = b"%05d" % base
    if leader_id == "L":
        s[17:20] = b" ! "
    s[20] = ord("0") + size_len
    s[21] = ord("0") + size_pos
    s[22] = ord("0")
    s[23] = ord("0") + size_tag
    return bytes(s)


def _record(entries: list[tuple[str, bytes]], leader_id: str) -> bytes:
    """(tag, field_bytes) list -> one 8211 record (leader + directory +
    field area)."""
    max_len = max(len(f) + 1 for _, f in entries)
    size_len = max(1, len(str(max_len)))
    total = sum(len(f) + 1 for _, f in entries)
    size_pos = max(1, len(str(total)))
    dir_bytes = bytearray()
    pos = 0
    area = bytearray()
    for tag, f in entries:
        field = f + FT
        dir_bytes += tag.encode("ascii").ljust(4)[:4]
        dir_bytes += b"%0*d" % (size_len, len(field))
        dir_bytes += b"%0*d" % (size_pos, pos)
        pos += len(field)
        area += field
    dir_bytes += FT
    base = 24 + len(dir_bytes)
    length = base + len(area)
    return _leader(length, leader_id, base, size_len, size_pos) + \
        bytes(dir_bytes) + bytes(area)


def encode_module(defns: list[FieldDefn],
                  records: list[list[tuple[str, object]]]) -> bytes:
    """Field definitions + DR contents -> 8211 module bytes.  Each
    record is a list of (tag, values) where values is a dict (or a list
    of dicts for repeating fields)."""
    by_tag = {d.tag: d for d in defns}
    ddr_entries: list[tuple[str, bytes]] = []
    # 0000 file control field: name-less, lists tag pairs (parent 0001)
    pairs = b"".join(b"0001" + d.tag.encode("ascii") for d in defns)
    ddr_entries.append(("0000", b"0000;&" + UT + UT + pairs))
    ddr_entries.append(("0001", b"0100;&" + UT + UT + b"(I(4))"))
    for d in defns:
        labels = ("*" if d.repeating else "") + \
            "!".join(l for l, _ in d.subfields)
        fmts = "(" + ",".join(f for _, f in d.subfields) + ")"
        body = (b"1600;&" + d.name.encode("ascii") + UT
                + labels.encode("ascii") + UT + fmts.encode("ascii"))
        ddr_entries.append((d.tag, body))
    out = [_record(ddr_entries, "L")]
    for rid, rec in enumerate(records):
        entries: list[tuple[str, bytes]] = [
            ("0001", b"%04d" % (rid % 10000))]
        for tag, values in rec:
            d = by_tag[tag]
            if d.repeating:
                body = b"".join(d.pack_values(v) for v in values)
            else:
                body = d.pack_values(values)
            entries.append((tag, body))
        out.append(_record(entries, "D"))
    return b"".join(out)


def _parse_record(data: bytes, pos: int):
    length = int(data[pos:pos + 5])
    leader_id = chr(data[pos + 6])
    base = int(data[pos + 12:pos + 17])
    size_len = data[pos + 20] - ord("0")
    size_pos = data[pos + 21] - ord("0")
    size_tag = data[pos + 23] - ord("0")
    entry_w = size_tag + size_len + size_pos
    dpos = pos + 24
    entries = []
    while data[dpos] != 0x1E:
        tag = data[dpos:dpos + size_tag].decode("ascii")
        ln = int(data[dpos + size_tag:dpos + size_tag + size_len])
        fp = int(data[dpos + size_tag + size_len:dpos + entry_w])
        entries.append((tag, ln, fp))
        dpos += entry_w
    area = pos + base
    fields = [(tag, data[area + fp:area + fp + ln - 1])
              for tag, ln, fp in entries]
    return leader_id, fields, pos + length


def decode_module(data: bytes):
    """8211 module bytes -> (defns_by_tag, records) where each record is
    a list of (tag, values) mirroring :func:`encode_module`."""
    pos = 0
    leader_id, ddr_fields, pos = _parse_record(data, 0)
    if leader_id != "L":
        raise ValueError("8211: first record is not a DDR")
    defns: dict[str, FieldDefn] = {}
    for tag, body in ddr_fields:
        if tag in ("0000", "0001"):
            continue
        parts = body.split(UT)
        if len(parts) < 3:
            continue
        name = parts[0][6:].decode("ascii")
        labels = parts[1].decode("ascii")
        fstr = parts[2].decode("ascii")
        if fstr.startswith("(") and fstr.endswith(")"):
            fstr = fstr[1:-1]                # one layer only: I(5) stays
        fmts = fstr.split(",")
        repeating = labels.startswith("*")
        labs = labels.lstrip("*").split("!") if labels.lstrip("*") else []
        defns[tag] = FieldDefn(tag, name, list(zip(labs, fmts)),
                               repeating)
    records = []
    while pos + 24 <= len(data):
        _, fields, pos = _parse_record(data, pos)
        rec = []
        for tag, body in fields:
            if tag == "0001":
                continue
            d = defns.get(tag)
            if d is None:
                continue
            if d.repeating:
                vals = []
                p = 0
                while p < len(body):
                    row, p = d.unpack_values(body, p)
                    vals.append(row)
                rec.append((tag, vals))
            else:
                row, _ = d.unpack_values(body, 0)
                rec.append((tag, row))
        records.append(rec)
    return defns, records
