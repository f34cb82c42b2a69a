"""Minimal XSpace (jax.profiler trace) reader — no TensorFlow needed.

The profiler writes XSpace protobufs; the shipped tooling in this image is
version-broken (see BENCH_NOTES.md), so this module decodes the wire format
generically and extracts per-op device timings.

XSpace schema subset (stable across TF/XLA versions):
  XSpace.planes[1]: XPlane
  XPlane: id=1, name=2, lines=3, event_metadata=4 (map), stat_metadata=5
  XLine:  id=1, name=2, events=6, timestamp_ns=5
  XEvent: metadata_id=1, offset_ps=2, duration_ps=3, stats=4
  XEventMetadata: id=1, name=2, display_name=3
"""

from __future__ import annotations

import struct
from collections import defaultdict
from typing import Dict, Iterator, List, Tuple

__all__ = ["parse_message", "op_self_times", "top_ops", "op_sources"]


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def parse_message(buf: bytes) -> Dict[int, list]:
    """Generic wire-format decode: field number -> list of raw values
    (ints for varint/fixed, bytes for length-delimited)."""
    fields: Dict[int, list] = defaultdict(list)
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 1:  # fixed64
            val = struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
        elif wire == 2:  # length-delimited
            length, pos = _read_varint(buf, pos)
            val = buf[pos : pos + length]
            pos += length
        elif wire == 5:  # fixed32
            val = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire} at {pos}")
        fields[field].append(val)
    return fields


def op_self_times(xplane_path: str, plane_filter: str = "TPU") -> Dict[str, float]:
    """Sum event durations (ps) per event name on matching device planes."""
    space = parse_message(open(xplane_path, "rb").read())
    totals: Dict[str, float] = defaultdict(float)
    for plane_buf in space.get(1, []):
        plane = parse_message(plane_buf)
        name = (plane.get(2, [b""])[0]).decode(errors="replace")
        if plane_filter and plane_filter.lower() not in name.lower():
            continue
        # event metadata map: id -> name (XEventMetadata: id=1, long
        # HLO text=2, short op name=4 in the traces this image produces)
        meta_names: Dict[int, str] = {}
        for entry_buf in plane.get(4, []):
            entry = parse_message(entry_buf)
            key = entry.get(1, [0])[0]
            md = parse_message(entry.get(2, [b""])[0])
            raw = md.get(4, md.get(2, [b""]))[0]
            meta_names[key] = raw.decode(errors="replace")
        for line_buf in plane.get(3, []):
            line = parse_message(line_buf)
            lname = line.get(2, [b""])[0]
            if lname not in (b"XLA Ops",):
                continue
            for ev_buf in line.get(4, []):
                ev = parse_message(ev_buf)
                mid = ev.get(1, [0])[0]
                dur = ev.get(3, [0])[0]
                totals[meta_names.get(mid, f"op_{mid}")] += dur
    return dict(totals)


def op_sources(xplane_path: str, plane_filter: str = "TPU") -> Dict[str, str]:
    """Map op name -> jax attribution ``tf_op path @ source:line``.

    Each XEventMetadata carries XStats (field 5); the plane's
    stat_metadata (field 5) names them — ``tf_op`` holds the
    ``jit(fn)/.../submodule/op`` path and ``source`` the python
    ``file:line``.  This is how anonymous ``fusion.N`` / ``copy.N``
    entries from :func:`top_ops` are attributed.
    """
    space = parse_message(open(xplane_path, "rb").read())
    sources: Dict[str, str] = {}
    for plane_buf in space.get(1, []):
        plane = parse_message(plane_buf)
        name = (plane.get(2, [b""])[0]).decode(errors="replace")
        if plane_filter and plane_filter.lower() not in name.lower():
            continue
        stat_ids: Dict[str, int] = {}
        for entry_buf in plane.get(5, []):
            entry = parse_message(entry_buf)
            smd = parse_message(entry.get(2, [b""])[0])
            sname = smd.get(2, [b""])[0].decode(errors="replace")
            stat_ids[sname] = entry.get(1, [0])[0]
        tf_op_id = stat_ids.get("tf_op")
        source_id = stat_ids.get("source")
        for entry_buf in plane.get(4, []):
            entry = parse_message(entry_buf)
            md = parse_message(entry.get(2, [b""])[0])
            short = md.get(4, [b""])[0].decode(errors="replace")
            path = src = ""
            for stat_buf in md.get(5, []):
                stat = parse_message(stat_buf)
                sid = stat.get(1, [0])[0]
                sval = stat.get(5, [b""])[0]
                if sid == tf_op_id:
                    path = sval.decode(errors="replace")
                elif sid == source_id:
                    src = sval.decode(errors="replace")
            if short and (path or src):
                sources[short] = f"{path} @ {src}" if src else path
    return sources


def top_op_categories(xplane_path: str, k: int = 15, plane_filter: str = "TPU"):
    """Aggregate by op kind (name prefix before the first '.'); [(kind, ms)]."""
    totals = op_self_times(xplane_path, plane_filter)
    cats: Dict[str, float] = defaultdict(float)
    for name, ps in totals.items():
        cats[name.split(".")[0]] += ps
    ranked = sorted(cats.items(), key=lambda kv: -kv[1])[:k]
    return [(name, ps / 1e9) for name, ps in ranked]


def top_ops(xplane_path: str, k: int = 20, plane_filter: str = "TPU"):
    """Top-k ops by total device time; returns [(name, ms)]."""
    totals = op_self_times(xplane_path, plane_filter)
    ranked = sorted(totals.items(), key=lambda kv: -kv[1])[:k]
    return [(name, ps / 1e9) for name, ps in ranked]
