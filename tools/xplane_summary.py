#!/usr/bin/env python
"""Summarise a jax.profiler trace (*.xplane.pb) without TensorBoard.

The TensorBoard profile plugin in this image is incompatible with the
installed TF/protobuf, so this is a dependency-free reader of the XSpace
wire format (tensorflow/core/profiler/protobuf/xplane.proto) that aggregates
device-op self time and prints the top-N ops per plane.

Usage: python tools/xplane_summary.py <trace_dir_or_xplane.pb> [top_n]
"""

import os
import sys
from collections import defaultdict


def _varint(buf, i):
    x = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << shift
        if not b & 0x80:
            return x, i
        shift += 7


def _fields(buf):
    """Yield (field_number, wire_type, value) over a protobuf message."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _varint(buf, i)
        elif wire == 1:
            v = buf[i : i + 8]
            i += 8
        elif wire == 2:
            ln, i = _varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wire == 5:
            v = buf[i : i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, v


def parse_xplane(buf):
    """Return [(plane_name, {op_name: total_self_ps})]."""
    planes = []
    for field, _w, v in _fields(buf):
        if field != 1:  # XSpace.planes
            continue
        name = ""
        lines = []
        meta = {}
        for f2, _w2, v2 in _fields(v):
            if f2 == 2:
                name = v2.decode("utf-8", "replace")
            elif f2 == 3:
                lines.append(v2)
            elif f2 == 4:  # map<int64, XEventMetadata>
                mid, mname = None, ""
                for f3, _w3, v3 in _fields(v2):
                    if f3 == 1:
                        mid = v3
                    elif f3 == 2:
                        for f4, _w4, v4 in _fields(v3):
                            if f4 == 2 and not mname:
                                mname = v4.decode("utf-8", "replace")
                            elif f4 == 3 and v4:
                                mname = v4.decode("utf-8", "replace")
                if mid is not None:
                    meta[mid] = mname
        durations = defaultdict(int)
        for line in lines:
            for f2, _w2, v2 in _fields(line):
                if f2 != 4:  # XLine.events
                    continue
                mid = None
                dur = 0
                for f3, _w3, v3 in _fields(v2):
                    if f3 == 1:
                        mid = v3
                    elif f3 == 3:
                        dur = v3
                durations[meta.get(mid, f"#{mid}")] += dur
        planes.append((name, dict(durations)))
    return planes


def main():
    target = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    paths = []
    if os.path.isdir(target):
        for root, _d, files in os.walk(target):
            paths.extend(os.path.join(root, f) for f in files
                         if f.endswith(".xplane.pb"))
    else:
        paths = [target]
    if not paths:
        sys.exit(f"no .xplane.pb under {target}")
    for path in paths:
        print(f"== {path}")
        with open(path, "rb") as f:
            buf = f.read()
        for plane, durs in parse_xplane(buf):
            if not durs:
                continue
            total = sum(durs.values())
            if total == 0:
                continue
            print(f"-- plane: {plane}  total {total/1e9:.3f} ms")
            for op, ps in sorted(durs.items(), key=lambda kv: -kv[1])[:top_n]:
                print(f"   {ps/1e9:9.3f} ms  {100*ps/total:5.1f}%  {op[:100]}")


if __name__ == "__main__":
    main()
