"""Summarise a jax.profiler xplane.pb without TensorFlow.

Minimal protobuf wire-format walker for the XSpace/XPlane schema — the
image's tensorboard-plugin-profile cannot decode traces (proto/pywrap
version skew), so this extracts the per-op time breakdown directly.

Usage: python tools/xplane_summary.py /tmp/xprof/plugins/profile/*/NAME.xplane.pb
"""
from __future__ import annotations

import collections
import struct
import sys


def _read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over a protobuf message."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wt == 1:  # 64-bit
            val = struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
        elif wt == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:  # 32-bit
            val = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def parse_plane(plane_buf: memoryview):
    name = ""
    lines = []
    event_meta: dict[int, str] = {}
    for field, _, val in _fields(plane_buf):
        if field == 2:
            name = bytes(val).decode(errors="replace")
        elif field == 3:
            lines.append(val)
        elif field == 4:  # map entry: key=1 varint, value=2 XEventMetadata
            key = None
            meta_name = ""
            for f2, _, v2 in _fields(val):
                if f2 == 1:
                    key = v2
                elif f2 == 2:
                    for f3, _, v3 in _fields(v2):
                        if f3 == 2:
                            meta_name = bytes(v3).decode(errors="replace")
            if key is not None:
                event_meta[key] = meta_name
    return name, lines, event_meta


def parse_line(line_buf: memoryview):
    name = ""
    events = []
    for field, wt, val in _fields(line_buf):
        if field == 2 and wt == 2:
            name = bytes(val).decode(errors="replace")
        elif field == 4:
            events.append(val)
    return name, events


def parse_event(event_buf: memoryview):
    metadata_id = 0
    duration_ps = 0
    offset_ps = 0
    for field, _, val in _fields(event_buf):
        if field == 1:
            metadata_id = val
        elif field == 2:
            offset_ps = val
        elif field == 3:
            duration_ps = val
    return metadata_id, duration_ps, offset_ps


def _union_time(intervals: list[tuple[int, int]]) -> int:
    """Total covered time of possibly-overlapping (start, end) intervals."""
    if not intervals:
        return 0
    intervals.sort()
    total = 0
    cur_s, cur_e = intervals[0]
    for s, e in intervals[1:]:
        if s > cur_e:
            total += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    return total + (cur_e - cur_s)


def device_breakdown(path: str, categorize=None, top: int = 12):
    """Decode a TPU xplane into a compute/DMA time breakdown.

    The device plane has two op timelines: "XLA Ops" (the serial compute
    stream) and "Async XLA Ops" (DMA copy/slice spans overlapping
    compute). They must be matched *exactly* — a substring match catches
    both and double-counts the DMA spans as busy time.

    Returns dict with compute_busy_ps, async_union_ps, cats (category ->
    ps, over the compute line only) and top_ops (name -> ps).
    """
    if categorize is None:
        def categorize(op: str) -> str:
            lo = op.lower()
            if "attn" in lo or "flash" in lo or "custom-call" in lo:
                return "custom-call (pallas)"
            if "conv" in lo or "dot" in lo or "einsum" in lo:
                return "matmul/conv"
            if "fusion" in lo:
                return "fusion"
            if "copy" in lo or "transpose" in lo or "bitcast" in lo:
                return "copy/layout"
            if "dynamic" in lo or "slice" in lo or "concatenate" in lo or "pad" in lo:
                return "slice/concat"
            return "other"

    buf = memoryview(open(path, "rb").read())
    compute_busy = 0
    async_union = 0
    cats: collections.Counter = collections.Counter()
    ops: collections.Counter = collections.Counter()
    for field, _, val in _fields(buf):
        if field != 1:
            continue
        pname, lines, event_meta = parse_plane(val)
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        for line_buf in lines:
            lname, events = parse_line(line_buf)
            if lname not in ("XLA Ops", "Async XLA Ops"):
                continue
            intervals = []
            for ev in events:
                mid, dur, off = parse_event(ev)
                intervals.append((off, off + dur))
                if lname == "XLA Ops":
                    opname = event_meta.get(mid, f"meta:{mid}")
                    cats[categorize(opname)] += dur
                    ops[opname.split(".")[0].split(" ")[0]] += dur
            union = _union_time(intervals)
            if lname == "XLA Ops":
                compute_busy += union
            else:
                async_union += union
    return {
        "compute_busy_ps": compute_busy,
        "async_union_ps": async_union,
        "cats": dict(cats),
        "top_ops": dict(ops.most_common(top)),
    }


def summarize(path: str, top: int = 25, line_filter: str = "XLA Ops"):
    buf = memoryview(open(path, "rb").read())
    planes = [val for field, _, val in _fields(buf) if field == 1]
    for plane_buf in planes:
        pname, lines, event_meta = parse_plane(plane_buf)
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        agg: collections.Counter = collections.Counter()
        copy_iv, compute_iv, all_iv = [], [], []
        for line_buf in lines:
            lname, events = parse_line(line_buf)
            if line_filter and line_filter not in lname:
                continue
            for ev in events:
                mid, dur, off = parse_event(ev)
                opname = event_meta.get(mid, f"meta:{mid}")
                # collapse fusion instance suffixes
                agg[opname.split(".")[0]] += dur
                iv = (off, off + dur)
                all_iv.append(iv)
                if opname.startswith(("%copy", "%slice-start", "%slice-done")):
                    copy_iv.append(iv)
                else:
                    compute_iv.append(iv)
        total = sum(agg.values())
        if not total:
            continue
        busy = _union_time(all_iv)
        busy_compute = _union_time(compute_iv)
        busy_copy = _union_time(copy_iv)
        print(f"== plane: {pname}  (line filter: {line_filter!r})")
        print(f"  duration-sum {total/1e9:.1f} ms | busy(union) {busy/1e9:.1f} ms | "
              f"compute-busy {busy_compute/1e9:.1f} ms | copy-busy {busy_copy/1e9:.1f} ms")
        for opname, dur in agg.most_common(top):
            print(f"  {dur / total * 100:6.2f}%  {opname[:100]}")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    for p in sys.argv[1:]:
        summarize(p)
