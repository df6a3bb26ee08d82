"""Summarize a jax.profiler xplane.pb trace: device time by op, no deps.

TensorBoard isn't available in this image, so this is the trace-reading
half of the capture_trace.py workflow: a minimal generic-protobuf walker
for the XSpace/XPlane format (tsl/profiler/protobuf/xplane.proto — only
field numbers are assumed, no generated code):

  XSpace.planes=1; XPlane{id=1,name=2,lines=3,event_metadata=4(map),
  stat_metadata=5}; XLine{id=1,name=2,timestamp_ns=3,events=4};
  XEvent{metadata_id=1,offset_ps=2,duration_ps=3};
  XEventMetadata{id=1,name=2,display_name=4}; map entry{key=1,value=2}.

Prints, for each device plane (name contains "TPU" / "/device:"), total
event time grouped by a coarse op-class (pallas call name, fusion,
dynamic-slice/update, convert, copy, ...) and the top individual ops.

Run: python benchmarks/trace_summary.py <trace_dir_or_xplane.pb> [top_n]
"""
import glob
import os
import re
import sys
from collections import defaultdict


def _varint(buf, i):
    r = s = 0
    while True:
        b = buf[i]
        r |= (b & 0x7F) << s
        i += 1
        if not b & 0x80:
            return r, i
        s += 7


def fields(buf):
    """Yield (field_no, wire_type, value) over one message's bytes."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def classify(name: str) -> str:
    """Coarse op-class for grouping (mirrors the RESULTS.md anatomy rows)."""
    n = name.lower()
    if "custom-call" in n or "closed_call" in n \
            or re.search(r"(kern|pallas|mosaic)", n):
        return "pallas/custom-call"
    if n.startswith("fusion") or ".fusion" in n or "loop_fusion" in n:
        return "fusion (elementwise/other)"
    if "dynamic-update-slice" in n:
        return "dynamic-update-slice"
    if "dynamic-slice" in n:
        return "dynamic-slice"
    if "convert" in n:
        return "convert"
    if n.startswith("copy") or "copy-start" in n or "copy-done" in n:
        return "copy"
    if "all-reduce" in n or "all-gather" in n or "collective" in n:
        return "collective"
    if n.startswith(("dot", "convolution")) or "gemm" in n:
        return "dot (unfused)"
    if "infeed" in n or "outfeed" in n or "transfer" in n:
        return "host transfer"
    return "other"


def summarize(path: str, top_n: int = 25):
    buf = open(path, "rb").read()
    for fno, _, plane in fields(buf):
        if fno != 1:
            continue
        pname, lines, meta = "", [], {}
        for f2, _, v in fields(plane):
            if f2 == 2:
                pname = v.decode("utf-8", "replace")
            elif f2 == 3:
                lines.append(v)
            elif f2 == 4:  # map<int64, XEventMetadata>
                mid, mname, disp = 0, "", ""
                for f3, _, mv in fields(v):
                    if f3 == 2:
                        for f4, _, x in fields(mv):
                            if f4 == 1:
                                mid = x
                            elif f4 == 2:
                                mname = x.decode("utf-8", "replace")
                            elif f4 == 4:
                                disp = x.decode("utf-8", "replace")
                meta[mid] = disp or mname
        if not ("TPU" in pname or "/device:" in pname or "Device" in pname):
            continue
        # Events nest by time interval (jit_* > while > fusion) on the same
        # line: attribute EXCLUSIVE (self) time — duration minus direct
        # children — on the "XLA Ops" line.  "Async XLA Ops" (DMA) overlaps
        # compute and is reported separately, not added to the total.
        parsed = []  # (line_name, [(offset_ps, duration_ps, metadata_id)])
        for line in lines:
            lname, evs = "", []
            for f3, _, v in fields(line):
                if f3 == 2:
                    lname = v.decode("utf-8", "replace")
                elif f3 == 4:
                    mid = dur = off = 0
                    for f4, _, x in fields(v):
                        if f4 == 1:
                            mid = x
                        elif f4 == 2:
                            off = x
                        elif f4 == 3:
                            dur = x
                    evs.append((off, dur, mid))
            parsed.append((lname, evs))
        print(f"[plane {pname}] lines: "
              + ", ".join(f"{ln or '?'}({len(ev)})" for ln, ev in parsed))

        def self_times(evs):
            """offset-sorted stack walk -> {metadata_id: self_ps}."""
            out = defaultdict(int)
            st = []  # [start, end, mid, child_sum]
            for off, dur, mid in sorted(evs, key=lambda e: (e[0], -e[1])):
                while st and off >= st[-1][1]:
                    s = st.pop()
                    out[s[2]] += (s[1] - s[0]) - s[3]
                    if st:
                        st[-1][3] += s[1] - s[0]
                st.append([off, off + dur, mid, 0])
            while st:
                s = st.pop()
                out[s[2]] += (s[1] - s[0]) - s[3]
                if st:
                    st[-1][3] += s[1] - s[0]
            return out

        op_lines = [p for p in parsed if p[0] == "XLA Ops"] \
            or [p for p in parsed if "op" in p[0].lower()] or parsed
        async_lines = [p for p in parsed if "async" in p[0].lower()]
        by_op = defaultdict(int)
        total = 0
        for _, evs in op_lines:
            for mid, ps in self_times(evs).items():
                by_op[meta.get(mid, f"id{mid}")] += ps
                total += ps
        async_ps = sum(d for _, evs in async_lines for _, d, _ in evs)
        if async_ps:
            print(f"[async DMA line, overlapped: {async_ps/1e9:.3f} ms]")
        if not by_op:
            continue
        print(f"\n=== plane: {pname}  (total event time "
              f"{total/1e9:.3f} ms) ===")
        by_class = defaultdict(int)
        for op, ps in by_op.items():
            by_class[classify(op)] += ps
        print("-- by class --")
        for cls, ps in sorted(by_class.items(), key=lambda kv: -kv[1]):
            print(f"  {ps/1e9:9.3f} ms  {100*ps/max(total,1):5.1f}%  {cls}")
        print(f"-- top {top_n} ops --")
        for op, ps in sorted(by_op.items(), key=lambda kv: -kv[1])[:top_n]:
            print(f"  {ps/1e9:9.3f} ms  {op[:110]}")


def main():
    arg = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vfs_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    if os.path.isdir(arg):
        pbs = glob.glob(os.path.join(arg, "**", "*.xplane.pb"),
                        recursive=True)
        if not pbs:
            sys.exit(f"no *.xplane.pb under {arg}")
        arg = max(pbs, key=os.path.getmtime)
    print(f"trace: {arg}")
    summarize(arg, top_n)


if __name__ == "__main__":
    main()
