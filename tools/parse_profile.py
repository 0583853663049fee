"""Aggregate per-op device time from an XProf xplane.pb (no TensorBoard UI).

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python tools/parse_profile.py <logdir> <n_steps> [top_n]
"""
import collections
import glob
import sys


def op_table(logdir: str, steps: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    f = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.xplane.pb"))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(f, "rb").read())
    plane = [p for p in xs.planes if "TPU" in p.name][0]
    stats_meta = {k: v.name for k, v in plane.stat_metadata.items()}
    ev_meta = dict(plane.event_metadata.items())
    agg = collections.Counter()
    info = {}
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for e in line.events:
            md = ev_meta[e.metadata_id]
            agg[md.name] += e.duration_ps
            if md.name not in info:
                stats = {}
                for s in list(e.stats) + list(md.stats):
                    nm = stats_meta.get(s.metadata_id, "?")
                    stats[nm] = (
                        s.str_value or s.int64_value or s.uint64_value
                        or s.double_value
                    )
                info[md.name] = stats
    return agg, info


def main():
    logdir, steps = sys.argv[1], int(sys.argv[2])
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 35
    agg, info = op_table(logdir, steps)
    total = sum(agg.values())
    print(f"total device op time: {total/1e12/steps*1e3:.1f} ms/step")
    for name, t in agg.most_common(top):
        st = info[name]
        desc = st.get("long_name") or st.get("tf_op") or ""
        cat = st.get("hlo_category", "")
        print(f"{t/1e12/steps*1e3:8.2f} ms  {100*t/total:5.1f}%  [{cat:<22}] {name[:36]:38s} {str(desc)[:120]}")


if __name__ == "__main__":
    main()
