"""Group XProf device time by HLO category and by model module.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
       python tools/summarize_profile.py <logdir> <n_steps>
"""
import collections
import re
import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])
from tools.parse_profile import op_table  # noqa: E402


def module_of(desc: str) -> str:
    m = re.search(r"LargeUNet\._folded_forward/([a-z0-9_]+)", desc)
    if m:
        return m.group(1)
    m = re.search(r"jit\(step\)/([A-Za-z0-9_()\.]+)", desc)
    if m:
        return m.group(1)
    return "(other)"


def main():
    logdir, steps = sys.argv[1], int(sys.argv[2])
    agg, info = op_table(logdir, steps)
    total = sum(agg.values())
    by_cat = collections.Counter()
    by_mod = collections.Counter()
    by_mod_conv = collections.Counter()
    for name, t in agg.items():
        st = info[name]
        desc = str(st.get("long_name") or st.get("tf_op") or "")
        cat = str(st.get("hlo_category", "?"))
        by_cat[cat] += t
        mod = module_of(desc)
        by_mod[mod] += t
        if "convolution" in cat:
            by_mod_conv[mod] += t

    print(f"total device op time: {total/1e12/steps*1e3:.1f} ms/step\n")
    print("by HLO category:")
    for cat, t in by_cat.most_common():
        print(f"  {t/1e12/steps*1e3:8.2f} ms  {100*t/total:5.1f}%  {cat}")
    print("\nby module (conv share):")
    for mod, t in by_mod.most_common(25):
        c = by_mod_conv.get(mod, 0)
        print(f"  {t/1e12/steps*1e3:8.2f} ms  {100*t/total:5.1f}%  {mod}"
              f"  (conv {c/1e12/steps*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
