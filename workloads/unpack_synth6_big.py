"""Unpack the committed synth6_big workload (150,000 labeled 6-table Zipf
join queries, 25,000 per arity) from `workloads/synth6_big_xz/` into
`workloads/synth6_big_data/` — the input of every 90k-row Nystrom-tier
result in BASELINE.md.

    python workloads/unpack_synth6_big.py          # ~5 s

The fixtures were generated deterministically by
`python workloads/make_synth6_join.py --per_arity 25000 --out_name
synth6_big_data` (same per-arity RNG streams as the committed 18k
synth6_join_data, which it extends line-for-line) — but regeneration costs
~1 h of merge-based COUNT(*) labeling on a 1-core host, so the labeled
text is committed xz-compressed (3.4 MB) the same way the reference
commits its `Queries/forest_data/` fixtures. Table stats are the committed
`workloads/synth6_stats/` (shared with the 18k workload — same seed-29
tables).
"""

import lzma
import os
import shutil


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "synth6_big_xz")
    dst = os.path.join(here, "synth6_big_data")
    os.makedirs(dst, exist_ok=True)
    for name in sorted(os.listdir(src)):
        if not name.endswith(".xz"):
            continue
        out = os.path.join(dst, name[:-3])
        with lzma.open(os.path.join(src, name), "rb") as f_in, \
                open(out, "wb") as f_out:
            shutil.copyfileobj(f_in, f_out)
        with open(out) as f:
            n = sum(1 for _ in f)
        print(f"{out}: {n} queries")


if __name__ == "__main__":
    main()
