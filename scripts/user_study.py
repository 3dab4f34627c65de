#!/usr/bin/env python
"""A/B user-study CLI (make / page / analyze).

Functional equivalent of the reference's shipped study artifacts
(sup-mat/user-study/*.csv pair manifests + amt_{transfer,prediction}.html
HIT templates): this produces them for YOUR runs instead of shipping one
study's frozen data.

    # 1. Pair two methods' gifs (matched by shared clip id), randomize A/B:
    python scripts/user_study.py make \
        --ours log/taichi/transfer/gifs --baseline /path/to/x2face-gifs \
        --appearance log/taichi/transfer/appearance \
        --study-name ours-vs-x2face --out study/

    # 2. Render the page (local self-contained flavor, or an AMT template):
    python scripts/user_study.py page --manifest-dir study/ --mode transfer
    python scripts/user_study.py page --manifest-dir study/ --flavor template

    # 3. Raters open study/index.html, answer, download responses.csv. Then:
    python scripts/user_study.py analyze \
        --responses responses.csv --key study/key.csv
"""

from __future__ import annotations

import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from monkeynet_tpu.utils import user_study as us  # noqa: E402


def main():
    p = ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    mk = sub.add_parser("make", help="build manifest.csv + key.csv")
    mk.add_argument("--ours", required=True)
    mk.add_argument("--baseline", required=True)
    mk.add_argument("--appearance", default=None)
    mk.add_argument("--study-name", default="study")
    mk.add_argument("--seed", type=int, default=0)
    mk.add_argument("--out", default="study")

    pg = sub.add_parser("page", help="render index.html for a manifest dir")
    pg.add_argument("--manifest-dir", required=True)
    pg.add_argument("--mode", default="transfer",
                    choices=["transfer", "prediction"])
    pg.add_argument("--flavor", default="local",
                    choices=["local", "template"])
    pg.add_argument("--asset-prefix", default="",
                    help="prefix prepended to every media src")

    an = sub.add_parser("analyze", help="score responses against the key")
    an.add_argument("--responses", required=True)
    an.add_argument("--key", required=True)

    opt = p.parse_args()

    if opt.cmd == "make":
        rows = us.make_manifest(
            opt.ours, opt.baseline, opt.appearance,
            study_name=opt.study_name, seed=opt.seed,
        )
        os.makedirs(opt.out, exist_ok=True)
        us.write_manifest(rows, os.path.join(opt.out, "manifest.csv"))
        us.write_key(rows, os.path.join(opt.out, "key.csv"))
        print(f"{len(rows)} pairs -> {opt.out}/manifest.csv (+ key.csv)")
    elif opt.cmd == "page":
        import csv

        rows = []
        key = {}
        with open(os.path.join(opt.manifest_dir, "key.csv"), newline="") as f:
            for r in csv.DictReader(f):
                key[r["first"]] = bool(int(r["ours_is_first"]))
        for first, second, appearance in us.read_manifest(
            os.path.join(opt.manifest_dir, "manifest.csv")
        ):
            rows.append(us.ManifestRow(first, second, appearance, key[first]))
        page = us.render_study_page(
            rows, mode=opt.mode, flavor=opt.flavor,
            asset_prefix=opt.asset_prefix,
        )
        out = os.path.join(opt.manifest_dir, "index.html")
        with open(out, "w") as f:
            f.write(page)
        print(f"wrote {out} ({opt.flavor}, {len(rows)} pairs)")
    else:
        res = us.analyze_responses(opt.responses, opt.key)
        lo, hi = res.ci95
        print(
            f"n={res.n} votes, ours preferred {res.ours_votes} "
            f"({100 * res.ours_share:.1f}%), 95% CI "
            f"[{100 * lo:.1f}%, {100 * hi:.1f}%], sign-test p={res.p_value:.4g}"
        )


if __name__ == "__main__":
    main()
