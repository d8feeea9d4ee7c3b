#!/usr/bin/env python
"""Generate partial-label split files for the txt split protocol.

The reference consumes ``<txt_dir>/<label_num>/<seed>/{labeled,unlabeled,
valid}_filename.txt`` (VOC.py:48-62) and tells users to "pre-perform
make_list.py" — a script it does not ship.  This tool generates those files
from id lists:

    python tools/make_splits.py --train_ids train.txt --val_ids val.txt \
        --num_labels 92 --seed 3407 --out /data/VOC2012/splits

``train.txt`` / ``val.txt`` hold one sample id per line (VOC image ids or
Cityscapes ``<city>_..._leftImg8bit`` stems).  ``--num_labels`` ids are
drawn uniformly (seeded) as the labeled split; the rest become unlabeled.
"""

import argparse
import os
import random


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train_ids", required=True,
                   help="file with one train sample id per line")
    p.add_argument("--val_ids", required=True,
                   help="file with one validation sample id per line")
    p.add_argument("--num_labels", type=int, required=True)
    p.add_argument("--seed", type=int, default=3407)
    p.add_argument("--out", required=True, help="txt_dir root")
    args = p.parse_args()

    def read(path):
        with open(path) as f:
            return [ln.strip() for ln in f if ln.strip()]

    train = read(args.train_ids)
    val = read(args.val_ids)
    if args.num_labels > len(train):
        raise SystemExit(
            f"--num_labels {args.num_labels} > {len(train)} train ids")

    rng = random.Random(args.seed)
    labeled = sorted(rng.sample(train, args.num_labels))
    labeled_set = set(labeled)
    unlabeled = [s for s in train if s not in labeled_set]

    out_dir = os.path.join(args.out, str(args.num_labels), str(args.seed))
    os.makedirs(out_dir, exist_ok=True)
    for name, ids in [("labeled_filename.txt", labeled),
                      ("unlabeled_filename.txt", unlabeled),
                      ("valid_filename.txt", val)]:
        with open(os.path.join(out_dir, name), "w") as f:
            f.write("\n".join(ids) + "\n")
    print(f"wrote {len(labeled)} labeled / {len(unlabeled)} unlabeled / "
          f"{len(val)} valid ids to {out_dir}")


if __name__ == "__main__":
    main()
