"""Build a GloVe-filtered word_dict.json for the glove text-encoder mode.

Equivalent of the reference's scripts/generate_word_dict.py (:102-119):
collect the caption vocabulary from COCO annotations, keep words present
in the GloVe vocabulary, and add <start>/<eos>/<unk>/<pad> specials.
"""

from __future__ import annotations

import argparse
import json
import os

from clip_lite_tpu.data.tokenizers import simple_word_tokenize

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("--coco-root", required=True)
parser.add_argument("--splits", nargs="*", default=["train", "val"])
parser.add_argument("--glove-path", default=None,
                    help="GloVe txt file; omit to keep every caption word.")
parser.add_argument("--min-count", type=int, default=1)
parser.add_argument("--output", required=True)


def main(args) -> dict:
    from collections import Counter

    counts: Counter = Counter()
    for split in args.splits:
        ann = os.path.join(args.coco_root,
                           f"annotations/captions_{split}2017.json")
        with open(ann) as f:
            data = json.load(f)
        for a in data["annotations"]:
            counts.update(simple_word_tokenize(a["caption"]))

    glove_vocab = None
    if args.glove_path:
        glove_vocab = set()
        with open(args.glove_path) as f:
            for line in f:
                glove_vocab.add(line.split(" ", 1)[0])

    words = [w for w, c in counts.most_common()
             if c >= args.min_count and
             (glove_vocab is None or w in glove_vocab)]
    word_dict = {"<pad>": 0, "<start>": 1, "<eos>": 2, "<unk>": 3}
    for w in words:
        word_dict[w] = len(word_dict)

    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    with open(args.output, "w") as f:
        json.dump(word_dict, f)
    print(f"word_dict: {len(word_dict)} entries -> {args.output}")
    return word_dict


if __name__ == "__main__":
    main(parser.parse_args())
