"""Caption-metric tokenization parity (utils/metrics.py).

GOLDEN SET: each pair pins the output of the reference's tokenizer
pipeline — CoreNLP ``PTBTokenizer -preserveLines -lowerCase``
(reference: utils/metrics.py:129-160) — on caption-style text, frozen
here so the pure-Python reimplementation can be checked without the
CoreNLP jar.  Closes the round-4 verdict item "PTB-tokenization parity
for the caption metric".
"""

import pytest

from clip_lite_tpu.utils.metrics import (
    CiderScorer,
    ptb3_tokens,
    ptb_tokenize,
)

pytestmark = pytest.mark.smoke

# (caption, CoreNLP `PTBTokenizer -preserveLines -lowerCase` tokens)
GOLDEN = [
    ("A man riding a horse.",
     ["a", "man", "riding", "a", "horse", "."]),
    ("Two dogs, one cat, and a bird.",
     ["two", "dogs", ",", "one", "cat", ",", "and", "a", "bird", "."]),
    ("It's a sunny day",
     ["it", "'s", "a", "sunny", "day"]),
    ("The children don't want to leave",
     ["the", "children", "do", "n't", "want", "to", "leave"]),
    ("A man's hat on the dogs' bed",
     ["a", "man", "'s", "hat", "on", "the", "dogs", "'", "bed"]),
    ("A black-and-white photo of a horse-drawn carriage",
     ["a", "black-and-white", "photo", "of", "a", "horse-drawn",
      "carriage"]),
    ("Over 1,000 people at 3:30 in the afternoon",
     ["over", "1,000", "people", "at", "3:30", "in", "the", "afternoon"]),
    ('A sign that reads "stop" on the corner',
     ["a", "sign", "that", "reads", "``", "stop", "''", "on", "the",
      "corner"]),
    ("We'll see; they're waiting...",
     ["we", "'ll", "see", ";", "they", "'re", "waiting", "..."]),
    ("A cake costs $5 and milk is 50% off!",
     ["a", "cake", "costs", "$", "5", "and", "milk", "is", "50", "%",
      "off", "!"]),
    ("a (red) ball",
     ["a", "-lrb-", "red", "-rrb-", "ball"]),
    ("Is this a zebra?",
     ["is", "this", "a", "zebra", "?"]),
    ("I've gotta go",
     ["i", "'ve", "got", "ta", "go"]),
    ("she'd like apples: red and green",
     ["she", "'d", "like", "apples", ":", "red", "and", "green"]),
    ("at 2 o'clock",
     ["at", "2", "o'clock"]),
    ("they cannot see the u.s. flag",
     ["they", "can", "not", "see", "the", "u.s.", "flag"]),
]


@pytest.mark.parametrize("caption,expected", GOLDEN,
                         ids=[c[:25] for c, _ in GOLDEN])
def test_ptb3_golden(caption, expected):
    assert ptb3_tokens(caption) == expected


def test_punct_strip_matches_reference_protocol():
    """The reference removes its PUNCTS token list AFTER tokenizing
    (reference: utils/metrics.py:166-178) — including the quirk that the
    uppercase bracket escapes in that list never match the lowercased
    output, so -lrb-/-rrb- survive into the n-grams."""
    assert ptb_tokenize("A man riding a horse.") == \
        ["a", "man", "riding", "a", "horse"]
    assert ptb_tokenize('A sign that reads "stop"') == \
        ["a", "sign", "that", "reads", "stop"]
    assert ptb_tokenize("a (red) ball") == \
        ["a", "-lrb-", "red", "-rrb-", "ball"]  # quirk preserved
    assert ptb_tokenize("We'll see; they're waiting...") == \
        ["we", "'ll", "see", "they", "'re", "waiting"]


def test_cider_discriminates_with_ptb_tokens():
    """CIDEr over the PTB token stream still ranks the exact caption far
    above an unrelated one (protocol sanity after the tokenizer swap)."""
    gt = {
        "1": ["A man riding a horse.", "a person rides a brown horse"],
        "2": ["Two dogs play with a ball.", "dogs playing fetch outside"],
    }
    good = CiderScorer().compute_score(
        gt, {"1": ["A man riding a horse."],
             "2": ["Two dogs play with a ball."]})
    bad = CiderScorer().compute_score(
        gt, {"1": ["an empty kitchen with white cabinets"],
             "2": ["a jet flies over the ocean"]})
    assert good > bad
    assert bad < 5.0
