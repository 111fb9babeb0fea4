"""Tokenizers: GloVe word-dict tokenizer and HF tokenizers with an
offline-safe fallback.

Equivalents of the reference's data/tokenizers.py (GloveTokenizer,
:11-54) and its direct use of HF ``AutoTokenizer`` inside datasets
(reference: data/dataloader.py:299-306).  This environment has no network,
so when the HF vocab is not cached locally we fall back to a
deterministic hashing WordPiece-style tokenizer with the same id contract
([CLS]/[SEP]/[PAD] = 101/102/0) — good enough for from-scratch
pretraining, clearly logged.
"""

from __future__ import annotations

import json
import logging
import re
from typing import List, Optional

logger = logging.getLogger("clip_lite_tpu")

_WORD_RE = re.compile(r"[a-z0-9]+(?:'[a-z]+)?")


def simple_word_tokenize(text: str) -> List[str]:
    return _WORD_RE.findall(text.lower())


class GloveTokenizer:
    """word_dict.json based tokenizer (reference: data/tokenizers.py:11-54):
    word -> id, unknown -> <unk>, plus <start>/<eos>/<pad> specials."""

    def __init__(self, word_dict_path: Optional[str] = None,
                 word_dict: Optional[dict] = None):
        if word_dict is None:
            with open(word_dict_path) as f:
                word_dict = json.load(f)
        self.word_dict = word_dict
        for special in ("<start>", "<eos>", "<unk>", "<pad>"):
            if special not in self.word_dict:
                self.word_dict[special] = len(self.word_dict)

    def __len__(self) -> int:
        return len(self.word_dict)

    def token_to_id(self, token: str) -> int:
        return self.word_dict.get(token, self.word_dict["<unk>"])

    def encode(self, caption: str) -> List[int]:
        return [self.token_to_id(w) for w in simple_word_tokenize(caption)]

    def decode(self, ids: List[int]) -> str:
        rev = {v: k for k, v in self.word_dict.items()}
        return " ".join(rev.get(i, "<unk>") for i in ids)

    @property
    def pad_id(self) -> int:
        return self.word_dict["<pad>"]


class HashingTokenizer:
    """Deterministic offline stand-in for a WordPiece tokenizer.

    Keeps BERT's special-token contract: PAD=0, UNK=100, CLS=101, SEP=102;
    words hash into [999, vocab_size).  Stable across runs/processes
    (md5-based, not Python hash()).
    """

    pad_token_id = 0
    cls_token_id = 101
    sep_token_id = 102

    def __init__(self, vocab_size: int = 30522, max_length: int = 30):
        if vocab_size < 104:
            raise ValueError(
                f"vocab_size {vocab_size} < 104 cannot hold the BERT "
                "special tokens (PAD=0, UNK=100, CLS=101, SEP=102)")
        self.vocab_size = vocab_size
        self.max_length = max_length
        # Words hash above the special tokens; 999 matches WordPiece's
        # unused/reserved range when the vocab allows it.
        self._word_base = 999 if vocab_size > 999 else 103

    def _word_id(self, word: str) -> int:
        import hashlib

        h = int.from_bytes(hashlib.md5(word.encode()).digest()[:4], "little")
        span = self.vocab_size - self._word_base
        return self._word_base + (h % span)

    def __call__(self, text, padding="max_length", truncation=True,
                 max_length: Optional[int] = None, **kw) -> dict:
        max_length = max_length or self.max_length
        if isinstance(text, str):
            texts = [text]
            single = True
        else:
            texts = list(text)
            single = False
        all_ids, all_masks = [], []
        for t in texts:
            ids = [self.cls_token_id]
            ids += [self._word_id(w) for w in simple_word_tokenize(t)]
            ids = ids[: max_length - 1] + [self.sep_token_id]
            mask = [1] * len(ids)
            pad = max_length - len(ids)
            ids += [self.pad_token_id] * pad
            mask += [0] * pad
            all_ids.append(ids)
            all_masks.append(mask)
        if single:
            return {"input_ids": all_ids[0], "attention_mask": all_masks[0]}
        return {"input_ids": all_ids, "attention_mask": all_masks}


class SentencePieceBPETokenizer:
    """SentencePiece BPE tokenizer (reference: data/tokenizers.py:57-111).

    Pickle-safe: the processor re-opens lazily after fork/pickle.  The
    sentencepiece package is optional in this environment; constructing
    without it raises with instructions.
    """

    SP_SPACE = "▁"

    def __init__(self, model_path: str):
        self.model_path = model_path
        self._sp = None

    def _processor(self):
        if self._sp is None:
            try:
                import sentencepiece as sp
            except ImportError as e:
                raise ImportError(
                    "SentencePieceBPETokenizer needs the sentencepiece "
                    "package (not in this environment); use GloveTokenizer "
                    "or an HF tokenizer instead.") from e
            self._sp = sp.SentencePieceProcessor()
            self._sp.Load(self.model_path)
        return self._sp

    def __len__(self):
        return self._processor().get_piece_size()

    def token_to_id(self, token: str) -> int:
        return self._processor().piece_to_id(token)

    def id_to_token(self, idx: int) -> str:
        return self._processor().id_to_piece(idx)

    def encode(self, text: str) -> List[int]:
        return self._processor().encode_as_ids(" " + text.strip())

    def decode(self, ids: List[int]) -> str:
        pieces = [self.id_to_token(i) for i in ids]
        return "".join(pieces).replace(self.SP_SPACE, " ").strip()

    def __getstate__(self):
        return {"model_path": self.model_path}

    def __setstate__(self, state):
        self.__init__(state["model_path"])


_HF_CACHE: dict = {}


def get_hf_tokenizer(name: str = "bert-base-uncased", max_length: int = 30,
                     vocab_size: Optional[int] = None):
    """HF tokenizer if locally cached, HashingTokenizer otherwise.

    ``vocab_size`` is the model's embedding-table size
    (MODEL.TEXTUAL.VOCAB_SIZE): the hashing fallback MUST stay inside it —
    out-of-range ids silently poison the embedding lookup with NaN fill
    values under XLA (jnp.take OOB semantics), unlike torch's loud index
    error."""
    key = (name, max_length, vocab_size)
    if key in _HF_CACHE:
        return _HF_CACHE[key]
    tok = None
    try:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(name, local_files_only=True)
        tok.model_max_length = max_length
    except Exception:
        logger.warning(
            "HF tokenizer %r not in local cache (offline env); using the "
            "deterministic HashingTokenizer fallback.", name)
        tok = HashingTokenizer(vocab_size=vocab_size or 30522,
                               max_length=max_length)
    else:
        if vocab_size is not None and tok.vocab_size > vocab_size:
            # Fail loudly (OUTSIDE the fallback try: the fallback is for
            # cache misses, not config errors): ids beyond the embedding
            # table silently NaN the forward pass under XLA (jnp.take OOB
            # fill) — the exact failure the HashingTokenizer clamp exists
            # to prevent.
            raise ValueError(
                f"Tokenizer {name!r} has vocab {tok.vocab_size} > "
                f"MODEL.TEXTUAL.VOCAB_SIZE {vocab_size}; raise "
                f"MODEL.TEXTUAL.VOCAB_SIZE to at least {tok.vocab_size} "
                f"(out-of-range ids silently NaN the embedding lookup "
                f"under XLA).")
    _HF_CACHE[key] = tok
    return tok
